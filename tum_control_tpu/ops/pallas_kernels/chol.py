"""Pallas TPU kernels: batched small-matrix Cholesky factorization + solves.

XLA's batched `cholesky` on TPU is catastrophically slow for many small
matrices (measured 2.3 ms for (256, 76, 76) f32 on v5e — 27x the cost of a
same-shape batched matmul), because its blocked algorithm is built for one
large matrix. Since every IPM iteration of every scenario's QP needs one
(nz x nz) factorization + triangular solves, this is THE hot spot of the
whole framework (SURVEY.md §2.3: the BLASFEO role).

The kernels here use a batch-in-lanes layout: operands are (n, n, 128)
tiles with the *batch* in the 128-wide lane dimension, so the sequential
pivot loop runs VPU-wide elementwise ops over 128 scenarios at once:

  * `_chol_kernel`   — right-looking Cholesky, one rank-1 update per pivot
  * `_solve_kernel`  — column-oriented forward + backward substitution

Wrappers pad n to a sublane multiple and the batch to a lane multiple and
fall back to jnp on non-TPU backends. `batched_cholesky_solve` is the
drop-in replacement for cholesky+cho_solve inside the QP solvers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _chol_kernel(a_ref, l_ref):
    n = a_ref.shape[1]
    l_ref[...] = a_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def pivot(j, _):
        Ajj = l_ref[0, j, j, :]                      # (128,)
        inv = jax.lax.rsqrt(Ajj)
        col = l_ref[0, :, j, :] * inv[None, :]        # (n, 128)
        col = jnp.where(rows1 >= j, col, 0.0)
        # trailing update, strictly columns > j (cols <= j already hold L)
        upd = col[:, None, :] * col[None, :, :]       # (n, n, 128)
        upd = jnp.where(cols > j, upd, 0.0)
        l_ref[0] = l_ref[0] - upd
        # write the finished column j
        l_ref[0, :, j, :] = col
        return 0

    jax.lax.fori_loop(0, n, pivot, 0)
    # zero the strict upper triangle
    l_ref[0] = jnp.where(rows >= cols, l_ref[0], 0.0)


def _solve_kernel(l_ref, b_ref, x_ref):
    """Solve L L^T x = b for (n, 128) right-hand sides (in-place on x_ref —
    Mosaic supports dynamic indexing on refs, not on loop-carried values)."""
    n = l_ref.shape[1]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x_ref[0] = b_ref[0]

    def fwd(j, _):
        inv = 1.0 / l_ref[0, j, j, :]
        yj = x_ref[0, j, :] * inv                     # (128,)
        col = l_ref[0, :, j, :]                       # (n, 128)
        x_ref[0] = x_ref[0] - jnp.where(rows1 > j, col, 0.0) * yj[None, :]
        x_ref[0, j, :] = yj
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    def bwd(i, _):
        j = n - 1 - i
        inv = 1.0 / l_ref[0, j, j, :]
        xj = x_ref[0, j, :] * inv
        row = l_ref[0, j, :, :]                       # L[j, :] = L^T[:, j]
        x_ref[0] = x_ref[0] - jnp.where(rows1 < j, row, 0.0) * xj[None, :]
        x_ref[0, j, :] = xj
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


BS = 16  # block size (f32 sublane multiple) for the blocked kernels


def _chol_kernel_blocked(a_ref, l_ref):
    """Blocked right-looking Cholesky. Unrolled static block loops: per
    BS-column panel, BS masked rank-1 updates restricted to the panel, then
    one rank-BS update of only the *trailing* submatrix — several times
    fewer VPU element-ops than the naive full-matrix rank-1 sweep (which
    wastes 2/3 of its work on already-finished/upper entries). n must be a
    multiple of BS (the wrapper pads with identity)."""
    n = a_ref.shape[1]
    l_ref[...] = a_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)

    for jb in range(0, n, BS):
        nr = n - jb
        rows_nr = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
        # --- panel factorization (columns jb .. jb+BS-1, rows jb ..)
        for jj in range(BS):
            j = jb + jj
            inv = jax.lax.rsqrt(l_ref[0, j, j, :])
            col = l_ref[0, jb:, j, :] * inv[None, :]          # (nr, 128)
            col = jnp.where(rows_nr >= jj, col, 0.0)
            if jj < BS - 1:
                # rank-1 update of the remaining panel columns
                rowfac = col[jj + 1 : BS, :]                  # (BS-1-jj, 128)
                l_ref[0, jb:, j + 1 : jb + BS, :] = (
                    l_ref[0, jb:, j + 1 : jb + BS, :]
                    - col[:, None, :] * rowfac[None, :, :]
                )
            l_ref[0, jb:, j, :] = col
        # --- rank-BS trailing update, LOWER TRAPEZOID only: the factor's
        # strict upper triangle is zeroed at the end anyway, so updating it
        # is pure waste — per BS-row panel rb, only columns jb+BS..rb+BS
        # are touched (half the VPU element-ops of the full-square update)
        if jb + BS < n:
            for rb in range(jb + BS, n, BS):
                ncols = rb + BS - (jb + BS)
                acc = None
                for t in range(BS):
                    cr = l_ref[0, rb : rb + BS, jb + t, :]          # (BS, 128)
                    cc = l_ref[0, jb + BS : rb + BS, jb + t, :]     # (ncols, 128)
                    term = cr[:, None, :] * cc[None, :, :]          # (BS, ncols, 128)
                    acc = term if acc is None else acc + term
                l_ref[0, rb : rb + BS, jb + BS : rb + BS, :] = (
                    l_ref[0, rb : rb + BS, jb + BS : rb + BS, :] - acc
                )
    # zero the strict upper triangle
    l_ref[0] = jnp.where(rows >= cols, l_ref[0], 0.0)


def _solve_kernel_blocked(l_ref, b_ref, x_ref):
    """Blocked forward+backward substitution for L L^T x = b, (n, 128) rhs.
    Within each BS-row block: masked scalar-row steps; between blocks: one
    rank-BS update of only the remaining rows — ~2x fewer element-ops and
    far fewer sequential ref updates than the unblocked version."""
    n = l_ref.shape[1]
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
    x_ref[0] = b_ref[0]

    # forward: L y = b
    for jb in range(0, n, BS):
        for jj in range(BS):
            j = jb + jj
            yj = x_ref[0, j, :] / l_ref[0, j, j, :]
            sub = l_ref[0, jb : jb + BS, j, :]                # (BS, 128)
            x_ref[0, jb : jb + BS, :] = (
                x_ref[0, jb : jb + BS, :]
                - jnp.where(rows8 > jj, sub, 0.0) * yj[None, :]
            )
            x_ref[0, j, :] = yj
        if jb + BS < n:
            acc = None
            for t in range(BS):
                yt = x_ref[0, jb + t : jb + t + 1, :]         # (1, 128)
                term = l_ref[0, jb + BS :, jb + t, :] * yt
                acc = term if acc is None else acc + term
            x_ref[0, jb + BS :, :] = x_ref[0, jb + BS :, :] - acc

    # backward: L^T x = y   (L^T[r, j] = L[j, r] -> row slices of L)
    for jb in range(n - BS, -1, -BS):
        for jj in range(BS - 1, -1, -1):
            j = jb + jj
            xj = x_ref[0, j, :] / l_ref[0, j, j, :]
            row = l_ref[0, j, jb : jb + BS, :]                # (BS, 128)
            x_ref[0, jb : jb + BS, :] = (
                x_ref[0, jb : jb + BS, :]
                - jnp.where(rows8 < jj, row, 0.0) * xj[None, :]
            )
            x_ref[0, j, :] = xj
        if jb > 0:
            acc = None
            for t in range(BS):
                xt = x_ref[0, jb + t : jb + t + 1, :]         # (1, 128)
                term = l_ref[0, jb + t, :jb, :] * xt
                acc = term if acc is None else acc + term
            x_ref[0, :jb, :] = x_ref[0, :jb, :] - acc


def _pad_batch(a, lanes=LANES):
    B = a.shape[0]
    Bp = -(-B // lanes) * lanes
    if Bp != B:
        a = jnp.concatenate(
            [a, jnp.zeros((Bp - B,) + a.shape[1:], a.dtype)], axis=0
        )
    return a, B, Bp


def _pad_n_spd(H, np_):
    """Pad (B, n, n) SPD matrices to (B, np_, np_) with an identity tail."""
    n = H.shape[1]
    if np_ == n:
        return H
    Hp = jnp.pad(H, ((0, 0), (0, np_ - n), (0, np_ - n)))
    tail = jnp.arange(np_) >= n
    return Hp + jnp.where(tail, 1.0, 0.0) * jnp.eye(np_, dtype=H.dtype)[None]


@functools.partial(jax.jit, static_argnames=())
def _cholesky_tpu(H):
    """(B, n, n) -> (B, n, n) lower Cholesky factors via the Pallas kernel."""
    Hp, B, Bp = _pad_batch(H)
    n = H.shape[1]
    np_ = -(-n // BS) * BS  # blocked kernel needs n % BS == 0
    # identity-pad the extra rows/cols and the padded scenarios so rsqrt
    # stays finite (their factor is the identity, sliced away below)
    Hp = _pad_n_spd(Hp, np_)
    if Bp != B:
        eye = jnp.eye(np_, dtype=H.dtype)
        pad_ids = jnp.arange(Bp) >= B
        Hp = jnp.where(pad_ids[:, None, None], eye[None], Hp)
    Ht = jnp.transpose(Hp.reshape(Bp // LANES, LANES, np_, np_), (0, 2, 3, 1))
    grid = (Bp // LANES,)
    Lt = pl.pallas_call(
        _chol_kernel_blocked,
        out_shape=jax.ShapeDtypeStruct(Ht.shape, Ht.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, np_, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, np_, np_, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )(Ht)
    L = jnp.transpose(Lt, (0, 3, 1, 2)).reshape(Bp, np_, np_)
    return L[:B, :n, :n]


def _solve_tpu(L, b):
    """(B, n, n), (B, n) -> (B, n) solving L L^T x = b."""
    Lp, B, Bp = _pad_batch(L)
    bp, _, _ = _pad_batch(b)
    n = L.shape[1]
    np_ = -(-n // BS) * BS
    Lp = _pad_n_spd(Lp, np_)
    if np_ != n:
        bp = jnp.pad(bp, ((0, 0), (0, np_ - n)))
    if Bp != B:
        eye = jnp.eye(np_, dtype=L.dtype)
        pad_ids = jnp.arange(Bp) >= B
        Lp = jnp.where(pad_ids[:, None, None], eye[None], Lp)
    Lt = jnp.transpose(Lp.reshape(Bp // LANES, LANES, np_, np_), (0, 2, 3, 1))
    bt = jnp.transpose(bp.reshape(Bp // LANES, LANES, np_), (0, 2, 1))
    grid = (Bp // LANES,)
    xt = pl.pallas_call(
        _solve_kernel_blocked,
        out_shape=jax.ShapeDtypeStruct(bt.shape, bt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, np_, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(Lt, bt)
    x = jnp.transpose(xt, (0, 2, 1)).reshape(Bp, np_)
    return x[:B, :n]


def _packed_ok(a, B):
    return jax.default_backend() == "tpu" and a.dtype == jnp.float32 and B % LANES == 0


def _cholesky_tpu_packed(H):
    """(B, n, n), B % LANES == 0 -> lanes-layout factors (B//LANES, np, np, LANES).

    Same kernel as `_cholesky_tpu` but the output stays in the batch-in-lanes
    layout, so downstream triangular solves skip the L-sized relayout copies
    (3 per IPM iteration — ~10% of the whole closed-loop step)."""
    B, n = H.shape[0], H.shape[1]
    np_ = -(-n // BS) * BS
    Hp = _pad_n_spd(H, np_)
    Ht = jnp.transpose(Hp.reshape(B // LANES, LANES, np_, np_), (0, 2, 3, 1))
    grid = (B // LANES,)
    return pl.pallas_call(
        _chol_kernel_blocked,
        out_shape=jax.ShapeDtypeStruct(Ht.shape, Ht.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, np_, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, np_, np_, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )(Ht)


def _solve_tpu_packed(Lt, b):
    """Lanes-layout factors (G, np, np, LANES) + (B, n) rhs -> (B, n)."""
    G_, np_ = Lt.shape[0], Lt.shape[1]
    B, n = b.shape[0], b.shape[1]
    bp = jnp.pad(b, ((0, 0), (0, np_ - n))) if np_ != n else b
    bt = jnp.transpose(bp.reshape(G_, LANES, np_), (0, 2, 1))
    grid = (G_,)
    xt = pl.pallas_call(
        _solve_kernel_blocked,
        out_shape=jax.ShapeDtypeStruct(bt.shape, bt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, np_, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(Lt, bt)
    return jnp.transpose(xt, (0, 2, 1)).reshape(B, np_)[:, :n]


def batched_cholesky(H):
    if jax.default_backend() == "tpu" and H.dtype == jnp.float32:
        return _cholesky_tpu(H)
    return jnp.linalg.cholesky(H)


def batched_cholesky_solve(L, b):
    if jax.default_backend() == "tpu" and L.dtype == jnp.float32:
        return _solve_tpu(L, b)
    return jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0] if b.ndim == L.ndim - 1 else jax.scipy.linalg.cho_solve((L, True), b)


# ---------------------------------------------------------------------------
# custom_vmap wrappers: per-scenario QP code (written for a single matrix)
# automatically dispatches to the batched Pallas kernels under `vmap`.
# ---------------------------------------------------------------------------
from jax import custom_batching  # noqa: E402


@custom_batching.custom_vmap
def chol_factor(H):
    """Lower Cholesky factor of one SPD matrix (batched rule -> Pallas)."""
    return jnp.linalg.cholesky(H)


@chol_factor.def_vmap
def _chol_factor_vmap(axis_size, in_batched, H):
    del axis_size
    (h_b,) = in_batched
    assert h_b, "chol_factor: H must carry the batch axis"
    return batched_cholesky(H), True


@custom_batching.custom_vmap
def chol_apply(L, b):
    """Solve L L^T x = b for one factor/rhs (batched rule -> Pallas)."""
    return jax.scipy.linalg.cho_solve((L, True), b)


@chol_apply.def_vmap
def _chol_apply_vmap(axis_size, in_batched, L, b):
    l_b, b_b = in_batched
    if not l_b:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    return batched_cholesky_solve(L, b), True


# ---------------------------------------------------------------------------
# Packed variants: the factor stays in the batch-in-lanes layout between the
# factorization and its triangular solves. The packed factor is OPAQUE — its
# (B, np, np) batched view is a bitcast of the lanes layout, NOT per-scenario
# matrices; it must only ever be consumed by chol_apply_packed *inside the
# same vmapped region* (exactly how the IPM / Newton polish use it). Both
# rules take the fast path under the identical predicate (TPU + f32 + batch
# a multiple of LANES), so producer and consumer always agree on the layout;
# anything else falls back to the standard batched kernels.
# ---------------------------------------------------------------------------


@custom_batching.custom_vmap
def chol_factor_packed(H):
    """Factor one SPD matrix; packed/opaque under vmap (see note above)."""
    return jnp.linalg.cholesky(H)


@chol_factor_packed.def_vmap
def _chol_factor_packed_vmap(axis_size, in_batched, H):
    del axis_size
    (h_b,) = in_batched
    assert h_b, "chol_factor_packed: H must carry the batch axis"
    B = H.shape[0]
    if _packed_ok(H, B):
        Lt = _cholesky_tpu_packed(H)            # (B//LANES, np, np, LANES)
        return Lt.reshape(B, Lt.shape[1], Lt.shape[2]), True  # bitcast view
    return batched_cholesky(H), True


@custom_batching.custom_vmap
def chol_apply_packed(L, b):
    """Solve with a factor from chol_factor_packed (same vmapped region)."""
    return jax.scipy.linalg.cho_solve((L, True), b)


@chol_apply_packed.def_vmap
def _chol_apply_packed_vmap(axis_size, in_batched, L, b):
    l_b, b_b = in_batched
    if not l_b:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    B = b.shape[0]
    if _packed_ok(L, B):
        np_ = L.shape[1]
        Lt = L.reshape(B // LANES, np_, np_, LANES)  # undo the bitcast view
        return _solve_tpu_packed(Lt, b), True
    return batched_cholesky_solve(L, b), True


# ---------------------------------------------------------------------------
# Differentiable mode (TUM_DIFFERENTIABLE=1): replace the custom_vmap
# wrappers with their plain jnp equivalents — custom_vmap and Pallas do not
# support reverse-mode AD; the jnp forms do (see ops/diffmode.py).
# ---------------------------------------------------------------------------
from tum_control_tpu.ops.diffmode import DIFFERENTIABLE as _DIFF  # noqa: E402

if _DIFF:
    def chol_factor(H):  # noqa: F811
        return jnp.linalg.cholesky(H)

    def chol_apply(L, b):  # noqa: F811
        return jax.scipy.linalg.cho_solve((L, True), b)

    chol_factor_packed = chol_factor  # noqa: F811
    chol_apply_packed = chol_apply    # noqa: F811
