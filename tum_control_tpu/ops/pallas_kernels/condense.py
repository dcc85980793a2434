"""Pallas TPU kernel: batched full condensing of the OCP sensitivities.

Full condensing builds, per scenario, the affine map from the stacked
control deviations w = vec(dU) to the state deviations:

    dx_k = e_k + Gamma_k w,   e_{k+1} = A_k e_k + xi_k,
                              Gamma_{k+1} = A_k Gamma_k + B_k E_k

(the acados FULL_CONDENSING role, NMPC_STM_acados_settings.py:231). The
recurrence is sequential in the stage index k, so XLA's `lax.scan` lowering
round-trips the (batch, nx, nz) Gamma through HBM on every one of the N
stages — measured ~1.0 ms per closed-loop step at batch 256 (N=38, nx=8),
~30% of the whole step.

This kernel keeps the recurrence entirely in VMEM with the batch in the
128-wide lane dimension (same layout as `chol.py`): Gamma is an
(nx, nz, 128) tile updated in place over a sequential stage grid, with the
carry in scratch across grid steps; stage chunks of the (A, B, xi) inputs
and the (e, Gamma) outputs stream HBM<->VMEM block by block. Each stage is
nx*nx FMAs of (nz, 128) tiles on the VPU — ~20x less wall-clock than the
XLA scan.

The public entry `condense_scan` is a `custom_vmap`: unbatched it is the
plain jnp scan (CPU tests, f64), under `vmap` on TPU/f32 it dispatches to
the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_NX_FAST = 16  # lanes-kernel fast path (SNMPC's stacked nx=88 falls back)


# ---------------------------------------------------------------------------
# reference jnp implementation (single scenario; also the CPU/f64 path)
# ---------------------------------------------------------------------------
def condense_scan_ref(A, B, xi, d0):
    """(N,nx,nx), (N,nx,nu), (N,nx), (nx) -> e (N+1,nx), Gam (N+1,nx,nz)."""
    N, nx, nu = B.shape
    nz = N * nu
    E = jnp.eye(nz, dtype=A.dtype).reshape(N, nu, nz)

    def body(carry, inp):
        e, Gam = carry
        A_k, B_k, xi_k, E_k = inp
        e_n = A_k @ e + xi_k
        Gam_n = A_k @ Gam + B_k @ E_k
        return (e_n, Gam_n), (e_n, Gam_n)

    Gam0 = jnp.zeros((nx, nz), dtype=A.dtype)
    (_, _), (e_tail, Gam_tail) = jax.lax.scan(body, (d0, Gam0), (A, B, xi, E))
    e = jnp.concatenate([d0[None], e_tail], axis=0)
    Gam = jnp.concatenate([Gam0[None], Gam_tail], axis=0)
    return e, Gam


# ---------------------------------------------------------------------------
# TPU kernel
# ---------------------------------------------------------------------------
def _make_kernel(nx: int, nu: int, nz: int, C: int):
    """Write-first kernel: chunk j's slot t receives (e_k, Gamma_k) for
    k = j*C + t *before* the stage-k update, so the outputs directly cover
    stages 0..N (stage 0 = (d0, 0)) with no stage-0 concatenate downstream
    (the concats showed up as two ~9.5 MB strided copies per solve)."""

    def kernel(a_ref, b_ref, xi_ref, d0_ref, e_ref, gam_ref, ce, cg):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            ce[...] = d0_ref[0]
            cg[...] = jnp.zeros_like(cg)

        e = ce[...]          # (nx, L)
        gam = cg[...]        # (nx, nz, L)
        colid = jax.lax.broadcasted_iota(jnp.int32, (1, nz, 1), 1)
        base = j * C * nu
        for t in range(C):
            e_ref[0, t] = e
            gam_ref[0, t] = gam
            A = a_ref[0, t]      # (nx, nx, L)
            Bt = b_ref[0, t]     # (nx, nu, L)
            xi = xi_ref[0, t]    # (nx, L)
            e = jnp.sum(A * e[None, :, :], axis=1) + xi
            acc = A[:, 0, :][:, None, :] * gam[0][None, :, :]
            for m in range(1, nx):
                acc = acc + A[:, m, :][:, None, :] * gam[m][None, :, :]
            for q in range(nu):
                mask = colid == base + t * nu + q
                acc = acc + jnp.where(mask, Bt[:, q, :][:, None, :], 0.0)
            gam = acc
        ce[...] = e
        cg[...] = gam

    return kernel


def _condense_tpu(A, B, xi, d0):
    """Batched condensing, batch-in-lanes. A (Bt,N,nx,nx) etc. -> (e, Gam)
    with the leading stage-0 entries (d0, 0) prepended, matching the ref."""
    Bt_, N, nx, nu = B.shape
    nz = N * nu
    C = max(1, min(8, 64 // max(nx, 1)))  # stage chunk size
    Npad = -(-(N + 1) // C) * C  # slot t holds stage k pre-update: N+1 outputs
    Bp = -(-Bt_ // LANES) * LANES
    G = Bp // LANES

    def pad_b(a):
        if Bp != Bt_:
            a = jnp.concatenate(
                [a, jnp.zeros((Bp - Bt_,) + a.shape[1:], a.dtype)], axis=0
            )
        return a

    def pad_n(a):
        if Npad != N:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], Npad - N) + a.shape[2:], a.dtype)],
                axis=1,
            )
        return a

    # (Bp, Npad, ...) -> (G, Npad, ..., LANES)
    At = jnp.transpose(pad_n(pad_b(A)).reshape(G, LANES, Npad, nx, nx), (0, 2, 3, 4, 1))
    Bt = jnp.transpose(pad_n(pad_b(B)).reshape(G, LANES, Npad, nx, nu), (0, 2, 3, 4, 1))
    xit = jnp.transpose(pad_n(pad_b(xi)).reshape(G, LANES, Npad, nx), (0, 2, 3, 1))
    d0t = jnp.transpose(pad_b(d0).reshape(G, LANES, nx), (0, 2, 1))

    grid = (G, Npad // C)
    e_t, gam_t = pl.pallas_call(
        _make_kernel(nx, nu, nz, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, nx, nx, LANES), lambda g, j: (g, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nx, nu, LANES), lambda g, j: (g, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nx, LANES), lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, LANES), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, nx, LANES), lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nx, nz, LANES), lambda g, j: (g, j, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Npad, nx, LANES), A.dtype),
            jax.ShapeDtypeStruct((G, Npad, nx, nz, LANES), A.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, LANES), A.dtype),
            pltpu.VMEM((nx, nz, LANES), A.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(At, Bt, xit, d0t)

    e = jnp.transpose(e_t, (0, 3, 1, 2)).reshape(Bp, Npad, nx)[:Bt_, : N + 1]
    Gam = jnp.transpose(gam_t, (0, 4, 1, 2, 3)).reshape(Bp, Npad, nx, nz)[
        :Bt_, : N + 1
    ]
    return e, Gam


# ---------------------------------------------------------------------------
# MXU variant: scenarios packed 128//nx per block-diagonal (128, 128) matrix,
# one MXU dot per stage instead of nx*nx VPU broadcast-FMAs. e rides along as
# an extra Gamma column (e_{k+1} = A e_k + xi is the same recurrence with an
# additive term). Stage indices are static (the grid is over scenario blocks
# only), and columns beyond the active triangle are exactly zero, so the
# full-width dot is both correct and tile-aligned.
# ---------------------------------------------------------------------------
def _make_mxu_kernel(nu: int, nz: int, N: int, R: int):
    e_col = nz

    def kernel(ablk_ref, b_ref, xi_ref, d0_ref, out_ref, gam_s):
        gam_s[...] = jnp.zeros_like(gam_s)
        gam_s[:, e_col] = d0_ref[0, 0]
        out_ref[0, 0] = gam_s[...]
        for k in range(N):
            g = jnp.dot(
                ablk_ref[0, k], gam_s[...], preferred_element_type=ablk_ref.dtype
            )
            gam_s[...] = g
            gam_s[:, k * nu : (k + 1) * nu] = b_ref[0, k]
            gam_s[:, e_col] = g[:, e_col] + xi_ref[0, k]
            out_ref[0, k + 1] = gam_s[...]

    return kernel


def _condense_tpu_mxu(A, B, xi, d0):
    """Batched condensing via block-diagonal MXU dots. Returns (e, Gam) with
    the stage-0 (d0, 0) entries included. The (B//P, N, 128, 128) block-
    diagonal transition matrices are assembled in XLA (cheap broadcast) and
    streamed; the kernel runs one (128,128)x(128,nz+1) MXU dot per stage."""
    Bt_, N, nx, nu = B.shape
    nz = N * nu
    P = max(1, 128 // nx)
    R = P * nx
    NB = -(-Bt_ // P)
    Bp = NB * P
    nzp = nz + 1

    def pad_b(a):
        if Bp != Bt_:
            a = jnp.concatenate(
                [a, jnp.zeros((Bp - Bt_,) + a.shape[1:], a.dtype)], axis=0
            )
        return a

    A_g = jnp.swapaxes(pad_b(A).reshape(NB, P, N, nx, nx), 1, 2)  # (NB,N,P,nx,nx)
    eyeP = jnp.eye(P, dtype=A.dtype)
    ablk = (A_g[:, :, :, :, None, :] * eyeP[None, None, :, None, :, None]).reshape(
        NB, N, R, R
    )
    bt = jnp.swapaxes(pad_b(B).reshape(NB, P, N, nx, nu), 1, 2).reshape(NB, N, R, nu)
    xit = jnp.swapaxes(pad_b(xi).reshape(NB, P, N, nx), 1, 2).reshape(NB, N, R)
    d0t = pad_b(d0).reshape(NB, 1, R)

    out = pl.pallas_call(
        _make_mxu_kernel(nu, nz, N, R),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, N, R, R), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, R, nu), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, R), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N + 1, R, nzp), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NB, N + 1, R, nzp), A.dtype),
        scratch_shapes=[pltpu.VMEM((R, nzp), A.dtype)],
    )(ablk, bt, xit, d0t)

    out = jnp.swapaxes(out.reshape(NB, N + 1, P, nx, nzp), 1, 2).reshape(
        Bp, N + 1, nx, nzp
    )[:Bt_]
    return out[..., nz], out[..., :nz]


def _fast_ok(A):
    return (
        jax.default_backend() == "tpu"
        and A.dtype == jnp.float32
        and A.shape[2] <= MAX_NX_FAST
    )


# ---------------------------------------------------------------------------
# general-initial-carry variant: condense a stage SUB-RANGE starting from an
# existing (e0, Gamma0) carry, with the input-selector columns offset by a
# static col0 into a wider nz. This is the building block of SNMPC's
# structured condensing (controllers/snmpc.py): beyond the uncertainty
# propagation horizon only the nominal 8-dim block evolves, so those stages
# run through this kernel instead of the 88-dim stacked scan.
# ---------------------------------------------------------------------------
def condense_scan_from_ref(A, B, xi, e0, G0, col0: int):
    """(N2,nx,nx),(N2,nx,nu),(N2,nx),(nx,),(nx,nz) -> e (N2+1,nx), Gam
    (N2+1,nx,nz); entry 0 is (e0, G0); stage t's B maps to columns
    col0 + t*nu .. col0 + (t+1)*nu."""
    N2, nx, nu = B.shape
    nz = G0.shape[1]
    cols = jnp.arange(nz)

    def body(carry, inp):
        e, Gam = carry
        A_k, B_k, xi_k, t = inp
        e_n = A_k @ e + xi_k
        mask = (cols >= col0 + t * nu) & (cols < col0 + (t + 1) * nu)
        E_k = jnp.where(
            mask[None, :], B_k[:, jnp.clip(cols - col0 - t * nu, 0, nu - 1)], 0.0
        )
        Gam_n = A_k @ Gam + E_k
        return (e_n, Gam_n), (e_n, Gam_n)

    (_, _), (e_tail, Gam_tail) = jax.lax.scan(
        body, (e0, G0), (A, B, xi, jnp.arange(N2))
    )
    e = jnp.concatenate([e0[None], e_tail], axis=0)
    Gam = jnp.concatenate([G0[None], Gam_tail], axis=0)
    return e, Gam


def _make_kernel_from(nx: int, nu: int, nz: int, C: int, col0: int):
    """Like _make_kernel but with an (e0, G0) initial carry and a static
    column offset for the B-selector writes."""

    def kernel(a_ref, b_ref, xi_ref, e0_ref, g0_ref, e_ref, gam_ref, ce, cg):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            ce[...] = e0_ref[0]
            cg[...] = g0_ref[0]

        e = ce[...]          # (nx, L)
        gam = cg[...]        # (nx, nz, L)
        colid = jax.lax.broadcasted_iota(jnp.int32, (1, nz, 1), 1)
        base = col0 + j * C * nu
        for t in range(C):
            e_ref[0, t] = e
            gam_ref[0, t] = gam
            A = a_ref[0, t]      # (nx, nx, L)
            Bt = b_ref[0, t]     # (nx, nu, L)
            xi = xi_ref[0, t]    # (nx, L)
            e = jnp.sum(A * e[None, :, :], axis=1) + xi
            acc = A[:, 0, :][:, None, :] * gam[0][None, :, :]
            for m in range(1, nx):
                acc = acc + A[:, m, :][:, None, :] * gam[m][None, :, :]
            for q in range(nu):
                mask = colid == base + t * nu + q
                acc = acc + jnp.where(mask, Bt[:, q, :][:, None, :], 0.0)
            gam = acc
        ce[...] = e
        cg[...] = gam

    return kernel


def _condense_tpu_from(A, B, xi, e0, G0, col0: int):
    """Batched init-carry condensing (batch-in-lanes). A (Bt,N2,nx,nx),
    e0 (Bt,nx), G0 (Bt,nx,nz) -> e (Bt,N2+1,nx), Gam (Bt,N2+1,nx,nz)."""
    Bt_, N2, nx, nu = B.shape
    nz = G0.shape[2]
    C = max(1, min(8, 64 // max(nx, 1)))
    Npad = -(-(N2 + 1) // C) * C
    Bp = -(-Bt_ // LANES) * LANES
    G = Bp // LANES

    def pad_b(a):
        if Bp != Bt_:
            a = jnp.concatenate(
                [a, jnp.zeros((Bp - Bt_,) + a.shape[1:], a.dtype)], axis=0
            )
        return a

    def pad_n(a):
        if Npad != N2:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], Npad - N2) + a.shape[2:], a.dtype)],
                axis=1,
            )
        return a

    At = jnp.transpose(pad_n(pad_b(A)).reshape(G, LANES, Npad, nx, nx), (0, 2, 3, 4, 1))
    Bt = jnp.transpose(pad_n(pad_b(B)).reshape(G, LANES, Npad, nx, nu), (0, 2, 3, 4, 1))
    xit = jnp.transpose(pad_n(pad_b(xi)).reshape(G, LANES, Npad, nx), (0, 2, 3, 1))
    e0t = jnp.transpose(pad_b(e0).reshape(G, LANES, nx), (0, 2, 1))
    g0t = jnp.transpose(pad_b(G0).reshape(G, LANES, nx, nz), (0, 2, 3, 1))

    grid = (G, Npad // C)
    e_t, gam_t = pl.pallas_call(
        _make_kernel_from(nx, nu, nz, C, col0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, nx, nx, LANES), lambda g, j: (g, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nx, nu, LANES), lambda g, j: (g, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nx, LANES), lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, LANES), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, nz, LANES), lambda g, j: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, nx, LANES), lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nx, nz, LANES), lambda g, j: (g, j, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Npad, nx, LANES), A.dtype),
            jax.ShapeDtypeStruct((G, Npad, nx, nz, LANES), A.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, LANES), A.dtype),
            pltpu.VMEM((nx, nz, LANES), A.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(At, Bt, xit, e0t, g0t)

    e = jnp.transpose(e_t, (0, 3, 1, 2)).reshape(Bp, Npad, nx)[:Bt_, : N2 + 1]
    Gam = jnp.transpose(gam_t, (0, 4, 1, 2, 3)).reshape(Bp, Npad, nx, nz)[
        :Bt_, : N2 + 1
    ]
    return e, Gam


@functools.lru_cache(maxsize=None)
def _condense_scan_from_factory(col0: int):
    @custom_batching.custom_vmap
    def fn(A, B, xi, e0, G0):
        return condense_scan_from_ref(A, B, xi, e0, G0, col0)

    @fn.def_vmap
    def _vmap(axis_size, in_batched, A, B, xi, e0, G0):
        bc = lambda x, b: x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        A, B, xi, e0, G0 = (
            bc(v, b) for v, b in zip((A, B, xi, e0, G0), in_batched)
        )
        if _fast_ok(A):
            e, Gam = _condense_tpu_from(A, B, xi, e0, G0, col0)
        else:
            e, Gam = jax.vmap(
                lambda a, b, x, e_, g_: condense_scan_from_ref(a, b, x, e_, g_, col0)
            )(A, B, xi, e0, G0)
        return (e, Gam), (True, True)

    return fn


def condense_scan_from(A, B, xi, e0, G0, col0: int):
    """Init-carry condense over a stage sub-range (batched rule -> Pallas
    lanes kernel). `col0` must be a static python int."""
    return _condense_scan_from_factory(int(col0))(A, B, xi, e0, G0)


@custom_batching.custom_vmap
def condense_scan(A, B, xi, d0):
    """Condense one scenario (batched rule -> Pallas lanes kernel)."""
    return condense_scan_ref(A, B, xi, d0)


@condense_scan.def_vmap
def _condense_scan_vmap(axis_size, in_batched, A, B, xi, d0):
    bA, bB, bxi, bd0 = in_batched
    bc = lambda x, b: x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    A, B, xi, d0 = bc(A, bA), bc(B, bB), bc(xi, bxi), bc(d0, bd0)
    if _fast_ok(A):
        e, Gam = _condense_tpu(A, B, xi, d0)
    else:
        e, Gam = jax.vmap(condense_scan_ref)(A, B, xi, d0)
    return (e, Gam), (True, True)


# ---------------------------------------------------------------------------
# Differentiable mode: plain jnp scan condensing (see ops/diffmode.py).
# ---------------------------------------------------------------------------
from tum_control_tpu.ops.diffmode import DIFFERENTIABLE as _DIFF  # noqa: E402

if _DIFF:
    condense_scan = condense_scan_ref  # noqa: F811

    def condense_scan_from(A, B, xi, e0, G0, col0: int):  # noqa: F811
        return condense_scan_from_ref(A, B, xi, e0, G0, int(col0))
