"""Primal-dual interior-point method for soft-constrained condensed QPs.

The robust work-horse behind `RTIEngine` — the role HPIPM plays for acados
(NMPC_STM_acados_settings.py:231: FULL_CONDENSING_HPIPM). Handles the
reference's L1+L2-softened two-sided constraints *and* hard rows in one
uniform infeasible-start formulation. Per constraint row i, with
v = G_i w + c0_i, the (upper-side) conditions are

    stationarity      z1 + z2 su - lam - mu = 0        (soft rows only)
    primal linkage    v + p - su - ub = 0,   p > 0
    complementarity   lam p = tau,  mu su = tau        (su, mu soft only)

Both slack-side variables (su, mu) and the side distance p are eliminated
analytically inside each Newton step — the standard HPIPM soft-constraint
condensation — so each IPM iteration reduces to one dense (nz x nz)
normal-equations solve:

    [H0 + G' diag(sig_u + sig_l) G] dw = -r_w - G'(chat_u - chat_l)

Hard rows are the z2 -> inf limit (no slack, lam p = tau only). A fixed
iteration count with fraction-to-boundary steps, then a short semismooth
Newton polish (`soft_qp.newton_polish`) lands on the exact minimizer.
Static shapes throughout — vmappable to thousands of QPs per TPU program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import functools

from jax import custom_batching

from tum_control_tpu.ops.pallas_kernels.chol import LANES, _cholesky_tpu_packed
from tum_control_tpu.ops.pallas_kernels.ipm_iter import (
    fused_iteration_batched,
    iteration_ref,
    sigma_of,
    _lanes,
    _unlanes,
)
from tum_control_tpu.ops.soft_qp import (
    CondensedQP,
    newton_polish,
)

BIG_THRESH = 1e10  # row sides with |bound| above this are treated as absent
HARD_THRESH = 1e6  # z2 at or above this marks a hard row


class IPMWarm(NamedTuple):
    """Dual/slack warm-start carried across RTI steps (same constraint
    pattern every solve, slowly-varying active set). Safeguarded on reuse:
    duals clipped into [WARM_MIN, WARM_MAX], primal side distances recomputed
    at the new linearization point with a positivity floor."""

    su: jnp.ndarray
    sl: jnp.ndarray
    lam_u: jnp.ndarray
    lam_l: jnp.ndarray
    mu_u: jnp.ndarray
    mu_l: jnp.ndarray


WARM_MIN = 1e-3
WARM_MAX = 1e5


class IPMStats(NamedTuple):
    """Actual per-solve convergence telemetry (the HPIPM `qp_iter` analog —
    the reference logs real iteration counts, NMPC_class.py:202-206, not the
    configured maximum).

    iters: number of Newton iterations that actually updated the iterate
           (the convergence freeze `gap <= 1e-11*nt` stops counting).
    gap:   final duality gap (complementarity) after the last update,
           normalized by the active-constraint count.
    """

    iters: jnp.ndarray
    gap: jnp.ndarray


def init_warm(nc: int, dtype=jnp.float32) -> IPMWarm:
    ones = jnp.ones(nc, dtype=dtype)
    return IPMWarm(su=ones, sl=ones, lam_u=ones, lam_l=ones, mu_u=ones, mu_l=ones)


def _masks_of(lb, ub, z2):
    act_u = ub < BIG_THRESH
    act_l = lb > -BIG_THRESH
    soft = z2 < HARD_THRESH
    return act_u, act_l, act_u & soft, act_l & soft


def _iterations_ref_single(H0, g0, G, c0, lb, ub, z1, z2, nt, *carry,
                           n_iters, n_id, gamma_ftb):
    """Single-scenario reference: scan of {sigma -> H -> cholesky ->
    iteration_ref}. Also the oracle the fused TPU path is tested against."""
    from tum_control_tpu.ops.soft_qp import con_normal as _con_normal

    act_u, act_l, s_u, s_l = _masks_of(lb, ub, z2)
    eye = jnp.eye(H0.shape[0], dtype=H0.dtype)
    qp = CondensedQP(H0=H0, g0=g0, G=G, c0=c0, lb=lb, ub=ub, z1=z1, z2=z2)
    sig0 = sigma_of(*carry[2:10], z1, z2, act_u, act_l, s_u, s_l)

    ncg = G.shape[0]

    def body(cs, _):
        c, sig = cs
        H = H0 + _con_normal(qp, sig, n_id) + 1e-11 * eye
        L = jnp.linalg.cholesky(H)
        w_c, lam_u_c, lam_l_c = c[0], c[6], c[7]
        lam_d = lam_u_c - lam_l_c
        rw = (
            jnp.sum(H0 * w_c[None, :], axis=-1) + g0
            + jnp.sum(G * lam_d[:ncg, None], axis=-2)
        )
        if n_id:
            rw = rw + lam_d[ncg:]
        c, sig_next, unconv = iteration_ref(
            L, G, rw, c0, lb, ub, z1, z2, nt, *c,
            n_id=n_id, gamma_ftb=gamma_ftb,
        )
        return (c, sig_next), unconv

    (c, _), oks = jax.lax.scan(body, (tuple(carry), sig0), None, length=n_iters)
    return tuple(c) + (oks,)


@functools.lru_cache(maxsize=None)
def _ipm_iterations(n_iters: int, n_id: int, gamma_ftb: float):
    """custom_vmap: per-scenario jnp reference; under vmap on TPU/f32 with a
    lane-multiple batch, the fused pipeline (MXU normal product + Cholesky
    kernel + one fused iteration kernel per Mehrotra step)."""
    from tum_control_tpu.ops.soft_qp import _NORMAL_PREC

    @custom_batching.custom_vmap
    def fn(H0, g0, G, c0, lb, ub, z1, z2, nt, *carry):
        out = _iterations_ref_single(
            H0, g0, G, c0, lb, ub, z1, z2, nt, *carry,
            n_iters=n_iters, n_id=n_id, gamma_ftb=gamma_ftb,
        )
        return out  # 10 carry leaves + oks (n_iters,)

    @fn.def_vmap
    def _rule(axis_size, in_batched, H0, g0, G, c0, lb, ub, z1, z2, nt, *carry):
        args = (H0, g0, G, c0, lb, ub, z1, z2, nt) + tuple(carry)
        bc = lambda x, b: x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        H0, g0, G, c0, lb, ub, z1, z2, nt, *carry = (
            bc(x, b) for x, b in zip(args, in_batched)
        )
        B = carry[0].shape[0]
        nz = H0.shape[-1]
        fast = (
            jax.default_backend() == "tpu"
            and H0.dtype == jnp.float32
            and B % LANES == 0
            and n_id == nz
        )
        if not fast:
            out = jax.vmap(
                lambda *a: _iterations_ref_single(
                    *a, n_iters=n_iters, n_id=n_id, gamma_ftb=gamma_ftb
                )
            )(H0, g0, G, c0, lb, ub, z1, z2, nt, *carry)
            return tuple(out), (True,) * 11

        Gn = B // LANES
        ncg = G.shape[1]
        act_u, act_l, s_u, s_l = _masks_of(lb, ub, z2)

        lanes_mat = lambda a: jnp.transpose(
            a.reshape(Gn, LANES, a.shape[1], a.shape[2]), (0, 2, 3, 1)
        )
        Gt = lanes_mat(G)
        H0t = lanes_mat(H0)
        g0t = _lanes(g0, B)
        c0t = _lanes(c0, B)
        lbt = _lanes(lb, B)
        ubt = _lanes(ub, B)
        z1t = _lanes(z1, B)
        z2t = _lanes(z2, B)
        ntt = _lanes(nt[:, None], B)
        carry_t = tuple(_lanes(x, B) for x in carry)

        eye = jnp.eye(nz, dtype=H0.dtype)
        sig0 = sigma_of(*carry[2:10], z1, z2, act_u, act_l, s_u, s_l)

        nc = c0.shape[-1]

        def body(cs, _):
            c_t, sig = cs
            Hn = jnp.matmul(
                jnp.swapaxes(G, 1, 2) * sig[:, None, :ncg], G,
                precision=_NORMAL_PREC,
            )
            H = H0 + Hn + (sig[:, ncg:, None] + 1e-11) * eye[None]
            Lt = _cholesky_tpu_packed(H)
            # stationarity residual rw = H0 w + g0 + G'(lam_u - lam_l),
            # computed HERE (XLA, lanes-layout einsums) so the kernel does
            # not stream the (nz, nz) H0 — its largest operand, which blew
            # the 16 MB scoped-VMEM limit at multi-block grids
            w_t, lu_t, ll_t = c_t[0], c_t[6], c_t[7]
            lam_d = lu_t - ll_t
            # broadcast-multiply + reduce, NOT einsum/dot: the IPM's
            # gradient matvecs must be f32-exact (MXU bf16 passes bias the
            # QP solution directly — multi-meter weave, see soft_qp._mv)
            rwt = (
                jnp.sum(H0t * w_t[:, None, :, :], axis=2)
                + g0t
                + jnp.sum(Gt * lam_d[:, :ncg, None, :], axis=1)
                + lam_d[:, ncg:]
            )
            c_t, sig_t, unc = fused_iteration_batched(
                Lt, Gt, rwt, c0t, lbt, ubt, z1t, z2t, ntt, c_t,
                gamma_ftb,
            )
            return (c_t, _unlanes(sig_t, B)), unc.reshape(B)

        (c_t, _), oks = jax.lax.scan(body, (carry_t, sig0), None, length=n_iters)
        carry_out = tuple(_unlanes(x, B) for x in c_t)
        return carry_out + (jnp.moveaxis(oks, 0, 1),), (True,) * 11

    return fn


def solve_soft_qp_ipm(
    qp: CondensedQP,
    n_iters: int = 30,
    n_polish: int = 2,
    gamma_ftb: float = 0.99,
    sigma: float = 0.2,
    warm: IPMWarm = None,
    n_id: int = 0,
    want_stats: bool = False,
):
    """Solve the soft QP. Returns (w, kkt_res) — or (w, kkt_res, warm_out)
    when a warm start is supplied; `want_stats=True` appends an `IPMStats`
    (actual iterations used + final duality gap). `n_id` > 0 marks the last
    n_id constraint rows as identity rows over w (see CondensedQP) — they
    are handled analytically, never stored or multiplied."""
    H0, g0, G, c0, lb, ub, z1, z2 = qp
    nz = H0.shape[0]
    nc = c0.shape[0]
    dtype = H0.dtype

    act_u = ub < BIG_THRESH
    act_l = lb > -BIG_THRESH
    soft = z2 < HARD_THRESH
    s_u = act_u & soft  # upper side has slack variables
    s_l = act_l & soft
    ones = jnp.ones(nc, dtype=dtype)

    v0 = c0  # at w = 0
    if warm is None:
        su = jnp.where(s_u, ones, 0.0)
        sl = jnp.where(s_l, ones, 0.0)
        pu = jnp.where(act_u, jnp.maximum(ub + su - v0, 1.0), 1.0)
        pl = jnp.where(act_l, jnp.maximum(v0 + sl - lb, 1.0), 1.0)
        lam_u = jnp.where(act_u, ones, 0.0)
        lam_l = jnp.where(act_l, ones, 0.0)
        mu_u = jnp.where(s_u, ones, 0.0)
        mu_l = jnp.where(s_l, ones, 0.0)
    else:
        clipw = lambda x: jnp.clip(x, WARM_MIN, WARM_MAX)
        su = jnp.where(s_u, clipw(warm.su), 0.0)
        sl = jnp.where(s_l, clipw(warm.sl), 0.0)
        pu = jnp.where(act_u, jnp.maximum(ub + su - v0, WARM_MIN), 1.0)
        pl = jnp.where(act_l, jnp.maximum(v0 + sl - lb, WARM_MIN), 1.0)
        lam_u = jnp.where(act_u, clipw(warm.lam_u), 0.0)
        lam_l = jnp.where(act_l, clipw(warm.lam_l), 0.0)
        mu_u = jnp.where(s_u, clipw(warm.mu_u), 0.0)
        mu_l = jnp.where(s_l, clipw(warm.mu_l), 0.0)
    w = jnp.zeros(nz, dtype=dtype)

    nt = jnp.maximum(
        (jnp.sum(act_u) + jnp.sum(act_l) + jnp.sum(s_u) + jnp.sum(s_l)).astype(dtype), 1.0
    )

    Gw0 = jnp.zeros(nc, dtype=dtype)  # G w at w = 0
    carry = (w, Gw0, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l)
    # the Mehrotra iterations: shared math in pallas_kernels/ipm_iter.py —
    # jnp reference per scenario (CPU/f64), ONE fused Pallas kernel per
    # iteration + MXU normal-matrix product + Cholesky kernel under vmap on
    # TPU (3 launches/iteration instead of ~20; the IPM is launch-latency
    # bound, docs/RESULTS.md roofline)
    out = _ipm_iterations(n_iters, n_id, gamma_ftb)(
        qp.H0, qp.g0, qp.G, c0, lb, ub, z1, z2, nt, *carry
    )
    carry, oks = out[:10], out[10]
    w = carry[0]

    # exact finish: a few semismooth-Newton steps from the IPM point
    w, kkt = newton_polish(qp, w, n_iters=n_polish, n_id=n_id)
    if want_stats:
        _, _, su_f, sl_f, pu_f, pl_f, lu_f, ll_f, mu_f, ml_f = carry
        comp_mask_f = jnp.stack([act_u, act_l, s_u, s_l])
        prods_f = jnp.stack([lu_f * pu_f, ll_f * pl_f, mu_f * su_f, ml_f * sl_f])
        gap_f = jnp.sum(jnp.where(comp_mask_f, prods_f, 0.0)) / nt
        stats = IPMStats(iters=jnp.sum(oks.astype(jnp.int32)), gap=gap_f)
    if warm is None:
        return (w, kkt, stats) if want_stats else (w, kkt)
    warm_out = IPMWarm(
        su=carry[2], sl=carry[3], lam_u=carry[6], lam_l=carry[7],
        mu_u=carry[8], mu_l=carry[9],
    )
    return (w, kkt, warm_out, stats) if want_stats else (w, kkt, warm_out)
