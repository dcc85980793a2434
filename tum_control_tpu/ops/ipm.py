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

from tum_control_tpu.ops.pallas_kernels.chol import chol_apply_packed, chol_factor_packed
from tum_control_tpu.ops.soft_qp import (
    CondensedQP,
    _mv,
    con_mul,
    con_normal,
    con_tmul,
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
    eye = jnp.eye(nz, dtype=dtype)

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

    # stacked (4, nc) complementarity masks — the gap reductions and the
    # eight fraction-to-boundary reductions below each collapse into ONE
    # kernel instead of 4-8 separate reduce launches (the IPM is launch-
    # latency bound: ~5 us per tiny kernel at batch 128, see docs/RESULTS.md
    # roofline section)
    comp_mask = jnp.stack([act_u, act_l, s_u, s_l])

    def total_gap(lam_u, pu, lam_l, pl, mu_u, su, mu_l, sl):
        prods = jnp.stack([lam_u * pu, lam_l * pl, mu_u * su, mu_l * sl])
        return jnp.sum(jnp.where(comp_mask, prods, 0.0))

    def body(carry, _):
        w, Gw, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l = carry
        v = Gw + c0  # G w carried incrementally (exact: updates are linear)
        # primal linkage residuals (zero once iterates become feasible)
        r_pu = jnp.where(act_u, v + pu - su - ub, 0.0)
        r_pl = jnp.where(act_l, pl - v - sl + lb, 0.0)

        gap = total_gap(lam_u, pu, lam_l, pl, mu_u, su, mu_l, sl)

        su_s = jnp.where(s_u, su, 1.0)
        sl_s = jnp.where(s_l, sl, 1.0)
        rs_u = z1 + z2 * su - lam_u - mu_u
        rs_l = z1 + z2 * sl - lam_l - mu_l
        b_u = z2 + mu_u / su_s
        b_l = z2 + mu_l / sl_s
        ipb_u = jnp.where(s_u, lam_u / (pu * b_u), 0.0)
        ipb_l = jnp.where(s_l, lam_l / (pl * b_l), 0.0)
        D_u = 1.0 + ipb_u
        D_l = 1.0 + ipb_l
        sig_u = jnp.where(act_u, lam_u / (pu * D_u), 0.0)
        sig_l = jnp.where(act_l, lam_l / (pl * D_l), 0.0)

        r_w = _mv(H0, w) + g0 + con_tmul(qp, lam_u - lam_l, n_id)
        H = H0 + con_normal(qp, sig_u + sig_l, n_id) + 1e-11 * eye
        L = chol_factor_packed(H)

        # one stacked (8, nc) fraction-to-boundary reduction (see comp_mask)
        ftb_mask = jnp.concatenate([comp_mask, comp_mask])

        def max_step_all(xs, dxs):
            X = jnp.stack(xs)
            D = jnp.stack(dxs)
            ratio = jnp.where(
                ftb_mask & (D < 0), -X / jnp.where(D < 0, D, -1.0), jnp.inf
            )
            return jnp.min(ratio)

        def directions(tau):
            """Newton directions for barrier target tau (same factorization)."""
            a_u = jnp.where(s_u, -rs_u + tau / su_s - mu_u, 0.0)
            a_l = jnp.where(s_l, -rs_l + tau / sl_s - mu_l, 0.0)
            chat_u = jnp.where(
                act_u, (tau / pu - lam_u + lam_u * r_pu / pu - ipb_u * a_u) / D_u, 0.0
            )
            chat_l = jnp.where(
                act_l, (tau / pl - lam_l + lam_l * r_pl / pl - ipb_l * a_l) / D_l, 0.0
            )
            dw = -chol_apply_packed(L, r_w + con_tmul(qp, chat_u - chat_l, n_id))
            Gdw = con_mul(qp, dw, n_id)
            dlam_u = jnp.where(act_u, chat_u + sig_u * Gdw, 0.0)
            dlam_l = jnp.where(act_l, chat_l - sig_l * Gdw, 0.0)
            dsu = jnp.where(s_u, (dlam_u + a_u) / b_u, 0.0)
            dsl = jnp.where(s_l, (dlam_l + a_l) / b_l, 0.0)
            dmu_u = jnp.where(s_u, (tau - mu_u * su - mu_u * dsu) / su_s, 0.0)
            dmu_l = jnp.where(s_l, (tau - mu_l * sl - mu_l * dsl) / sl_s, 0.0)
            dpu = jnp.where(act_u, dsu - Gdw - r_pu, 0.0)
            dpl = jnp.where(act_l, dsl + Gdw - r_pl, 0.0)
            # row order matches ftb_mask = [act_u, act_l, s_u, s_l] x 2
            step = max_step_all(
                (lam_u, lam_l, mu_u, mu_l, pu, pl, su, sl),
                (dlam_u, dlam_l, dmu_u, dmu_l, dpu, dpl, dsu, dsl),
            )
            alpha = jnp.minimum(1.0, gamma_ftb * step)
            return (dw, Gdw, dsu, dsl, dpu, dpl, dlam_u, dlam_l, dmu_u, dmu_l), alpha

        # Mehrotra: affine predictor fixes the centering parameter
        d_aff, alpha_aff = directions(jnp.zeros((), dtype=dtype))
        _, _, dsu_a, dsl_a, dpu_a, dpl_a, dlu_a, dll_a, dmu_a, dml_a = d_aff
        gap_aff = total_gap(
            lam_u + alpha_aff * dlu_a, pu + alpha_aff * dpu_a,
            lam_l + alpha_aff * dll_a, pl + alpha_aff * dpl_a,
            mu_u + alpha_aff * dmu_a, su + alpha_aff * dsu_a,
            mu_l + alpha_aff * dml_a, sl + alpha_aff * dsl_a,
        )
        sig_c = jnp.clip((gap_aff / jnp.maximum(gap, 1e-30)) ** 3, 1e-4, 0.99)
        tau = sig_c * gap / nt

        (dw, Gdw, dsu, dsl, dpu, dpl, dlam_u, dlam_l, dmu_u, dmu_l), alpha = directions(tau)

        # freeze once converged (or if a step went non-finite) — keeps the
        # fixed-iteration scan numerically safe after the gap collapses
        unconverged = gap > 1e-11 * nt
        ok = unconverged & jnp.all(jnp.isfinite(dw)) & jnp.isfinite(alpha)
        upd = lambda x, dx, m: jnp.where(ok & m, x + alpha * dx, x)
        w = jnp.where(ok, w + alpha * dw, w)
        Gw = jnp.where(ok, Gw + alpha * Gdw, Gw)
        su = upd(su, dsu, s_u)
        sl = upd(sl, dsl, s_l)
        pu = upd(pu, dpu, act_u)
        pl = upd(pl, dpl, act_l)
        lam_u = upd(lam_u, dlam_u, act_u)
        lam_l = upd(lam_l, dlam_l, act_l)
        mu_u = upd(mu_u, dmu_u, s_u)
        mu_l = upd(mu_l, dmu_l, s_l)
        # stats count *unconverged* iterations, not applied updates: a solve
        # frozen by non-finite directions must not read as fast convergence
        return (w, Gw, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l), unconverged

    Gw0 = jnp.zeros(nc, dtype=dtype)  # G w at w = 0
    carry = (w, Gw0, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l)
    carry, oks = jax.lax.scan(body, carry, None, length=n_iters)
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
