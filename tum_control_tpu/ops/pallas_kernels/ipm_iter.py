"""Pallas TPU kernel: one fused Mehrotra IPM iteration (batch-in-lanes).

The fixed-iteration soft-QP IPM (ops/ipm.py) is launch-latency bound on
TPU: each iteration's ~20 small vector kernels + 2 separate triangular-
solve launches cost ~5 us apiece at batch 128 (measured 86 us/iteration
against a ~15 us flop+bandwidth bound; docs/RESULTS.md roofline). This
kernel runs the ENTIRE iteration — residuals, barrier algebra, BOTH
predictor/corrector direction solves (triangular solves inlined against
the packed Cholesky factor), fraction-to-boundary reductions, Mehrotra
centering, and the guarded update — as ONE Pallas invocation per
128-scenario lane block, with G, H0 and the factor resident in VMEM.
Per iteration the full pipeline is then 3 launches: the normal-matrix
MXU product (XLA), the Cholesky factor kernel (chol.py), and this.

The pure-jnp reference `iteration_ref` is the custom_vmap primal (CPU /
f64 / odd-batch paths) and the exactness oracle
(tests/test_ipm_fused.py); the HPIPM-style soft-slack elimination math
is unchanged from ops/ipm.py, which now delegates to this module.

Ref role: HPIPM (NMPC_STM_acados_settings.py:231-232).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BS = 16  # triangular-solve block size (matches chol.py)


# ---------------------------------------------------------------------------
# shared scalar math (traced both by the jnp reference and inside the kernel)
# ---------------------------------------------------------------------------
def _barrier_terms(su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l,
                   z1, z2, act_u, act_l, s_u, s_l):
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
    return su_s, sl_s, rs_u, rs_l, b_u, b_l, ipb_u, ipb_l, D_u, D_l, sig_u, sig_l


def sigma_of(su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l, z1, z2,
             act_u, act_l, s_u, s_l):
    """sig_u + sig_l for the normal-matrix product H = H0 + G' diag(sig) G."""
    *_, sig_u, sig_l = _barrier_terms(
        su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l, z1, z2, act_u, act_l, s_u, s_l
    )
    return sig_u + sig_l


# ---------------------------------------------------------------------------
# pure-jnp reference (single scenario) — primal + oracle
# ---------------------------------------------------------------------------
def iteration_ref(L, G, rw, c0, lb, ub, z1, z2, nt,
                  w, Gw, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l,
                  *, n_id: int, gamma_ftb: float):
    """One Mehrotra iteration from the Cholesky factor L of the current
    normal matrix and the precomputed stationarity residual
    rw = H0 w + g0 + G'(lam_u - lam_l) (computed OUTSIDE the kernel: H0 is
    the kernel's largest operand and pushed the multi-block VMEM footprint
    past the 16 MB scoped limit). Returns the updated 10-tuple carry +
    sigma for the next iteration's H + the `unconverged` flag. Math
    identical to the r4 ops/ipm.py scan body (incl. the incremental G w
    carry)."""
    ncg = G.shape[0]
    act_u = ub < 1e10
    act_l = lb > -1e10
    soft = z2 < 1e6
    s_u = act_u & soft
    s_l = act_l & soft

    def con_mul(x):
        y = jnp.sum(G * x[None, :], axis=-1)
        return jnp.concatenate([y, x]) if n_id else y

    def con_tmul(y):
        t = jnp.sum(G * y[:ncg, None], axis=-2)
        return t + y[ncg:] if n_id else t

    def solve(rhs):
        return jax.scipy.linalg.cho_solve((L, True), rhs)

    v = Gw + c0
    r_pu = jnp.where(act_u, v + pu - su - ub, 0.0)
    r_pl = jnp.where(act_l, pl - v - sl + lb, 0.0)
    comp_mask = jnp.stack([act_u, act_l, s_u, s_l])

    def total_gap(lu, pu_, ll, pl_, mu, su_, ml, sl_):
        prods = jnp.stack([lu * pu_, ll * pl_, mu * su_, ml * sl_])
        return jnp.sum(jnp.where(comp_mask, prods, 0.0))

    gap = total_gap(lam_u, pu, lam_l, pl, mu_u, su, mu_l, sl)

    (su_s, sl_s, rs_u, rs_l, b_u, b_l, ipb_u, ipb_l, D_u, D_l,
     sig_u, sig_l) = _barrier_terms(
        su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l, z1, z2, act_u, act_l, s_u, s_l
    )
    r_w = rw
    ftb_mask = jnp.concatenate([comp_mask, comp_mask])

    def directions(tau):
        a_u = jnp.where(s_u, -rs_u + tau / su_s - mu_u, 0.0)
        a_l = jnp.where(s_l, -rs_l + tau / sl_s - mu_l, 0.0)
        chat_u = jnp.where(
            act_u, (tau / pu - lam_u + lam_u * r_pu / pu - ipb_u * a_u) / D_u, 0.0
        )
        chat_l = jnp.where(
            act_l, (tau / pl - lam_l + lam_l * r_pl / pl - ipb_l * a_l) / D_l, 0.0
        )
        dw = -solve(r_w + con_tmul(chat_u - chat_l))
        Gdw = con_mul(dw)
        dlam_u = jnp.where(act_u, chat_u + sig_u * Gdw, 0.0)
        dlam_l = jnp.where(act_l, chat_l - sig_l * Gdw, 0.0)
        dsu = jnp.where(s_u, (dlam_u + a_u) / b_u, 0.0)
        dsl = jnp.where(s_l, (dlam_l + a_l) / b_l, 0.0)
        dmu_u = jnp.where(s_u, (tau - mu_u * su - mu_u * dsu) / su_s, 0.0)
        dmu_l = jnp.where(s_l, (tau - mu_l * sl - mu_l * dsl) / sl_s, 0.0)
        dpu = jnp.where(act_u, dsu - Gdw - r_pu, 0.0)
        dpl = jnp.where(act_l, dsl + Gdw - r_pl, 0.0)
        X = jnp.stack([lam_u, lam_l, mu_u, mu_l, pu, pl, su, sl])
        D = jnp.stack([dlam_u, dlam_l, dmu_u, dmu_l, dpu, dpl, dsu, dsl])
        ratio = jnp.where(ftb_mask & (D < 0), -X / jnp.where(D < 0, D, -1.0), jnp.inf)
        alpha = jnp.minimum(1.0, gamma_ftb * jnp.min(ratio))
        return (dw, Gdw, dsu, dsl, dpu, dpl, dlam_u, dlam_l, dmu_u, dmu_l), alpha

    d_aff, alpha_aff = directions(jnp.zeros((), dtype=w.dtype))
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
    sig_next = sigma_of(su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l, z1, z2,
                        act_u, act_l, s_u, s_l)
    return (w, Gw, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l), sig_next, unconverged


# ---------------------------------------------------------------------------
# the fused kernel (one lane block = 128 scenarios)
# ---------------------------------------------------------------------------
def _make_kernel(nz: int, ncg: int, npad: int, gamma_ftb: float):
    nc = ncg + nz  # general rows + identity rows (n_id == nz by construction)

    def kernel(L_ref, G_ref, rw_ref, c0_ref, lb_ref, ub_ref,
               z1_ref, z2_ref, nt_ref,
               w_ref, Gw_ref, su_ref, sl_ref, pu_ref, pl_ref,
               lu_ref, ll_ref, mu_ref, ml_ref,
               # outputs
               wo_ref, Gwo_ref, suo_ref, slo_ref, puo_ref, plo_ref,
               luo_ref, llo_ref, muo_ref, mlo_ref, sino_ref, unc_ref,
               # scratch
               x_ref):
        G = G_ref[0]            # (ncg, nz, 128)
        c0 = c0_ref[0]          # (nc, 128)
        lb = lb_ref[0]
        ub = ub_ref[0]
        z1 = z1_ref[0]
        z2 = z2_ref[0]
        nt = nt_ref[0]          # (1, 128)
        w = w_ref[0]            # (nz, 128)
        Gw = Gw_ref[0]          # (nc, 128)
        su = su_ref[0]
        sl = sl_ref[0]
        pu = pu_ref[0]
        pl = pl_ref[0]
        lam_u = lu_ref[0]
        lam_l = ll_ref[0]
        mu_u = mu_ref[0]
        mu_l = ml_ref[0]

        act_u = ub < 1e10
        act_l = lb > -1e10
        soft = z2 < 1e6
        s_u = act_u & soft
        s_l = act_l & soft

        def con_mul(x):           # (nz,128) -> (nc,128)
            y = jnp.sum(G * x[None, :, :], axis=1)
            return jnp.concatenate([y, x], axis=0)

        def con_tmul(y):          # (nc,128) -> (nz,128)
            # NB: y[:ncg, None, :] (slice + newaxis in one indexing op)
            # lowers to a Mosaic gather and fails; keep the ops separate
            yg = jnp.expand_dims(jax.lax.slice_in_dim(y, 0, ncg, axis=0), 1)
            t = jnp.sum(G * yg, axis=0)
            return t + jax.lax.slice_in_dim(y, ncg, nc, axis=0)

        def solve(rhs):
            """L L^T x = rhs via blocked fwd/bwd substitution on the padded
            (npad, 128) scratch (chol.py solve kernel inlined)."""
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
            x_ref[...] = jnp.concatenate(
                [rhs, jnp.zeros((npad - nz, rhs.shape[1]), rhs.dtype)], axis=0
            )
            for jb in range(0, npad, BS):
                for jj in range(BS):
                    j = jb + jj
                    yj = x_ref[j, :] / L_ref[0, j, j, :]
                    sub = L_ref[0, jb : jb + BS, j, :]
                    x_ref[jb : jb + BS, :] = (
                        x_ref[jb : jb + BS, :]
                        - jnp.where(rows8 > jj, sub, 0.0) * yj[None, :]
                    )
                    x_ref[j, :] = yj
                if jb + BS < npad:
                    acc = None
                    for t in range(BS):
                        yt = x_ref[jb + t : jb + t + 1, :]
                        term = L_ref[0, jb + BS :, jb + t, :] * yt
                        acc = term if acc is None else acc + term
                    x_ref[jb + BS :, :] = x_ref[jb + BS :, :] - acc
            for jb in range(npad - BS, -1, -BS):
                for jj in range(BS - 1, -1, -1):
                    j = jb + jj
                    xj = x_ref[j, :] / L_ref[0, j, j, :]
                    row = L_ref[0, j, jb : jb + BS, :]
                    x_ref[jb : jb + BS, :] = (
                        x_ref[jb : jb + BS, :]
                        - jnp.where(rows8 < jj, row, 0.0) * xj[None, :]
                    )
                    x_ref[j, :] = xj
                if jb > 0:
                    acc = None
                    for t in range(BS):
                        xt = x_ref[jb + t : jb + t + 1, :]
                        term = L_ref[0, jb + t, :jb, :] * xt
                        acc = term if acc is None else acc + term
                    x_ref[:jb, :] = x_ref[:jb, :] - acc
            return x_ref[:nz, :]

        v = Gw + c0
        r_pu = jnp.where(act_u, v + pu - su - ub, 0.0)
        r_pl = jnp.where(act_l, pl - v - sl + lb, 0.0)

        def total_gap(lu, pu_, ll, pl_, mu, su_, ml, sl_):
            return (
                jnp.sum(jnp.where(act_u, lu * pu_, 0.0), axis=0)
                + jnp.sum(jnp.where(act_l, ll * pl_, 0.0), axis=0)
                + jnp.sum(jnp.where(s_u, mu * su_, 0.0), axis=0)
                + jnp.sum(jnp.where(s_l, ml * sl_, 0.0), axis=0)
            )  # (128,)

        gap = total_gap(lam_u, pu, lam_l, pl, mu_u, su, mu_l, sl)

        (su_s, sl_s, rs_u, rs_l, b_u, b_l, ipb_u, ipb_l, D_u, D_l,
         sig_u, sig_l) = _barrier_terms(
            su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l, z1, z2,
            act_u, act_l, s_u, s_l,
        )
        r_w = rw_ref[0]

        def directions(tau):      # tau (128,)
            a_u = jnp.where(s_u, -rs_u + tau[None, :] / su_s - mu_u, 0.0)
            a_l = jnp.where(s_l, -rs_l + tau[None, :] / sl_s - mu_l, 0.0)
            chat_u = jnp.where(
                act_u,
                (tau[None, :] / pu - lam_u + lam_u * r_pu / pu - ipb_u * a_u) / D_u,
                0.0,
            )
            chat_l = jnp.where(
                act_l,
                (tau[None, :] / pl - lam_l + lam_l * r_pl / pl - ipb_l * a_l) / D_l,
                0.0,
            )
            dw = -solve(r_w + con_tmul(chat_u - chat_l))
            Gdw = con_mul(dw)
            dlam_u = jnp.where(act_u, chat_u + sig_u * Gdw, 0.0)
            dlam_l = jnp.where(act_l, chat_l - sig_l * Gdw, 0.0)
            dsu = jnp.where(s_u, (dlam_u + a_u) / b_u, 0.0)
            dsl = jnp.where(s_l, (dlam_l + a_l) / b_l, 0.0)
            dmu_u = jnp.where(s_u, (tau[None, :] - mu_u * su - mu_u * dsu) / su_s, 0.0)
            dmu_l = jnp.where(s_l, (tau[None, :] - mu_l * sl - mu_l * dsl) / sl_s, 0.0)
            dpu = jnp.where(act_u, dsu - Gdw - r_pu, 0.0)
            dpl = jnp.where(act_l, dsl + Gdw - r_pl, 0.0)

            inf = jnp.float32(jnp.inf)
            def ms(x, dx, m):
                ratio = jnp.where(m & (dx < 0), -x / jnp.where(dx < 0, dx, -1.0), inf)
                return jnp.min(ratio, axis=0)
            step = jnp.minimum(
                jnp.minimum(
                    jnp.minimum(ms(lam_u, dlam_u, act_u), ms(lam_l, dlam_l, act_l)),
                    jnp.minimum(ms(mu_u, dmu_u, s_u), ms(mu_l, dmu_l, s_l)),
                ),
                jnp.minimum(
                    jnp.minimum(ms(pu, dpu, act_u), ms(pl, dpl, act_l)),
                    jnp.minimum(ms(su, dsu, s_u), ms(sl, dsl, s_l)),
                ),
            )
            alpha = jnp.minimum(1.0, gamma_ftb * step)  # (128,)
            return (dw, Gdw, dsu, dsl, dpu, dpl, dlam_u, dlam_l, dmu_u, dmu_l), alpha

        zero_tau = jnp.zeros((LANES,), dtype=w.dtype)
        d_aff, alpha_aff = directions(zero_tau)
        _, _, dsu_a, dsl_a, dpu_a, dpl_a, dlu_a, dll_a, dmu_a, dml_a = d_aff
        aa = alpha_aff[None, :]
        gap_aff = total_gap(
            lam_u + aa * dlu_a, pu + aa * dpu_a,
            lam_l + aa * dll_a, pl + aa * dpl_a,
            mu_u + aa * dmu_a, su + aa * dsu_a,
            mu_l + aa * dml_a, sl + aa * dsl_a,
        )
        sig_c = jnp.clip((gap_aff / jnp.maximum(gap, 1e-30)) ** 3, 1e-4, 0.99)
        tau = sig_c * gap / nt[0]

        (dw, Gdw, dsu, dsl, dpu, dpl, dlam_u, dlam_l, dmu_u, dmu_l), alpha = (
            directions(tau)
        )

        unconverged = gap > 1e-11 * nt[0]
        ok = (
            unconverged
            & jnp.all(jnp.isfinite(dw), axis=0)
            & jnp.isfinite(alpha)
        )  # (128,)
        okr = ok[None, :]
        al = alpha[None, :]
        upd = lambda x, dx, m: jnp.where(okr & m, x + al * dx, x)
        wo_ref[0] = jnp.where(okr, w + al * dw, w)
        Gwo_ref[0] = jnp.where(okr, Gw + al * Gdw, Gw)
        su_n = upd(su, dsu, s_u)
        sl_n = upd(sl, dsl, s_l)
        pu_n = upd(pu, dpu, act_u)
        pl_n = upd(pl, dpl, act_l)
        lu_n = upd(lam_u, dlam_u, act_u)
        ll_n = upd(lam_l, dlam_l, act_l)
        mu_n = upd(mu_u, dmu_u, s_u)
        ml_n = upd(mu_l, dmu_l, s_l)
        suo_ref[0] = su_n
        slo_ref[0] = sl_n
        puo_ref[0] = pu_n
        plo_ref[0] = pl_n
        luo_ref[0] = lu_n
        llo_ref[0] = ll_n
        muo_ref[0] = mu_n
        mlo_ref[0] = ml_n
        sino_ref[0] = sigma_of(su_n, sl_n, pu_n, pl_n, lu_n, ll_n, mu_n, ml_n,
                               z1, z2, act_u, act_l, s_u, s_l)
        unc_ref[0] = unconverged[None, :]

    return kernel


def _lanes(a, B):
    """(B, r) -> (B//LANES, r, LANES)."""
    r = a.shape[1]
    return jnp.transpose(a.reshape(B // LANES, LANES, r), (0, 2, 1))


def _unlanes(a, B):
    """(G, r, LANES) -> (B, r)."""
    r = a.shape[1]
    return jnp.transpose(a, (0, 2, 1)).reshape(B, r)


@functools.partial(jax.jit, static_argnames=("gamma_ftb", "interpret"))
def fused_iteration_batched(Lt, Gt, rwt, c0t, lbt, ubt, z1t, z2t, ntt,
                            carry_t, gamma_ftb: float, interpret: bool = False):
    """All operands already in lanes layout:
    Lt (G, npad, npad, LANES); Gt (G, ncg, nz, LANES); rwt (G, nz, LANES)
    the precomputed stationarity residual; vectors (G, r, LANES);
    ntt (G, 1, LANES); carry_t = 10-tuple of lanes vectors. Returns
    (carry_t', sigma_t (G, nc, LANES), unconv (G, 1, LANES))."""
    Gn, npad = Lt.shape[0], Lt.shape[1]
    ncg, nz = Gt.shape[1], Gt.shape[2]
    nc = ncg + nz
    dt = Gt.dtype
    grid = (Gn,)
    bs_mat = lambda r, c: pl.BlockSpec((1, r, c, LANES), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    bs_vec = lambda r: pl.BlockSpec((1, r, LANES), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    carry_specs = [bs_vec(nz), bs_vec(nc)] + [bs_vec(nc)] * 8
    out_shapes = (
        [jax.ShapeDtypeStruct((Gn, nz, LANES), dt),
         jax.ShapeDtypeStruct((Gn, nc, LANES), dt)]
        + [jax.ShapeDtypeStruct((Gn, nc, LANES), dt)] * 8
        + [jax.ShapeDtypeStruct((Gn, nc, LANES), dt),
           jax.ShapeDtypeStruct((Gn, 1, LANES), jnp.bool_)]
    )
    out_specs = carry_specs + [bs_vec(nc), bs_vec(1)]
    outs = pl.pallas_call(
        _make_kernel(nz, ncg, npad, gamma_ftb),
        grid=grid,
        in_specs=[
            bs_mat(npad, npad), bs_mat(ncg, nz),
            bs_vec(nz), bs_vec(nc), bs_vec(nc), bs_vec(nc), bs_vec(nc),
            bs_vec(nc), bs_vec(1),
        ] + carry_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((npad, LANES), dt)],
        interpret=interpret,
    )(Lt, Gt, rwt, c0t, lbt, ubt, z1t, z2t, ntt, *carry_t)
    carry_out = tuple(outs[:10])
    return carry_out, outs[10], outs[11]
