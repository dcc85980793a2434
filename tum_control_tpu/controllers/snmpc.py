"""Stochastic NMPC (SNMPC): PCE-based chance constraints with an
uncertainty propagation horizon (UPH).

TPU-native equivalent of the reference's Stochastic_NMPC stack
(SNMPC_class.py + SNMPC_acados_settings.py + pred_model_dynamic_disc.py),
implementing the method of arXiv:2310.18753. Formulation parity:

  * stacked state of (n_samples+1) x 8 copies; the initial state is fanned
    from the measured state with std-scaled Hammersley normal samples on
    the uncertain components (SNMPC_class.py:95, compute_x0dist),
  * DISCRETE shooting dynamics: one RK4 step per sample over Ts_MPC with a
    per-node stop flag (nodes >= UPH freeze the samples and propagate only
    the nominal copy); below the UPH the *nominal* next state is the PCE
    mean of the propagated samples, A[0,:] @ F(samples)
    (pred_model_dynamic_disc.py:187-220),
  * cost only on the nominal block, with vel_abs = sqrt(vlong^2 + vlat^2)
    (SNMPC_acados_settings.py:62,141-142),
  * chance constraints as deterministic surrogates: per-sample gg values
    h_s combine through the PCE regression matrix into mean + kappa*sigma
    with kappa = sqrt((1-gamma)/gamma); nodes >= UPH use the nominal h
    (ibid.:111-194).

TPU-first design notes: the per-sample dynamics/constraints are vmapped
over a sample axis instead of symbolically unrolled; the RTI engine then
condenses the stacked (88-dim) state exactly like acados' full condensing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.config import MPCConfig
from tum_control_tpu.controllers import pce
from tum_control_tpu.controllers.common import (
    GGTables,
    N_H,
    acc_bounds,
    acc_constraints,
    acc_constraints_jac,
    wrap_2pi,
)
from tum_control_tpu.controllers.nominal import HARD_Z2, ControllerOutput
from tum_control_tpu.models.integrators import rk4_multistep, rk4_multistep_tree
from tum_control_tpu.models.vehicle_stm import pred_ode, pred_ode_tuple
from tum_control_tpu.ops.pallas_kernels.condense import condense_scan_from
from tum_control_tpu.ops.pallas_kernels.fastmath import atan_poly
from tum_control_tpu.ops.pallas_kernels.linearize import make_linearize_rollout
from tum_control_tpu.ops.rti import BIG, OCPFunctions, RTIEngine, RTIState
from tum_control_tpu.params import TireParams, VehicleParams


class StochasticNMPC:
    """Functional SNMPC; `state` is an RTIState over the stacked state."""

    nu = 2

    def __init__(
        self,
        mpc_cfg: MPCConfig,
        N: int,
        dt: float,
        vp: VehicleParams,
        tp: TireParams,
        gg: GGTables,
        structured: bool = True,
    ):
        self.cfg = mpc_cfg
        self.N, self.dt = N, dt
        self.vp, self.tp, self.gg = vp, tp, gg
        shape = mpc_cfg.combined_acc_limits
        nh = N_H[shape]
        self.nh = nh

        self.n_samples = mpc_cfg.n_samples
        self.stds = np.asarray(mpc_cfg.stds)
        n_vars = int(np.count_nonzero(self.stds))
        self.w_samples, A_np = pce.regression_matrix(
            self.n_samples, n_vars, mpc_cfg.expansion_degree
        )
        A = jnp.asarray(A_np)
        A0 = A[0]  # PCE mean weights over samples
        kappa = float(np.sqrt((1.0 - mpc_cfg.gamma) / mpc_cfg.gamma))
        uph = mpc_cfg.uncertainty_propagation_horizon
        # stop flag per node: 1 from UPH onward (SNMPC_class.py:96-98)
        stop = jnp.asarray((np.arange(N + 1) >= uph).astype(np.float64))

        self.nx = 8 * (self.n_samples + 1)
        ns1 = self.n_samples + 1

        def rk4(x8, u):
            return rk4_multistep(lambda xx, uu: pred_ode(xx, uu, vp, tp), x8, u, dt, 1)

        # fused Pallas rollout+sensitivity for the per-copy 8-dim steps
        # (the same kernel the nominal controller uses; the (stage, copy)
        # product is just a bigger element batch)
        step_tuple_kernel = lambda x, u: rk4_multistep_tree(
            lambda a, b: pred_ode_tuple(a, b, vp, tp, atan=atan_poly), x, u, dt, 1
        )
        lin_roll8 = make_linearize_rollout(
            rk4, 8, self.nu, step_tuple_kernel=step_tuple_kernel
        )

        def dyn_step(k, x, u):
            xs = x.reshape(ns1, 8)
            nxt = jax.vmap(lambda s: rk4(s, u))(xs)  # all copies propagated
            frozen = stop[k] == 1.0
            # samples: freeze beyond the UPH
            samples_next = jnp.where(frozen, xs[1:], nxt[1:])
            # nominal: PCE mean of propagated samples below the UPH,
            # plain RK4 of itself beyond it
            mean_next = A0 @ nxt[1:].reshape(self.n_samples, 8)
            nom_next = jnp.where(frozen, nxt[0], mean_next)
            return jnp.concatenate([nom_next[None], samples_next], axis=0).reshape(-1)

        def dyn_jac(k, x, u):
            """Structure-exploiting stacked-state linearization.

            The stacked sensitivity A_k is block sparse: each sample's block
            depends only on itself, and the nominal row mixes the samples'
            blocks through the PCE mean weights (pred_model_dynamic_disc.py:
            212-220). Building it from per-copy 8x(8+2) jacobians is ~9x
            cheaper than differentiating the whole 88-state step.
            """
            xs = x.reshape(ns1, 8)

            def stepj(x8):
                fxu = lambda xu: rk4(xu[:8], xu[8:])
                xu = jnp.concatenate([x8, u])
                return fxu(xu), jax.jacfwd(fxu)(xu)

            F_all, J_all = jax.vmap(stepj)(xs)        # (ns1,8), (ns1,8,10)
            A_blk, B_blk = J_all[:, :, :8], J_all[:, :, 8:]
            frozen = stop[k] == 1.0
            eye8 = jnp.eye(8, dtype=x.dtype)

            # next states (same semantics as dyn_step)
            mean_next = A0 @ F_all[1:].reshape(self.n_samples, 8)
            nom_next = jnp.where(frozen, F_all[0], mean_next)
            samples_next = jnp.where(frozen, xs[1:], F_all[1:])
            F = jnp.concatenate([nom_next[None], samples_next]).reshape(-1)

            # block-diagonal part
            A_eff = jnp.concatenate(
                [
                    jnp.where(frozen, A_blk[0], jnp.zeros_like(eye8))[None],
                    jnp.where(frozen, eye8[None], A_blk[1:]),
                ]
            )                                          # (ns1, 8, 8)
            diag_sel = jnp.eye(ns1, dtype=x.dtype)[:, None, :, None]
            A4 = diag_sel * A_eff[:, :, None, :]       # (ns1, 8, ns1, 8)
            # nominal row couples to the samples below the UPH
            coupling = jnp.where(
                frozen, 0.0, A0[:, None, None] * A_blk[1:]
            )                                          # (ns, 8, 8)
            A4 = A4.at[0, :, 1:, :].set(jnp.transpose(coupling, (1, 0, 2)))
            A = A4.reshape(self.nx, self.nx)

            B_nom = jnp.where(
                frozen, B_blk[0], jnp.einsum("s,sij->ij", A0, B_blk[1:])
            )
            B_smp = jnp.where(frozen, jnp.zeros_like(B_blk[1:]), B_blk[1:])
            B = jnp.concatenate([B_nom[None], B_smp]).reshape(self.nx, self.nu)
            return F, A, B

        def lin_structured(X, U, d0):
            """Structure-exploiting fused linearize+condense.

            The stacked transition matrix is block sparse (see dyn_jac), and
            beyond the UPH the samples freeze entirely — so instead of the
            dense (88,88)@(88,nz) stage recurrence this runs:

              phase 1 (stages < UPH): per-copy (8,8)@(8,nz) propagation with
                the nominal row recombined as the PCE mean of the sample
                blocks (Gamma^0_{k+1} = sum_j m_j Gamma^j_{k+1}) — 11x fewer
                FLOPs than the dense recurrence;
              phase 2 (stages >= UPH): only the nominal 8-dim block evolves,
                via the standard condense recurrence (the Pallas lanes
                kernel's init-carry variant on TPU); sample Gammas stay
                constant and sample e's accumulate the trajectory defects.

            Returns STRUCTURED pieces — the dense stacked Gamma is never
            materialized (at batch 256 it is ~267 MB of HBM traffic per
            step; measured 4.4 ms of the 8.7 ms build_qp, r3 dissect):

              e_full   (N+1, ns1, 8)   trajectory defects, all copies
              Gam_nom  (N+1, 8, nz)    nominal-block sensitivities
              G_head   (uph_eff+1, ns1, 8, nz)  all copies, stages <= UPH
              G_frozen (ns, 8, nz)     constant sample block, stages >= UPH
            """
            nz = N * self.nu
            ns = self.n_samples
            uph_eff = max(0, min(uph, N))
            ue = uph_eff
            Xs = X[:-1].reshape(N, ns1, 8)
            Xn = X[1:].reshape(N, ns1, 8)

            # Rollout+sensitivity only where sensitivities are consumed:
            # stages < UPH propagate all copies, frozen stages evolve just
            # the nominal copy (samples are identity maps) — ue*ns1 + (N-ue)
            # kernel elements instead of N*ns1 (88 vs 418 at the shipped
            # uph=5, n_samples=10, N=38; VERDICT r3 #1b).
            XU_head = jnp.concatenate(
                [Xs[:ue], jnp.broadcast_to(U[:ue, None, :], (ue, ns1, self.nu))],
                axis=-1,
            ).reshape(ue * ns1, 8 + self.nu)
            XU_tail = jnp.concatenate([Xs[ue:, 0], U[ue:]], axis=-1)  # (N-ue, 10)
            F_flat, J_flat = lin_roll8(
                jnp.concatenate([XU_head, XU_tail], axis=0)
            )                                            # Pallas kernel on TPU
            F_head = F_flat[: ue * ns1].reshape(ue, ns1, 8)
            J_head = J_flat[: ue * ns1].reshape(ue, ns1, 8, 8 + self.nu)
            A_blk, B_blk = J_head[..., :8], J_head[..., 8:]
            F_tailn = F_flat[ue * ns1 :]                 # (N-ue, 8) nominal
            J_tailn = J_flat[ue * ns1 :]
            A_tailn, B_tailn = J_tailn[..., :8], J_tailn[..., 8:]

            # head defects: nominal next = PCE mean of propagated samples
            mean_next = jnp.einsum("s,ksi->ki", A0, F_head[:, 1:])
            xi = jnp.concatenate(
                [(mean_next - Xn[:ue, 0])[:, None], F_head[:, 1:] - Xn[:ue, 1:]],
                axis=1,
            )                                            # (ue, ns1, 8)
            # tail defects: nominal plain RK4; samples frozen (identity)
            xi_tailn = F_tailn - Xn[ue:, 0]              # (N-ue, 8)
            xi_tails = Xs[ue:, 1:] - Xn[ue:, 1:]         # (N-ue, ns, 8)

            d0b = d0.reshape(ns1, 8)
            G0 = jnp.zeros((ns1, 8, nz), dtype=X.dtype)
            E = jnp.eye(nz, dtype=X.dtype).reshape(N, self.nu, nz)

            def body(carry, inp):
                e, G = carry                             # (ns1,8), (ns1,8,nz)
                A_k, B_k, xi_k, E_k = inp
                Pe = jnp.einsum("sij,sj->si", A_k, e)
                PG = jnp.einsum("sij,sjz->siz", A_k, G) + jnp.einsum(
                    "siu,uz->siz", B_k, E_k
                )
                e_n = jnp.concatenate(
                    [(jnp.einsum("s,si->i", A0, Pe[1:]) + xi_k[0])[None],
                     Pe[1:] + xi_k[1:]]
                )
                G_n = jnp.concatenate(
                    [jnp.einsum("s,siz->iz", A0, PG[1:])[None], PG[1:]]
                )
                return (e_n, G_n), (e_n, G_n)

            if uph_eff > 0:
                (e_c, G_c), (e_tail, G_tail) = jax.lax.scan(
                    body, (d0b, G0), (A_blk, B_blk, xi, E[:uph_eff])
                )
                e_head = jnp.concatenate([d0b[None], e_tail])   # (uph_eff+1,ns1,8)
                G_head = jnp.concatenate([G0[None], G_tail])
            else:
                e_c, G_c = d0b, G0
                e_head, G_head = d0b[None], G0[None]

            N2 = N - uph_eff
            if N2 > 0:
                e_nom2, G_nom2 = condense_scan_from(
                    A_tailn, B_tailn, xi_tailn,
                    e_c[0], G_c[0], uph_eff * self.nu,
                )                                        # (N2+1,8), (N2+1,8,nz)
                e_smp2 = e_c[1:][None] + jnp.concatenate(
                    [jnp.zeros((1, ns, 8), X.dtype),
                     jnp.cumsum(xi_tails, axis=0)],
                    axis=0,
                )                                        # (N2+1, ns, 8)
                e_tail2 = jnp.concatenate([e_nom2[:, None], e_smp2], axis=1)
                e_full = jnp.concatenate([e_head[:-1], e_tail2], axis=0)
                Gam_nom = jnp.concatenate([G_head[:-1, 0], G_nom2], axis=0)
            else:
                e_full = e_head
                Gam_nom = G_head[:, 0]

            return e_full, Gam_nom, G_head, G_c[1:]

        self._lin_structured = lin_structured
        self._uph_eff = max(0, min(uph, N))

        def lin_condense(X, U, d0):
            """Dense (N+1, nx, nz) condensing — assembled from the structured
            pieces; kept for the structured-equals-dense CI anchor and any
            generic-engine use."""
            nz = N * self.nu
            ns = self.n_samples
            e_full, Gam_nom, G_head, G_frozen = lin_structured(X, U, d0)
            H = G_head.shape[0]
            G_smp = jnp.concatenate(
                [
                    G_head[:, 1:],
                    jnp.broadcast_to(G_frozen[None], (N + 1 - H, ns, 8, nz)),
                ],
                axis=0,
            )
            G_full = jnp.concatenate([Gam_nom[:, None], G_smp], axis=1)
            return e_full.reshape(N + 1, self.nx), G_full.reshape(
                N + 1, self.nx, nz
            )

        def build_qp_structured(X, U, x0, yref, yref_e, merged):
            """Full QP assembly from the structured sensitivities — the dense
            stacked Gamma is never formed, and every consumer contracts only
            the blocks it actually depends on:

              * cost rows touch the nominal copy only -> built directly as
                rows of Gam_nom (the vel_abs row is the 2-term combination
                c3*row3 + c4*row4), no (ny,88)@(88,nz) matmuls;
              * chance-constraint rows depend on the samples only below the
                UPH (5 nodes) and on the nominal block alone at the frozen
                nodes (34 nodes) -> static node-range split;
              * the input-box rows stay analytic identity rows (n_id).

            r3 dissect motivation: the dense path spent 8.7 ms/step at batch
            256 materializing + re-reading the (N+1, 88, nz) Gamma.
            """
            (W, We, con_lb, con_ub, con_z1, con_z2,
             u_lb, u_ub, u_z1, u_z2) = merged
            nz = N * self.nu
            ns = self.n_samples
            d0 = x0 - X[0]
            e_full, Gam_nom, G_head, G_frozen = lin_structured(X, U, d0)
            H = G_head.shape[0]                      # uph_eff + 1
            c_split = min(uph, N + 1)                # first frozen node
            xs = X.reshape(N + 1, ns1, 8)
            e_nom = e_full[:, 0]                     # (N+1, 8)

            # --- cost rows (nominal copy only) ---
            xn = xs[:-1, 0]                          # (N, 8)
            v_abs = jnp.sqrt(xn[:, 3] ** 2 + xn[:, 4] ** 2 + 1e-30)
            c3, c4 = xn[:, 3] / v_abs, xn[:, 4] / v_abs
            r_x = jnp.stack(
                [
                    xn[:, 0] - yref[:, 0] + e_nom[:N, 0],
                    xn[:, 1] - yref[:, 1] + e_nom[:N, 1],
                    wrap_2pi(xn[:, 2]) - yref[:, 2] + e_nom[:N, 2],
                    v_abs - yref[:, 3] + c3 * e_nom[:N, 3] + c4 * e_nom[:N, 4],
                ],
                axis=1,
            )                                        # (N, 4)
            r_u = U - yref[:, 4:]
            Mf = jnp.concatenate(
                [
                    Gam_nom[:N, 0:3, :],
                    (c3[:, None] * Gam_nom[:N, 3, :] + c4[:, None] * Gam_nom[:N, 4, :])[:, None, :],
                ],
                axis=1,
            )                                        # (N, 4, nz)
            xT = xs[N, 0]
            vT = jnp.sqrt(xT[3] ** 2 + xT[4] ** 2 + 1e-30)
            cT3, cT4 = xT[3] / vT, xT[4] / vT
            re0 = jnp.stack(
                [
                    xT[0] - yref_e[0] + e_nom[N, 0],
                    xT[1] - yref_e[1] + e_nom[N, 1],
                    wrap_2pi(xT[2]) - yref_e[2] + e_nom[N, 2],
                    vT - yref_e[3] + cT3 * e_nom[N, 3] + cT4 * e_nom[N, 4],
                ]
            )
            Me = jnp.concatenate(
                [
                    Gam_nom[N, 0:3, :],
                    (cT3 * Gam_nom[N, 3, :] + cT4 * Gam_nom[N, 4, :])[None, :],
                ],
                axis=0,
            )                                        # (4, nz)
            Wx, Wu = W[:4], W[4:]
            Mf2 = Mf.reshape(N * 4, nz)
            wtsx = jnp.tile(Wx, N)
            H0 = (
                (Mf2 * wtsx[:, None]).T @ Mf2
                + (Me * We[:, None]).T @ Me
                + jnp.diag(jnp.tile(Wu, N))
            )
            g0 = (
                Mf2.T @ (wtsx * r_x.reshape(-1))
                + (Wu[None, :] * r_u).reshape(-1)
                + Me.T @ (We * re0)
            )

            # --- constraint rows ---
            # Analytic h+Jacobian (acc_constraints_jac), evaluated only on
            # the (node, copy) pairs the rows depend on: all copies below
            # the UPH, the nominal copy alone at frozen nodes — 89 instead
            # of 429 evaluations, and no 8-tangent jacfwd per copy
            # (VERDICT r3 #1a).
            if c_split > 0:
                h_head_all, dh_head_all = jax.vmap(jax.vmap(h_jac))(
                    xs[:c_split]
                )                                    # (c,ns1,nh), (c,ns1,nh,8)
                coeff = jnp.einsum("ls,ksi->kli", A, h_head_all[:, 1:])
                mean = coeff[:, 0]
                var = jnp.sum(coeff[:, 1:] ** 2, axis=1)
                sd = jnp.sqrt(var + 1e-30)
                h_cc = mean + sd * kappa             # (c, nh)
                wj = A[0][None, :, None] + kappa * jnp.einsum(
                    "kli,ls->ksi", coeff[:, 1:], A[1:]
                ) / sd[:, None, :]                    # (c, ns, nh)
                # (c, ns, nh, 8): per-sample weight times the copy's h-Jacobian
                Js = wj[:, :, :, None] * dh_head_all[:, 1:]
                G_h_head = jnp.einsum(
                    "ksir,ksrz->kiz", Js, G_head[:c_split, 1:]
                )
                c_h_head = h_cc + jnp.einsum(
                    "ksir,ksr->ki", Js, e_full[:c_split, 1:]
                )
            if c_split <= N:
                h_froz, dh_nom = jax.vmap(h_jac)(xs[c_split:, 0])
                G_h_froz = jnp.einsum(
                    "kir,krz->kiz", dh_nom, Gam_nom[c_split:]
                )
                c_h_froz = h_froz + jnp.einsum(
                    "kir,kr->ki", dh_nom, e_nom[c_split:]
                )
            if c_split == 0:
                G_h, c_h = G_h_froz, c_h_froz
            elif c_split > N:
                G_h, c_h = G_h_head, c_h_head
            else:
                G_h = jnp.concatenate([G_h_head, G_h_froz], axis=0)
                c_h = jnp.concatenate([c_h_head, c_h_froz], axis=0)

            G_delta = Gam_nom[:, 6, :][:, None, :]    # (N+1, 1, nz)
            c_delta = (xs[:, 0, 6] + e_nom[:, 6])[:, None]
            G_c = jnp.concatenate([G_h, G_delta], axis=1)   # (N+1, nc, nz)
            c0_c = jnp.concatenate([c_h, c_delta], axis=1)

            from tum_control_tpu.ops.soft_qp import CondensedQP

            G = G_c.reshape(-1, nz)
            c0 = jnp.concatenate([c0_c.reshape(-1), U.reshape(-1)], axis=0)
            lb = jnp.concatenate([con_lb.reshape(-1), u_lb.reshape(-1)])
            ub = jnp.concatenate([con_ub.reshape(-1), u_ub.reshape(-1)])
            z1 = jnp.concatenate([con_z1.reshape(-1), u_z1.reshape(-1)])
            z2 = jnp.concatenate([con_z2.reshape(-1), u_z2.reshape(-1)])
            qp = CondensedQP(H0=H0, g0=g0, G=G, c0=c0, lb=lb, ub=ub, z1=z1, z2=z2)
            aux = (e_full, Gam_nom, G_head, G_frozen)
            return qp, aux

        def expand_dx(aux, w):
            """dX = e + Gamma @ w from the structured pieces (the sample
            blocks beyond the UPH share one constant sensitivity)."""
            e_full, Gam_nom, G_head, G_frozen = aux
            H = G_head.shape[0]
            dx_nom = e_full[:, 0] + jnp.einsum("krz,z->kr", Gam_nom, w)
            dx_head = e_full[:H, 1:] + jnp.einsum("ksrz,z->ksr", G_head[:, 1:], w)
            dx_fr_blk = jnp.einsum("srz,z->sr", G_frozen, w)
            dx_froz = e_full[H:, 1:] + dx_fr_blk[None]
            dx_smp = jnp.concatenate([dx_head, dx_froz], axis=0)
            return jnp.concatenate([dx_nom[:, None], dx_smp], axis=1).reshape(
                N + 1, self.nx
            )

        def y_stage(k, x, u):
            vel_abs = jnp.sqrt(x[3] ** 2 + x[4] ** 2)
            return jnp.concatenate(
                [jnp.stack([x[0], x[1], wrap_2pi(x[2]), vel_abs]), u]
            )

        def y_term(x):
            vel_abs = jnp.sqrt(x[3] ** 2 + x[4] ** 2)
            return jnp.stack([x[0], x[1], wrap_2pi(x[2]), vel_abs])

        def h_of(x8):
            vel_abs = jnp.sqrt(x8[3] ** 2 + x8[4] ** 2)
            return acc_constraints(vel_abs, x8[7], x8[3] * x8[5], gg, vp.acc_min, shape)

        def h_jac(x8):
            """Analytic (h, dh/dx8) — exact match of jacfwd(h_of) (tested in
            test_controllers), O(1) instead of 8 pushed tangents per copy."""
            return acc_constraints_jac(x8, gg, vp.acc_min, shape)

        def con_stage(k, x):
            xs = x.reshape(ns1, 8)
            h_all = jax.vmap(h_of)(xs)          # (ns1, nh)
            h_nom = h_all[0]
            coeff = A @ h_all[1:]               # (L, nh)
            mean = coeff[0]
            var = jnp.sum(coeff[1:] ** 2, axis=0)
            h_cc = mean + jnp.sqrt(var + 1e-30) * kappa
            h = jnp.where(stop[k] == 1.0, h_nom, h_cc)
            # delta_f bound acts on the nominal copy
            return jnp.concatenate([h, xs[0, 6:7]])

        def con_jac(k, x):
            """Analytic constraint Jacobian over the stacked state.

            h_cc depends on the per-copy h values only through the PCE
            coefficients, so d h_cc / d x_j factorizes into a per-sample
            scalar weight times the copy's own (nh, 8) h-Jacobian:

              w_{j} = A[0,j] + kappa * sum_{l>=1} coeff[l] A[l,j] / sigma

            — O(samples) 8-dim jacfwds instead of one 88-dim jacfwd
            (the generic path pushes 88 tangents through all 11 copies).
            """
            xs = x.reshape(ns1, 8)
            h_all, dh_all = jax.vmap(h_jac)(xs)       # (ns1,nh), (ns1,nh,8)
            h_nom = h_all[0]
            coeff = A @ h_all[1:]                     # (L, nh)
            mean = coeff[0]
            var = jnp.sum(coeff[1:] ** 2, axis=0)
            sd = jnp.sqrt(var + 1e-30)
            h_cc = mean + sd * kappa
            frozen = stop[k] == 1.0
            C_h = jnp.where(frozen, h_nom, h_cc)

            # per-sample weights (ns, nh)
            wj = A[0][:, None] + kappa * jnp.einsum(
                "lr,lj->jr", coeff[1:], A[1:]
            ) / sd[None, :]
            J_cc = jnp.concatenate(
                [jnp.zeros((1, nh, 8), x.dtype), wj[:, :, None] * dh_all[1:]]
            )                                          # (ns1, nh, 8)
            J_nom = jnp.concatenate(
                [dh_all[:1], jnp.zeros((ns1 - 1, nh, 8), x.dtype)]
            )
            J_h = jnp.where(frozen, J_nom, J_cc)       # (ns1, nh, 8)
            J_h = jnp.transpose(J_h, (1, 0, 2)).reshape(nh, self.nx)
            J_df = jnp.zeros((1, self.nx), x.dtype).at[0, 6].set(1.0)
            return (
                jnp.concatenate([C_h, xs[0, 6:7]]),
                jnp.concatenate([J_h, J_df], axis=0),
            )

        def y_jac(k, x, u):
            """Analytic stage-output Jacobian: y depends only on the nominal
            copy's [posx, posy, yaw, vlong, vlat] and on u."""
            vel_abs = jnp.sqrt(x[3] ** 2 + x[4] ** 2 + 1e-30)
            Y = jnp.concatenate(
                [jnp.stack([x[0], x[1], wrap_2pi(x[2]), vel_abs]), u]
            )
            ny = 4 + self.nu
            Jx = jnp.zeros((ny, self.nx), x.dtype)
            Jx = Jx.at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
            Jx = Jx.at[3, 3].set(x[3] / vel_abs).at[3, 4].set(x[4] / vel_abs)
            Ju = jnp.zeros((ny, self.nu), x.dtype)
            Ju = Ju.at[4, 0].set(1.0).at[5, 1].set(1.0)
            return Y, Jx, Ju

        W = 0.01 * np.concatenate([np.diag(mpc_cfg.Q()), np.diag(mpc_cfg.R())])
        We = 0.01 * np.diag(mpc_cfg.Q())

        lh, uh = acc_bounds(shape)
        L1, L2 = mpc_cfg.L1_pen, mpc_cfg.L2_pen
        con_lb = np.tile(np.concatenate([lh, [vp.delta_f_min]]), (N + 1, 1))
        con_ub = np.tile(np.concatenate([uh, [vp.delta_f_max]]), (N + 1, 1))
        con_lb[0, nh] = -BIG
        con_ub[0, nh] = BIG
        con_z1 = np.full_like(con_lb, L1)
        con_z2 = np.full_like(con_lb, L2)
        u_lb = np.tile([-BIG, vp.delta_f_dot_min], (N, 1))
        u_ub = np.tile([BIG, vp.delta_f_dot_max], (N, 1))
        u_z1 = np.full_like(u_lb, L1)
        u_z2 = np.full_like(u_lb, L2)
        u_z1[0, :] = 0.0
        u_z2[0, :] = HARD_Z2

        self.engine = RTIEngine(
            funcs=OCPFunctions(
                dyn_step, y_stage, y_term, con_stage, dyn_jac=dyn_jac,
                lin_condense=lin_condense if structured else None,
                con_jac=con_jac if structured else None,
                y_jac=y_jac if structured else None,
                build_qp=build_qp_structured if structured else None,
                expand_dx=expand_dx if structured else None,
            ),
            N=N,
            nx=self.nx,
            nu=self.nu,
            W=jnp.asarray(W),
            We=jnp.asarray(We),
            con_lb=jnp.asarray(con_lb),
            con_ub=jnp.asarray(con_ub),
            con_z1=jnp.asarray(con_z1),
            con_z2=jnp.asarray(con_z2),
            u_lb=jnp.asarray(u_lb),
            u_ub=jnp.asarray(u_ub),
            u_z1=jnp.asarray(u_z1),
            u_z2=jnp.asarray(u_z2),
            newton_iters=mpc_cfg.qp_iters,
            sqp_iters=mpc_cfg.sqp_iters,
        )

    # ------------------------------------------------------------------
    def _fan(self, x0):
        return pce.fan_initial_state(x0, self.w_samples, self.stds).reshape(-1)

    def init_state(self, x0) -> RTIState:
        return self.engine.init_state(self._fan(jnp.asarray(x0)))

    def make_yref(self, ref_window):
        N = self.N
        stage = jnp.concatenate(
            [
                ref_window.pos[:N],
                ref_window.yaw[:N, None],
                ref_window.v[:N, None],
                jnp.zeros((N, self.nu), dtype=ref_window.pos.dtype),
            ],
            axis=1,
        )
        term = jnp.concatenate(
            [ref_window.pos[N], jnp.stack([ref_window.yaw[N], ref_window.v[N]])]
        )
        return stage, term

    def solve(self, state: RTIState, x0, ref_window, mods=None):
        yref, yref_e = self.make_yref(ref_window)
        u0, new_state, st = self.engine.solve(state, self._fan(x0), yref, yref_e, mods)
        u0 = jnp.stack(
            [u0[0], jnp.clip(u0[1], self.vp.delta_f_dot_min, self.vp.delta_f_dot_max)]
        )
        stats = jnp.stack(
            [
                st.cost,
                jnp.zeros_like(st.cost),
                st.sqp_iter.astype(st.cost.dtype),
                st.qp_iter.astype(st.cost.dtype),
                st.status.astype(st.cost.dtype),
            ]
        )
        # nominal block only, matching SNMPC_class.solve (get(j,"x")[0:8])
        pred_X = new_state.X[:, :8]
        return ControllerOutput(u0=u0, pred_X=pred_X, stats=stats), new_state
