"""Reduced Robustified NMPC (R2NMPC): ellipsoidal uncertainty sets with
zero-order constraint tightening.

TPU-native equivalent of the reference's Reduced_Robustified_NMPC stack
(Reduced_Robustified_NMPC_class.py + Reduced_Robustified_NMPC_acados_settings.py),
a reduced variant of Zanelli-style zoRO. The OCP is the *nominal* NMPC
formulation; robustness enters as per-stage back-offs on the steering bound
and the acceleration constraints, computed *outside* the QP from the
propagated state covariance:

    Sigma_{k+1} = A_k Sigma_k A_k' + B W_disc B'         (P_propagation)
    backoff_h   = sqrt(grad_h' Sigma_k grad_h)
    backoff_df  = sqrt(Sigma_k[6,6])

with A_k the QP sensitivities of the last solve, gradients evaluated at the
new solution, stages >= UPH reusing the last computed correction, and the
tightened bounds taking effect at the *next* solve
(Reduced_Robustified_NMPC_class.py:287-365 — a one-step-delayed feedback we
reproduce exactly by carrying the corrections in the controller's extra
state). Corrections only refresh on a successful solve (ibid.:276).

TPU-first: the whole stage loop (8x8 covariance scan + `jax.grad` back-offs)
is in-graph; no cross-solve python.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.config import MPCConfig
from tum_control_tpu.controllers.common import GGTables, acc_constraints
from tum_control_tpu.controllers.nominal import ControllerOutput, NominalNMPC
from tum_control_tpu.params import TireParams, VehicleParams


class RobustExtra(NamedTuple):
    corr_steer: jnp.ndarray  # (N+1,) steering-bound back-off per node
    corr_acc: jnp.ndarray    # (N+1, nh) acceleration-constraint back-off


class ReducedRobustNMPC(NominalNMPC):
    """Nominal NMPC + carried constraint-tightening state."""

    def __init__(
        self,
        mpc_cfg: MPCConfig,
        N: int,
        dt: float,
        vp: VehicleParams,
        tp: TireParams,
        gg: GGTables,
    ):
        super().__init__(mpc_cfg, N, dt, vp, tp, gg)
        stds = np.asarray(mpc_cfg.stds)
        # disturbance ellipsoid on [yaw, vlong, vlat, yawrate]
        W_dist = np.diag(stds[2:6]) ** 2
        self.W_disc = jnp.asarray(dt * W_dist)
        # initial covariance (coeff_Sigma = 0.5, tiny floor elsewhere)
        sig0 = 0.5 * np.diag(
            [1e-5, 1e-5, stds[2], stds[3], stds[4], stds[5], 1e-5, 1e-5]
        )
        self.Sigma0 = jnp.asarray(sig0**2)
        Bsel = np.zeros((8, 4))
        Bsel[2, 0] = Bsel[3, 1] = Bsel[4, 2] = Bsel[5, 3] = 1.0
        self.Bsel = jnp.asarray(Bsel)
        self.uph = mpc_cfg.uncertainty_propagation_horizon
        shape = mpc_cfg.combined_acc_limits

        def h_fn(x):
            return acc_constraints(x[3], x[7], x[3] * x[5], gg, vp.acc_min, shape)

        self._h_jac = jax.jacfwd(h_fn)

    # ------------------------------------------------------------------
    def init_extra(self) -> RobustExtra:
        return RobustExtra(
            corr_steer=jnp.zeros(self.N + 1),
            corr_acc=jnp.zeros((self.N + 1, self.nh)),
        )

    def _mods_from_extra(self, extra: RobustExtra, mods=None):
        """Bound-tightening QPMods; merges with caller-supplied `mods`
        (e.g. WMPC weight overrides — the fields are disjoint, as in the
        reference where the WMPC block rewrites cost weights while the
        robust block rewrites lbx/ubx/uh,
        Reduced_Robustified_NMPC_class.py:205-246 vs :335-365)."""
        from tum_control_tpu.ops.rti import QPMods

        con_lb = self.engine.con_lb
        con_ub = self.engine.con_ub
        nh = self.nh
        # steering (delta_f) bound rows tightened at nodes 1..N-1; the
        # reference never touches the terminal node's lbx_e/ubx_e or the
        # h-bounds at nodes 0 and N (constraints_set loop range(1..N))
        mask = jnp.zeros(self.N + 1).at[1 : self.N].set(1.0)
        con_lb = con_lb.at[:, nh].add(mask * extra.corr_steer)
        con_ub = con_ub.at[:, nh].add(-mask * extra.corr_steer)
        con_ub = con_ub.at[:, :nh].add(-mask[:, None] * extra.corr_acc)
        if mods is None:
            mods = QPMods()
        return mods._replace(con_lb=con_lb, con_ub=con_ub)

    def _propagate(self, A_lin, X_new, extra: RobustExtra) -> RobustExtra:
        """Covariance scan over stages 0..UPH-1 -> new corrections."""
        uph, N, nh = self.uph, self.N, self.nh
        BWB = self.Bsel @ self.W_disc @ self.Bsel.T

        def body(Sigma, k):
            # corrections at stage k (>0) use Sigma_k
            grad_h = self._h_jac(X_new[k])           # (nh, 8)
            c_acc = jnp.sqrt(
                jnp.maximum(jnp.einsum("ij,jk,ik->i", grad_h, Sigma, grad_h), 0.0)
            )
            c_steer = jnp.sqrt(jnp.maximum(Sigma[6, 6], 0.0))
            Sigma_next = A_lin[k] @ Sigma @ A_lin[k].T + BWB
            return Sigma_next, (c_steer, c_acc)

        _, (cs, ca) = jax.lax.scan(body, self.Sigma0, jnp.arange(uph))
        # stage 0 computes nothing in the reference (loop body guards k>0)
        corr_steer = jnp.zeros(N + 1).at[1:uph].set(cs[1:])
        corr_acc = jnp.zeros((N + 1, nh)).at[1:uph].set(ca[1:])
        # stages >= UPH reuse the last correction
        corr_steer = corr_steer.at[uph:].set(cs[uph - 1])
        corr_acc = corr_acc.at[uph:].set(ca[uph - 1])
        return RobustExtra(corr_steer=corr_steer, corr_acc=corr_acc)

    # ------------------------------------------------------------------
    def solve_with_extra(self, state, extra: RobustExtra, x0, ref_window, mods=None):
        yref, yref_e = self.make_yref(ref_window)
        mods = self._mods_from_extra(extra, mods)
        u0, new_state, st, A_lin = self.engine.solve_full(state, x0, yref, yref_e, mods)
        u0 = jnp.stack(
            [u0[0], jnp.clip(u0[1], self.vp.delta_f_dot_min, self.vp.delta_f_dot_max)]
        )
        new_extra = self._propagate(A_lin, new_state.X, extra)
        # corrections refresh only on success (reference: inside `if status==0`)
        ok = st.status == 0
        new_extra = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_extra, extra
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
        return ControllerOutput(u0=u0, pred_X=new_state.X, stats=stats), new_state, new_extra
