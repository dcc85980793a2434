"""Nominal NMPC controller (TPU-native equivalent of the reference's
Nominal_NMPC stack: NMPC_class.py + NMPC_STM_acados_settings.py).

Problem formulation parity:
  * 8-state single-track prediction model, ERK 4-stage x 3-step shooting over
    Ts_MPC (NMPC_STM_acados_settings.py:238-240),
  * NONLINEAR_LS cost on y = [posx, posy, yaw in [0,2pi), vlong, jerk,
    steering_rate] with W = 0.01*blkdiag(Q, R), We = 0.01*Q (ibid.:48-56),
  * velocity-varying combined-acceleration constraint (shape 0/1/2) + soft
    delta_f state bound + steering-rate input bound with L1/L2 slack
    penalties in the reference's node-dependent layout: node 0 has only the
    h-slacks (input bound hard there), path nodes soft-bound everything,
    terminal node softens delta_f + h_e (ibid.:126-224).

The controller is a thin, functional wrapper around `RTIEngine`; its state
(the warm-start trajectory) is an explicit pytree so closed loops scan over
it and scenario batches vmap over it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tum_control_tpu.config import MPCConfig
from tum_control_tpu.controllers.common import (
    GGTables,
    N_H,
    acc_bounds,
    acc_constraints,
    wrap_2pi,
)
from tum_control_tpu.models.integrators import rk4_multistep, rk4_multistep_tree
from tum_control_tpu.models.vehicle_stm import pred_ode, pred_ode_tuple
from tum_control_tpu.ops.pallas_kernels.fastmath import atan_poly
from tum_control_tpu.ops.pallas_kernels.linearize import make_linearize_rollout
from tum_control_tpu.ops.rti import BIG, OCPFunctions, RTIEngine, RTIState
from tum_control_tpu.params import TireParams, VehicleParams

HARD_Z2 = 1e7  # quadratic penalty standing in for a hard constraint row

N_SHOOTING_SUBSTEPS = 3  # acados sim_method_num_steps


class ControllerOutput(NamedTuple):
    u0: jnp.ndarray      # (2,) [jerk, steering_rate]
    pred_X: jnp.ndarray  # (N+1, 8) predicted state trajectory
    stats: jnp.ndarray   # (5,) [cost, time_tot(0 in-graph), sqp_iter, qp_iter, status]


class NominalNMPC:
    """Functional nominal NMPC. `state` is an RTIState pytree."""

    nx = 8
    nu = 2

    def __init__(
        self,
        mpc_cfg: MPCConfig,
        N: int,
        dt: float,
        vp: VehicleParams,
        tp: TireParams,
        gg: GGTables,
    ):
        self.cfg = mpc_cfg
        self.N, self.dt = N, dt
        self.vp, self.tp, self.gg = vp, tp, gg
        shape = mpc_cfg.combined_acc_limits
        nh = N_H[shape]
        self.nh = nh

        def dyn_step(k, x, u):
            return rk4_multistep(
                lambda xx, uu: pred_ode(xx, uu, vp, tp), x, u, dt, N_SHOOTING_SUBSTEPS
            )

        # fused Pallas rollout+sensitivity path (jacfwd fallback off-TPU)
        step_tuple_kernel = lambda x, u: rk4_multistep_tree(
            lambda a, b: pred_ode_tuple(a, b, vp, tp, atan=atan_poly),
            x, u, dt, N_SHOOTING_SUBSTEPS,
        )
        lin_rollout = make_linearize_rollout(
            lambda x, u: dyn_step(0, x, u), self.nx, self.nu,
            step_tuple_kernel=step_tuple_kernel,
        )

        def y_stage(k, x, u):
            return jnp.concatenate(
                [jnp.stack([x[0], x[1], wrap_2pi(x[2]), x[3]]), u]
            )

        def y_term(x):
            return jnp.stack([x[0], x[1], wrap_2pi(x[2]), x[3]])

        # EXTERNAL cost variant (NMPC_STM_acados_settings_dev_lonlat.py:71-96):
        # residual on ego-frame lon/lat deviations instead of raw x/y, with
        # Levenberg-Marquardt damping (ibid.:262-278, lm = 0.1)
        def resid_lonlat(k, x, u, yr):
            yaw = wrap_2pi(x[2])
            c, s = jnp.cos(-yaw), jnp.sin(-yaw)
            dx, dy = yr[0] - x[0], yr[1] - x[1]
            dev_long = c * dx - s * dy
            dev_lat = s * dx + c * dy
            return jnp.concatenate(
                [jnp.stack([dev_long, dev_lat, yaw - yr[2], x[3] - yr[3]]), u]
            )

        def resid_lonlat_term(x, yr):
            yaw = wrap_2pi(x[2])
            c, s = jnp.cos(-yaw), jnp.sin(-yaw)
            dx, dy = yr[0] - x[0], yr[1] - x[1]
            return jnp.stack([c * dx - s * dy, s * dx + c * dy, yaw - yr[2], x[3] - yr[3]])

        external = mpc_cfg.costfunction_type.upper() == "EXTERNAL"

        def con_stage(k, x):
            h = acc_constraints(x[3], x[7], x[3] * x[5], gg, vp.acc_min, shape)
            return jnp.concatenate([h, x[6:7]])  # [h rows..., delta_f]

        W = 0.01 * np.concatenate([np.diag(mpc_cfg.Q()), np.diag(mpc_cfg.R())])
        We = 0.01 * np.diag(mpc_cfg.Q())

        lh, uh = acc_bounds(shape)
        L1, L2 = mpc_cfg.L1_pen, mpc_cfg.L2_pen
        # state-constraint rows: [h..., delta_f] per node
        con_lb = np.tile(np.concatenate([lh, [vp.delta_f_min]]), (N + 1, 1))
        con_ub = np.tile(np.concatenate([uh, [vp.delta_f_max]]), (N + 1, 1))
        # node 0: x0 is fixed, so the delta_f bound is dropped (no bound in
        # the reference at node 0 either — idxbx applies to nodes 1..N)
        con_lb[0, nh] = -BIG
        con_ub[0, nh] = BIG
        con_z1 = np.full_like(con_lb, L1)
        con_z2 = np.full_like(con_lb, L2)

        # input rows: [jerk (unbounded), steering_rate]
        u_lb = np.tile([-BIG, vp.delta_f_dot_min], (N, 1))
        u_ub = np.tile([BIG, vp.delta_f_dot_max], (N, 1))
        u_z1 = np.full_like(u_lb, L1)
        u_z2 = np.full_like(u_lb, L2)
        # node 0 input bound is hard in the reference (ns_0 = nh only,
        # NMPC_STM_acados_settings.py:192-198)
        u_z1[0, :] = 0.0
        u_z2[0, :] = HARD_Z2

        funcs = OCPFunctions(
            dyn_step,
            y_stage,
            y_term,
            con_stage,
            resid_stage=resid_lonlat if external else None,
            resid_term=resid_lonlat_term if external else None,
            y_select=(0, 1, 2, 3),
            y_select_term=(0, 1, 2, 3),
            lin_rollout=lin_rollout,
        )
        self.engine = RTIEngine(
            funcs=funcs,
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
            lm_reg=0.1 if external else 0.0,
        )

    # ------------------------------------------------------------------
    def init_state(self, x0) -> RTIState:
        return self.engine.init_state(jnp.asarray(x0))

    def make_yref(self, ref_window):
        """(N, 6) stage refs + (4,) terminal ref from an (N+1)-point window
        (NMPC_class.py:169-180: u-references are zero)."""
        ny = 4 + self.nu
        stage = jnp.concatenate(
            [
                ref_window.pos[: self.N],
                ref_window.yaw[: self.N, None],
                ref_window.v[: self.N, None],
                jnp.zeros((self.N, self.nu), dtype=ref_window.pos.dtype),
            ],
            axis=1,
        )
        term = jnp.concatenate(
            [
                ref_window.pos[self.N],
                jnp.stack([ref_window.yaw[self.N], ref_window.v[self.N]]),
            ]
        )
        return stage, term

    def solve(self, state: RTIState, x0, ref_window, mods=None):
        """One RTI step. Returns (ControllerOutput, new RTIState)."""
        yref, yref_e = self.make_yref(ref_window)
        u0, new_state, st = self.engine.solve(state, x0, yref, yref_e, mods)
        # node-0 steering-rate bound is hard: clip the returned control
        u0 = jnp.stack(
            [
                u0[0],
                jnp.clip(u0[1], self.vp.delta_f_dot_min, self.vp.delta_f_dot_max),
            ]
        )
        stats = jnp.stack(
            [
                st.cost,
                jnp.zeros_like(st.cost),  # time_tot measured by the host bench
                st.sqp_iter.astype(st.cost.dtype),
                st.qp_iter.astype(st.cost.dtype),
                st.status.astype(st.cost.dtype),
            ]
        )
        return ControllerOutput(u0=u0, pred_X=new_state.X, stats=stats), new_state
