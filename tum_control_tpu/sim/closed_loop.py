"""Fully-jitted closed-loop simulation: one `lax.scan` over control steps.

TPU-native re-design of the reference's python main loop (main.py:48-78 +
Utils/SimulationMode_main_class.py:106-156). One scan step performs:

    planner window extraction -> NMPC RTI solve -> solver-failure handling ->
    plant integration (+ derivative disturbances + measurement noise) ->
    moving-average state estimation -> logging slice

Both simulation modes are supported (sim_main_params.yaml:1-3):
  * sim_mode 0 (CiL): separate 7-state plant stepped at Ts with input
    [a, steering_rate] where a = predicted accel state at node 1
    (SimulationMode_main_class.py:113-120),
  * sim_mode 1 (MPC-in-loop): the plant is the MPC's node-1 prediction.
    (Deviation from the reference: we advance the planner pose from that
    prediction; the reference never updates `current_pose` in this mode —
    SimulationMode_main_class.py:106-112 — which freezes its reference
    window. See docs/PARITY.md.)

The whole loop jits into a single XLA program: no host<->device transfers
inside, and `vmap` over the carry/log batches thousands of scenarios.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tum_control_tpu.models.integrators import rk4_multistep
from tum_control_tpu.models.vehicle_stm import sim_ode, sim_ode_disturbed
from tum_control_tpu.sim.disturbances import DisturbanceConfig, TYPE_NONE, draw_disturbance
from tum_control_tpu.sim.estimator import estimate, init_estimator
from tum_control_tpu.track.planner import planner_emulator
from tum_control_tpu.track.trajectory import RefTrajectory

PLANT_SUBSTEPS = 4  # CasADi 'rk' number_of_finite_elements (VehicleSimulator.py:76)


class SimCarry(NamedTuple):
    ctrl_state: object        # controller warm-start pytree
    extra: object             # controller-specific carried state (WMPC, R2 corrections)
    x_sim: jnp.ndarray        # (7,) true plant state
    x_dist: jnp.ndarray       # (7,) disturbed/measured plant state
    x_est: jnp.ndarray        # (8,) estimated MPC state (controller input)
    est_state: object
    pose: jnp.ndarray         # (2,) planner query position
    key: jnp.ndarray


class SimLog(NamedTuple):
    """Per-step log slices (scan ys); names mirror the reference Logger."""

    MPC_SimX: jnp.ndarray        # (8,) x_next_MPC (node-1 prediction)
    CiLX: jnp.ndarray            # (7,) true plant next state
    DisturbedX: jnp.ndarray      # (7,) disturbed next state
    simU: jnp.ndarray            # (2,) applied [jerk, steering_rate]
    simREF: jnp.ndarray          # (4,) ref pos_x/pos_y/yaw/v at window head
    simSolverDebug: jnp.ndarray  # (5,) [cost, time, sqp_iter, qp_iter, status]
    lat_dev: jnp.ndarray         # ()
    vel_dev: jnp.ndarray         # ()
    dist_deriv: jnp.ndarray      # (7,) applied derivative disturbance
    dist_se: jnp.ndarray         # (7,) applied measurement noise
    wmpc_action: jnp.ndarray     # () int32 active WMPC weight-set index (-1 if no WMPC)


class ClosedLoopSim:
    def __init__(
        self,
        controller,
        traj: RefTrajectory,
        sim_mode: int,
        Ts: float,
        Tp: float,
        N: int,
        vp_sim,
        tp_sim,
        dist_deriv: DisturbanceConfig,
        dist_se: DisturbanceConfig,
        playback: bool = False,
    ):
        self.playback = playback
        self.controller = controller
        self.traj = traj
        self.sim_mode = sim_mode
        self.Ts, self.Tp, self.N = Ts, Tp, N
        self.vp_sim, self.tp_sim = vp_sim, tp_sim
        self.dist_deriv, self.dist_se = dist_deriv, dist_se

    # ------------------------------------------------------------------
    def init_carry(self, x0_mpc, x0_sim, key) -> SimCarry:
        x0_mpc = jnp.asarray(x0_mpc)
        x0_sim = jnp.asarray(x0_sim)
        ctrl_state = self.controller.init_state(x0_mpc)
        extra = self.controller.init_extra() if hasattr(self.controller, "init_extra") else None
        return SimCarry(
            ctrl_state=ctrl_state,
            extra=extra,
            x_sim=x0_sim,
            x_dist=x0_sim,
            x_est=x0_mpc,
            est_state=init_estimator(8, dtype=x0_mpc.dtype),
            pose=x0_mpc[:2],
            key=key,
        )

    # ------------------------------------------------------------------
    def step(self, carry: SimCarry, step_in, traj=None, mods=None) -> tuple:
        """One closed-loop step. `traj` overrides the default trajectory
        (multi-track RL environments pass a per-episode lap); `mods`
        overrides QP weights/bounds for this solve (RL weight actions)."""
        i, w_deriv_play, w_se_play = step_in
        traj = self.traj if traj is None else traj
        key, k1, k2 = jax.random.split(carry.key, 3)

        # --- planner emulator (PlannerEmulator, MPC_sim_utils.py:137-194)
        _, window = planner_emulator(traj, carry.pose, self.Tp, self.N + 1)

        # --- controller RTI solve (NMPC_class.solve)
        if carry.extra is not None:
            out, ctrl_state, extra = self.controller.solve_with_extra(
                carry.ctrl_state, carry.extra, carry.x_est, window, mods=mods
            )
        else:
            out, ctrl_state = self.controller.solve(
                carry.ctrl_state, carry.x_est, window, mods=mods
            )
            extra = None
        status = out.stats[4]

        # solver failure -> re-initialize solver memory at the current
        # estimate (main.py:59-61, NMPC_class.reintialize_solver)
        reinit = self.controller.init_state(carry.x_est)
        ctrl_state = jax.tree.map(
            lambda a, b: jnp.where(status != 0, a, b), reinit, ctrl_state
        )

        # --- plant step (SimulationMode_main_class.sim_step)
        a_in = out.pred_X[1, 7]
        sr_in = out.u0[1]
        u_plant = jnp.stack([a_in, sr_in])

        if self.sim_mode == 1:
            x_next8 = out.pred_X[1]
            x_sim_next = x_next8[:7]
            x_dist_next = x_sim_next
            w_deriv = jnp.zeros(7, dtype=x_sim_next.dtype)
            w_se = jnp.zeros(7, dtype=x_sim_next.dtype)
            pose_next = x_next8[:2]
        else:
            f_nom = lambda x, u: sim_ode(x, u, self.vp_sim, self.tp_sim)
            x_sim_next = rk4_multistep(f_nom, carry.x_sim, u_plant, self.Ts, PLANT_SUBSTEPS)
            if self.dist_deriv.kind != TYPE_NONE:
                w_deriv = w_deriv_play if self.playback else draw_disturbance(self.dist_deriv, k1)
                f_dist = lambda x, u: sim_ode_disturbed(
                    x, u, w_deriv, self.vp_sim, self.tp_sim
                )
                x_dist_next = rk4_multistep(
                    f_dist, carry.x_sim, u_plant, self.Ts, PLANT_SUBSTEPS
                )
            else:
                w_deriv = jnp.zeros(7, dtype=x_sim_next.dtype)
                x_dist_next = x_sim_next
            if self.dist_se.kind != TYPE_NONE:
                w_se = w_se_play if self.playback else draw_disturbance(self.dist_se, k2)
                x_dist_next = x_dist_next + w_se
            else:
                w_se = jnp.zeros(7, dtype=x_sim_next.dtype)
            x_next8 = jnp.concatenate([x_dist_next, a_in[None]])
            pose_next = x_sim_next[:2]

        # --- state estimation (moving average) + next MPC initial state
        x_est_next, est_state = estimate(carry.est_state, x_next8)

        # --- metrics at the *current* state vs window head (Logger:152-159)
        yaw = carry.x_sim[2]
        dx = window.pos[0, 0] - carry.x_sim[0]
        dy = window.pos[0, 1] - carry.x_sim[1]
        lat_dev = jnp.sin(-yaw) * dx + jnp.cos(-yaw) * dy
        vel_dev = carry.x_sim[3] - window.v[0]

        log = SimLog(
            MPC_SimX=out.pred_X[1] if self.sim_mode == 0 else x_next8,
            CiLX=x_sim_next,
            DisturbedX=x_dist_next,
            simU=out.u0,
            simREF=jnp.concatenate(
                [window.pos[0], jnp.stack([window.yaw[0], window.v[0]])]
            ),
            simSolverDebug=out.stats,
            lat_dev=lat_dev,
            vel_dev=vel_dev,
            dist_deriv=w_deriv,
            dist_se=w_se,
            # WMPC action trace (reference RL_actions, Logging_Plotting.py:
            # 182-191); -1 marks a run without a weights-varying policy
            wmpc_action=(
                extra.action
                if extra is not None and hasattr(extra, "action")
                else jnp.full((), -1, jnp.int32)
            ),
        )
        new_carry = SimCarry(
            ctrl_state=ctrl_state,
            extra=extra,
            x_sim=x_sim_next,
            x_dist=x_dist_next,
            x_est=x_est_next,
            est_state=est_state,
            pose=pose_next,
            key=key,
        )
        return new_carry, log

    # ------------------------------------------------------------------
    def run(self, x0_mpc, x0_sim, n_steps: int, key=None, playback=None):
        """Run the closed loop; returns (final_carry, SimLog arrays (n_steps, ...))."""
        if key is None:
            key = jax.random.PRNGKey(0)
        carry = self.init_carry(x0_mpc, x0_sim, key)
        return self.run_from(carry, n_steps, playback=playback)

    def run_from(self, carry: SimCarry, n_steps: int, playback=None):
        """Continue the closed loop from an existing carry (e.g. after a
        settle phase, or resuming a checkpointed run)."""
        if playback is None:
            w_d = jnp.zeros((n_steps, 7), dtype=carry.x_sim.dtype)
            w_s = jnp.zeros((n_steps, 7), dtype=carry.x_sim.dtype)
        else:
            w_d, w_s = playback
        xs = (jnp.arange(n_steps), w_d, w_s)
        return jax.lax.scan(self.step, carry, xs)
