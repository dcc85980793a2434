"""Weights-varying MPC (WMPC): a PPO policy periodically rewrites the
controller's cost weights inside the closed loop.

TPU-native equivalent of the WMPC blocks embedded in every reference
controller (NMPC_class.py:120-160, 208-239, 269-317): every
`weights_update_period` (=20) solves, build the observation from the current
deviations + reference preview, predict a discrete action (an index into the
Pareto parameter table F.csv), and swap in that parameter set's weights:

    Q = diag(p0, p0, p1, p2), R = diag(p3, p4), Qe = Q, L1 = p5, L2 = p6

Parity quirk replicated: `update_cost_function_weights` writes W WITHOUT the
initial 0.01 scaling (cost_set W = blkdiag(Q,R) vs the build-time
0.01*blkdiag — NMPC_STM_acados_settings.py:55 vs NMPC_class.py:290) — the
trained policies and Pareto tables bake this in.

Implemented as a wrapper that carries (step counter, obs stack, current
weight mods) in the closed-loop `extra` state; weight swaps are `jnp.where`
selects, so the whole mechanism stays inside the jitted scan.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from tum_control_tpu.learn.observation import ObservationConfig, make_observation
from tum_control_tpu.learn.policy import MLPPolicy
from tum_control_tpu.ops.rti import QPMods


class WMPCExtra(NamedTuple):
    steps: jnp.ndarray       # () int32 — steps since last weight update
    obs: jnp.ndarray         # (n_obs * n_stack,) stacked observation
    action: jnp.ndarray      # () int32 — last selected parameter set
    W: jnp.ndarray           # (6,) current stage weight diag
    We: jnp.ndarray          # (4,) current terminal weight diag
    L1: jnp.ndarray          # () current linear slack penalty
    L2: jnp.ndarray          # () current quadratic slack penalty
    base: Any = None         # base controller's own extra (R2NMPC corrections)


class WMPCController:
    """Wraps a base controller (nominal / snmpc) with weight-varying logic."""

    def __init__(
        self,
        base,
        policy: MLPPolicy,
        param_table: np.ndarray,   # (n_actions, 7) Pareto sets
        obs_cfg: ObservationConfig,
        update_period: int = 20,
        n_stack: int = 1,
    ):
        self.base = base
        self.policy = policy
        self.param_table = jnp.asarray(param_table)
        self.obs_cfg = obs_cfg
        self.period = update_period
        self.n_stack = n_stack
        self.N = base.N
        self.vp = base.vp

    # -- delegated API --------------------------------------------------
    def init_state(self, x0):
        return self.base.init_state(x0)

    def init_extra(self) -> WMPCExtra:
        eng = self.base.engine
        base_extra = (
            self.base.init_extra() if hasattr(self.base, "init_extra") else None
        )
        return WMPCExtra(
            steps=jnp.zeros((), jnp.int32),
            obs=jnp.zeros(self.obs_cfg.n_observations * self.n_stack),
            action=jnp.zeros((), jnp.int32),
            W=eng.W,
            We=eng.We,
            L1=jnp.asarray(float(self.base.cfg.L1_pen)),
            L2=jnp.asarray(float(self.base.cfg.L2_pen)),
            base=base_extra,
        )

    def _mods(self, extra: WMPCExtra) -> QPMods:
        eng = self.base.engine
        # soft rows take the current L1/L2; hard rows (z1=0) keep their huge z2
        soft_c = eng.con_z1 > 0
        soft_u = eng.u_z1 > 0
        return QPMods(
            W=extra.W,
            We=extra.We,
            con_z1=jnp.where(soft_c, extra.L1, eng.con_z1),
            con_z2=jnp.where(soft_c, extra.L2, eng.con_z2),
            u_z1=jnp.where(soft_u, extra.L1, eng.u_z1),
            u_z2=jnp.where(soft_u, extra.L2, eng.u_z2),
        )

    def solve_with_extra(self, state, extra: WMPCExtra, x0, ref_window, mods=None):
        # A base with its own extra state (R2NMPC: carried constraint
        # tightening) composes: our weight mods merge with its bound mods,
        # matching the reference R2 class where both blocks coexist
        # (Reduced_Robustified_NMPC_class.py:205-246, 373-405). Externally
        # supplied `mods` fields (e.g. an RL env's per-step overrides) take
        # precedence over the policy's own weight mods where both are set.
        own = self._mods(extra)
        if mods is not None:
            own = own._replace(
                **{k: v for k, v in mods._asdict().items() if v is not None}
            )
        if hasattr(self.base, "solve_with_extra"):
            out, new_state, new_base = self.base.solve_with_extra(
                state, extra.base, x0, ref_window, mods=own
            )
        else:
            out, new_state = self.base.solve(state, x0, ref_window, mods=own)
            new_base = None

        # --- weight update check (solve() tail in the reference) ---
        update = extra.steps >= self.period
        yaw = x0[2]
        dx = ref_window.pos[0, 0] - x0[0]
        dy = ref_window.pos[0, 1] - x0[1]
        lat_dev = jnp.sin(-yaw) * dx + jnp.cos(-yaw) * dy
        vel_dev = x0[3] - ref_window.v[0]
        obs_new = make_observation(self.obs_cfg, lat_dev, vel_dev, ref_window)
        if self.n_stack > 1:
            stacked = jnp.concatenate(
                [extra.obs[self.obs_cfg.n_observations :], obs_new]
            )
        else:
            stacked = obs_new
        obs = jnp.where(update, stacked, extra.obs)
        action = jnp.where(update, self.policy.predict(obs), extra.action).astype(jnp.int32)
        p = self.param_table[action]
        # NOTE: no 0.01 factor (reference update_cost_function_weights parity)
        W_new = jnp.stack([p[0], p[0], p[1], p[2], p[3], p[4]])
        We_new = jnp.stack([p[0], p[0], p[1], p[2]])
        new_extra = WMPCExtra(
            steps=jnp.where(update, 1, extra.steps + 1).astype(jnp.int32),
            obs=obs,
            action=action,
            W=jnp.where(update, W_new, extra.W),
            We=jnp.where(update, We_new, extra.We),
            L1=jnp.where(update, p[5], extra.L1),
            L2=jnp.where(update, p[6], extra.L2),
            base=new_base,
        )
        return out, new_state, new_extra


def load_param_table(path: str) -> np.ndarray:
    """Pareto parameter sets, one 7-vector per line (F.csv format)."""
    return np.loadtxt(path, delimiter=",")
