"""Pure-JAX Safe-RL WMPC environment: the vmapped, in-graph equivalent of
the reference's gymnasium env (Learning_To_Adapt/SafeRL_WMPC/RL_WMPC/
environment.py).

One env step = apply the chosen Pareto weight set and run `n_mpc_steps`
(=20) inner closed-loop MPC steps (planner -> solve -> plant -> estimator),
then reward the Gaussian-bell product of RMS lateral/velocity deviations
(reward.py:15-33), truncate on crash (|lat_dev| > max_lat_dev) or episode
length, and auto-reset to a random restart index on a random training lap
(environment.py:112-227).

Where the reference forks 16 subprocesses each owning an acados solver
(SubprocVecEnv, environment.py:290-295), here the whole batch of envs is a
single vmapped jitted program — rollouts run on-device at full batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.learn.observation import ObservationConfig, make_observation
from tum_control_tpu.ops.rti import QPMods
from tum_control_tpu.sim.closed_loop import ClosedLoopSim, SimCarry
from tum_control_tpu.sim.estimator import init_estimator
from tum_control_tpu.track.planner import planner_emulator
from tum_control_tpu.track.trajectory import RefTrajectory


class RLEnvConfig(NamedTuple):
    n_mpc_steps: int = 20
    max_lat_dev: float = 2.0
    episode_length: int = 128
    rew_sigmas: tuple = (0.1, 0.5)
    rew_lims_lat: tuple = (0.0, 0.4)
    rew_lims_vel: tuple = (0.0, 1.0)
    restart_indices: tuple = (0, 100, 200, 400, 500, 700, 800)


class EnvState(NamedTuple):
    carry: SimCarry
    t: jnp.ndarray          # () int32 env steps in episode
    track: jnp.ndarray      # () int32 lap index
    key: jnp.ndarray


class RLEnv:
    """Functional env over a ClosedLoopSim with a stacked multi-lap trajectory."""

    def __init__(
        self,
        sim: ClosedLoopSim,
        stacked_traj: RefTrajectory,  # leading axis = laps
        param_table: np.ndarray,
        obs_cfg: ObservationConfig,
        cfg: RLEnvConfig = RLEnvConfig(),
    ):
        self.sim = sim
        self.stacked = stacked_traj
        self.n_tracks = stacked_traj.pos.shape[0]
        self.table = jnp.asarray(param_table)
        self.n_actions = int(param_table.shape[0])
        self.obs_cfg = obs_cfg
        self.cfg = cfg
        self.n_observations = obs_cfg.n_observations

    # ------------------------------------------------------------------
    def _traj(self, track_idx):
        return jax.tree.map(lambda a: a[track_idx], self.stacked)

    def _mods(self, action) -> QPMods:
        eng = self.sim.controller.engine
        p = self.table[action]
        W = jnp.stack([p[0], p[0], p[1], p[2], p[3], p[4]])
        We = W[:4]
        soft_c = eng.con_z1 > 0
        soft_u = eng.u_z1 > 0
        return QPMods(
            W=W,
            We=We,
            con_z1=jnp.where(soft_c, p[5], eng.con_z1),
            con_z2=jnp.where(soft_c, p[6], eng.con_z2),
            u_z1=jnp.where(soft_u, p[5], eng.u_z1),
            u_z2=jnp.where(soft_u, p[6], eng.u_z2),
        )

    def _observe(self, carry: SimCarry, traj):
        _, window = planner_emulator(traj, carry.pose, self.sim.Tp, self.sim.N + 1)
        yaw = carry.x_sim[2]
        dx = window.pos[0, 0] - carry.x_sim[0]
        dy = window.pos[0, 1] - carry.x_sim[1]
        lat_dev = jnp.sin(-yaw) * dx + jnp.cos(-yaw) * dy
        vel_dev = carry.x_sim[3] - window.v[0]
        return make_observation(self.obs_cfg, lat_dev, vel_dev, window)

    # ------------------------------------------------------------------
    def reset(self, key) -> tuple:
        """(EnvState, obs): random restart index on a random training lap."""
        k1, k2, k3 = jax.random.split(key, 3)
        track = jax.random.randint(k1, (), 0, self.n_tracks)
        ridx = jnp.asarray(self.cfg.restart_indices)[
            jax.random.randint(k2, (), 0, len(self.cfg.restart_indices))
        ]
        traj = self._traj(track)
        px = traj.pos[ridx]
        yaw0 = jnp.mod(traj.yaw[ridx], 2 * jnp.pi)
        v0 = traj.v[ridx]
        zero = jnp.zeros((), px.dtype)
        x0m = jnp.stack([px[0], px[1], yaw0, v0, zero, zero, zero, zero])
        ctrl = self.sim.controller
        carry = SimCarry(
            ctrl_state=ctrl.init_state(x0m),
            # extra-carrying bases (R2NMPC corrections, WMPC policy state)
            # propagate through training rollouts too, not just inference
            extra=ctrl.init_extra() if hasattr(ctrl, "init_extra") else None,
            x_sim=x0m[:7],
            x_dist=x0m[:7],
            x_est=x0m,
            est_state=init_estimator(8, dtype=x0m.dtype),
            pose=x0m[:2],
            key=k3,
        )
        es = EnvState(carry=carry, t=jnp.zeros((), jnp.int32), track=track, key=key)
        return es, self._observe(carry, traj)

    # ------------------------------------------------------------------
    def step(self, es: EnvState, action) -> tuple:
        """(EnvState', obs, reward, done). Auto-resets when done."""
        cfg = self.cfg
        traj = self._traj(es.track)
        mods = self._mods(action)

        def inner(carry, i):
            carry, log = self.sim.step(
                carry, (i, jnp.zeros(7, carry.x_sim.dtype), jnp.zeros(7, carry.x_sim.dtype)),
                traj=traj, mods=mods,
            )
            return carry, (log.lat_dev, log.vel_dev)

        carry, (lats, vels) = jax.lax.scan(
            inner, es.carry, jnp.arange(cfg.n_mpc_steps)
        )

        rms = lambda x: jnp.sqrt(jnp.mean(x**2))
        lims_l, lims_v = cfg.rew_lims_lat, cfg.rew_lims_vel
        m_lat = jnp.clip((rms(lats) - lims_l[0]) / (lims_l[1] - lims_l[0]), 0.0, 1.0)
        m_vel = jnp.clip((rms(vels) - lims_v[0]) / (lims_v[1] - lims_v[0]), 0.0, 1.0)
        sig = jnp.asarray(cfg.rew_sigmas)
        reward = jnp.exp(-jnp.sum(jnp.stack([m_lat, m_vel]) ** 2 / (2.0 * sig)))

        crashed = jnp.max(jnp.abs(lats)) > cfg.max_lat_dev
        t = es.t + 1
        done = crashed | (t >= cfg.episode_length)

        key, reset_key = jax.random.split(es.key)
        cont = EnvState(carry=carry, t=t, track=es.track, key=key)
        fresh, obs_fresh = self.reset(reset_key)
        es_new = jax.tree.map(
            lambda f, c: jnp.where(done, f, c), fresh, cont
        )
        obs_cont = self._observe(carry, traj)
        obs = jnp.where(done, obs_fresh, obs_cont)
        return es_new, obs, reward, done
