"""Batched BO objective: closed-loop tracking performance per weight set.

The reference evaluates each candidate weight set by running full closed
loops over every track segment in a multiprocessing pool of acados solvers
(BO_WMPC/objective_function.py + bayesian_optimization.py:372-413). Here the
whole (candidates x segments) product is ONE vmapped device program: every
rollout runs a fixed number of steps with done/crash latches.

Objectives (maximized, objective_function.py:178-185):
    f0 = -max |lat_dev|,  f1 = -RMS(vel_dev)
Infeasible (crash) when lat_dev > max_lat_dev or the normalized combined
acceleration exceeds max_a_comb (ibid.:188-199) -> objectives = NaN.

A segment run ends when the planner's nearest-point index reaches the
segment end (ibid.:139); in-graph this is a latch that freezes metric
accumulation once the end index (or the step cap) is hit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.ops.rti import QPMods
from tum_control_tpu.sim.closed_loop import ClosedLoopSim
from tum_control_tpu.sim.estimator import init_estimator
from tum_control_tpu.track.planner import planner_emulator
from tum_control_tpu.track.trajectory import RefTrajectory


class SegmentBatch(NamedTuple):
    """Device-side segment descriptors (one row per segment)."""

    track: jnp.ndarray  # (S,) int32 lap index into the stacked trajectory
    start: jnp.ndarray  # (S,) int32
    end: jnp.ndarray    # (S,) int32


def make_segment_batch(segments: list, track_names: list) -> SegmentBatch:
    name_to_id = {n: i for i, n in enumerate(track_names)}
    return SegmentBatch(
        track=jnp.asarray([name_to_id[s["trajectory"]] for s in segments], jnp.int32),
        start=jnp.asarray([s["start"] for s in segments], jnp.int32),
        end=jnp.asarray([s["end"] for s in segments], jnp.int32),
    )


def params_to_mods(engine, p) -> QPMods:
    """7-vector [q_xy, q_yaw, q_vel, r_jerk, r_steer, L1, L2] -> QP mods
    (same mapping as WMPC weight updates, NMPC_class.py:269-317)."""
    W = jnp.stack([p[0], p[0], p[1], p[2], p[3], p[4]])
    soft_c = engine.con_z1 > 0
    soft_u = engine.u_z1 > 0
    return QPMods(
        W=W,
        We=W[:4],
        con_z1=jnp.where(soft_c, p[5], engine.con_z1),
        con_z2=jnp.where(soft_c, p[6], engine.con_z2),
        u_z1=jnp.where(soft_u, p[5], engine.u_z1),
        u_z2=jnp.where(soft_u, p[6], engine.u_z2),
    )


class ObjectiveEvaluator:
    def __init__(
        self,
        sim: ClosedLoopSim,
        stacked_traj: RefTrajectory,
        max_steps: int = 1500,
        max_lat_dev: float = 2.0,
        max_a_comb: float = 1.02,
        chunk: int = 128,
    ):
        self.sim = sim
        self.stacked = stacked_traj
        self.max_steps = max_steps
        self.max_lat_dev = max_lat_dev
        self.max_a_comb = max_a_comb
        # scenarios per device program: bounds the memory/size of one jit
        # (very large single programs have crashed the TPU runtime)
        self.chunk = chunk
        self._run_chunk = jax.jit(jax.vmap(self._run_one))
        gg = sim.controller.gg
        acc_min = sim.controller.vp.acc_min
        self._gg, self._acc_min = gg, acc_min

    # ------------------------------------------------------------------
    def _a_comb(self, x_sim, a_lon):
        """Normalized combined acceleration (Logging_Plotting.py:164-179)."""
        alat = x_sim[3] * x_sim[5]
        alat_lim = self._gg.ay_lim(x_sim[3])
        alon_lim = jnp.where(a_lon > 0, self._gg.ax_lim(x_sim[3]), self._acc_min)
        alat_n = alat / alat_lim
        alon_n = jnp.where(a_lon > 0, a_lon / alon_lim, jnp.abs(a_lon) / alon_lim)
        return jnp.sqrt(alon_n**2 + alat_n**2)

    def _run_one(self, p, track, start, end):
        """One (candidate, segment) rollout -> (f0, f1, feasible)."""
        traj = jax.tree.map(lambda a: a[track], self.stacked)
        mods = params_to_mods(self.sim.controller.engine, p)

        px = traj.pos[start]
        yaw0 = jnp.mod(traj.yaw[start], 2 * jnp.pi)
        v0 = traj.v[start]
        zero = jnp.zeros((), px.dtype)
        x0m = jnp.stack([px[0], px[1], yaw0, v0, zero, zero, zero, zero])
        from tum_control_tpu.sim.closed_loop import SimCarry

        carry0 = SimCarry(
            ctrl_state=self.sim.controller.init_state(x0m),
            extra=None,
            x_sim=x0m[:7],
            x_dist=x0m[:7],
            x_est=x0m,
            est_state=init_estimator(8, dtype=x0m.dtype),
            pose=x0m[:2],
            key=jax.random.PRNGKey(0),
        )

        def body(state, i):
            carry, done, crash, max_lat, sum_vel2, n = state
            new_carry, log = self.sim.step(
                carry,
                (i, jnp.zeros(7, x0m.dtype), jnp.zeros(7, x0m.dtype)),
                traj=traj,
                mods=mods,
            )
            c_idx, _ = planner_emulator(traj, new_carry.pose, self.sim.Tp, 2)
            reached = c_idx == end
            a_comb = self._a_comb(new_carry.x_sim, log.MPC_SimX[7])
            crashed_now = (log.lat_dev > self.max_lat_dev) | (a_comb > self.max_a_comb)

            active = jnp.logical_not(done | crash)
            max_lat = jnp.where(active, jnp.maximum(max_lat, jnp.abs(log.lat_dev)), max_lat)
            sum_vel2 = jnp.where(active, sum_vel2 + log.vel_dev**2, sum_vel2)
            n = jnp.where(active, n + 1, n)
            carry = jax.tree.map(lambda new, old: jnp.where(active, new, old), new_carry, carry)
            done = done | (active & reached)
            crash = crash | (active & crashed_now)
            return (carry, done, crash, max_lat, sum_vel2, n), None

        zero_f = jnp.zeros((), x0m.dtype)
        state0 = (carry0, jnp.array(False), jnp.array(False), zero_f, zero_f, jnp.zeros((), jnp.int32))
        (carry, done, crash, max_lat, sum_vel2, n), _ = jax.lax.scan(
            body, state0, jnp.arange(self.max_steps)
        )
        rms_vel = jnp.sqrt(sum_vel2 / jnp.maximum(n, 1))
        feasible = jnp.logical_not(crash)
        f = jnp.stack([-max_lat, -rms_vel])
        f = jnp.where(feasible, f, jnp.nan)
        return f, feasible

    # ------------------------------------------------------------------
    def evaluate(self, params, seg: SegmentBatch):
        """params (C, 7) x segments (S,) -> (objs (C, 2), feasible (C,)).

        Per reference semantics the group objective is the mean over its
        segments, and a candidate is infeasible if ANY segment crashes
        (objective_function.py:158-172).
        """
        # flatten (candidates x segments) into ONE vmap axis — a single batch
        # dimension keeps the Pallas linear-algebra kernels on their batched
        # path (nested vmaps would have to map through the kernel call) —
        # and evaluate in fixed-size chunks so each device program stays
        # bounded (pad the tail chunk).
        C = params.shape[0]
        S = seg.track.shape[0]
        p_flat = jnp.repeat(params, S, axis=0)
        tr = jnp.tile(seg.track, C)
        st = jnp.tile(seg.start, C)
        en = jnp.tile(seg.end, C)
        total = C * S
        fs, feass = [], []
        for lo in range(0, total, self.chunk):
            hi = min(lo + self.chunk, total)
            pad = self.chunk - (hi - lo)
            sl = lambda a: jnp.concatenate([a[lo:hi], a[hi - 1 :hi].repeat(pad, axis=0)]) if pad else a[lo:hi]
            f_c, feas_c = self._run_chunk(sl(p_flat), sl(tr), sl(st), sl(en))
            fs.append(f_c[: hi - lo])
            feass.append(feas_c[: hi - lo])
        f = jnp.concatenate(fs).reshape(C, S, 2)
        feas = jnp.concatenate(feass).reshape(C, S)
        feasible = jnp.all(feas, axis=1)
        objs = jnp.mean(f, axis=1)  # NaN propagates from crashed segments
        objs = jnp.where(feasible[:, None], objs, jnp.nan)
        return objs, feasible
