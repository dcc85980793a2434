"""Reference-trajectory / track loading into device-resident arrays.

Consumes the reference JSON schema (Trajectories/reftraj_*.json with keys
pos_x/pos_y/orientation_*/ref_v/ref_acc/ref_yaw; track_*.json with centerline
X/Y and boundaries X_i/Y_i/X_o/Y_o) — cf. Utils/SimulationMode_main_class.py:36-42.

The per-point segment traversal time used by the planner emulator's
time-horizon walk (Utils/MPC_sim_utils.py:156-170) is a static property of
the trajectory, so it is precomputed here once:

    seg_time[j] = ||p[j] - p[j-1 mod M]|| / ref_v[j]

matching the reference's accumulation T += dist(new, prev) / v[new] with the
circuit wrap (index M-1 -> 0).
"""
from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RefTrajectory(NamedTuple):
    pos: jnp.ndarray       # (M, 2) pos_x, pos_y
    yaw: jnp.ndarray       # (M,)   ref_yaw (wrapped to [0, 2pi))
    v: jnp.ndarray         # (M,)   ref_v
    acc: jnp.ndarray       # (M,)   ref_acc
    seg_time: jnp.ndarray  # (M,)   traversal time of segment ending at j
    cum_time: jnp.ndarray  # (M+1,) prefix sums: cum_time[i] = sum(seg_time[:i])
    n_valid: jnp.ndarray   # ()     number of real points (<= M when padded)

    @property
    def n_points(self) -> int:
        """Padded array length (static)."""
        return self.pos.shape[0]


class Track(NamedTuple):
    center: np.ndarray  # (K, 2)
    inner: np.ndarray   # (K, 2)
    outer: np.ndarray   # (K, 2)


def postprocess_yaw(yaw):
    """Wrap yaw to [0, 2*pi) (reference Utils/MPC_sim_utils.py:126-135)."""
    return np.mod(yaw, 2.0 * np.pi)


def load_ref_trajectory(path: str, dtype=None) -> RefTrajectory:
    """Load a reftraj_*.json into a RefTrajectory of device arrays."""
    with open(path, "r") as fh:
        raw = json.load(fh)
    pos = np.stack([np.asarray(raw["pos_x"]), np.asarray(raw["pos_y"])], axis=1)
    v = np.asarray(raw["ref_v"], dtype=np.float64)
    yaw = np.asarray(raw["ref_yaw"], dtype=np.float64)
    acc = np.asarray(raw.get("ref_acc", np.zeros_like(v)), dtype=np.float64)
    seg = np.linalg.norm(pos - np.roll(pos, 1, axis=0), axis=1) / v
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    return RefTrajectory(
        pos=jnp.asarray(pos, dtype=dtype),
        yaw=jnp.asarray(yaw, dtype=dtype),
        v=jnp.asarray(v, dtype=dtype),
        acc=jnp.asarray(acc, dtype=dtype),
        seg_time=jnp.asarray(seg, dtype=dtype),
        cum_time=jnp.asarray(cum, dtype=dtype),
        n_valid=jnp.asarray(pos.shape[0], dtype=jnp.int32),
    )


def stack_trajectories(trajs) -> RefTrajectory:
    """Pad trajectories to a common length and stack along a leading axis.

    Padded slots get far-away positions (never the nearest point) and huge
    segment times (never inside a planner window); `n_valid` keeps the real
    length, which the planner uses for all modular index arithmetic. Select
    one lap with `jax.tree.map(lambda a: a[i], stacked)`.
    """
    import jax

    M = max(int(t.n_valid) for t in trajs)

    def pad(a, fill, target=M):
        m = a.shape[0]
        if m == target:
            return a
        pad_width = [(0, target - m)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width, constant_values=fill)

    padded = [
        RefTrajectory(
            pos=pad(t.pos, 1e7),
            yaw=pad(t.yaw, 0.0),
            v=pad(t.v, 1.0),
            acc=pad(t.acc, 0.0),
            seg_time=pad(t.seg_time, 1e7),
            # prefix sums beyond the real lap are only reached through masked
            # comparisons in the planner walk; a huge fill keeps them inert
            cum_time=pad(t.cum_time, 1e14, target=M + 1),
            n_valid=t.n_valid,
        )
        for t in trajs
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


def load_track(path: str) -> Track:
    """Load a track_*.json (host-side numpy; only used for plotting/eval)."""
    with open(path, "r") as fh:
        raw = json.load(fh)
    return Track(
        center=np.stack([raw["X"], raw["Y"]], axis=1),
        inner=np.stack([raw["X_i"], raw["Y_i"]], axis=1),
        outer=np.stack([raw["X_o"], raw["Y_o"]], axis=1),
    )


def initial_state(path: str, idx_ref_start: int):
    """Initial MPC (8-dim) and plant (7-dim) states from a trajectory point.

    Mirrors Utils/SimulationMode_main_class.py:44-66,103: pose from the start
    index, vlong = ref_v, vlat = yawrate = delta_f = a = 0.

    Reads the JSON host-side: device->host fetches of tiny slices are
    pathologically slow on tunneled-accelerator setups (measured ~75 s per
    fetch), while a host JSON parse is milliseconds.
    """
    with open(path, "r") as fh:
        raw = json.load(fh)
    px = float(raw["pos_x"][idx_ref_start])
    py = float(raw["pos_y"][idx_ref_start])
    yaw = float(postprocess_yaw(np.float64(raw["ref_yaw"][idx_ref_start])))
    v = float(raw["ref_v"][idx_ref_start])
    x0_mpc = np.array([px, py, yaw, v, 0.0, 0.0, 0.0, 0.0])
    x0_sim = np.array([px, py, yaw, v, 0.0, 0.0, 0.0])
    return x0_mpc, x0_sim


def resolve_trajectory_paths(trajectory_path: str, ref_traj_file: str, track_file: str):
    return (
        os.path.join(trajectory_path, ref_traj_file),
        os.path.join(trajectory_path, track_file),
    )
