"""Planner emulator vs an independent numpy port of the reference semantics
(Utils/MPC_sim_utils.py:137-194)."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tum_control_tpu.config import DEFAULT_TRAJECTORY_PATH
from tum_control_tpu.track.planner import planner_emulator
from tum_control_tpu.track.trajectory import load_ref_trajectory

TP, NOUT = 3.04, 39


def _reference_planner(raw, pose, Tp, n_out):
    """Literal numpy translation of the reference algorithm for testing."""
    px = np.asarray(raw["pos_x"])
    py = np.asarray(raw["pos_y"])
    pts = np.stack([px, py], axis=1)
    c = int(np.argmin(np.sum((pts - pose[None, :]) ** 2, axis=1)))
    v = np.asarray(raw["ref_v"])
    idx = [c]
    T = 0.0
    while T <= Tp:
        cur = idx[-1]
        nxt = 0 if cur + 1 >= len(px) else cur + 1
        idx.append(nxt)
        T += np.linalg.norm(pts[idx[-1]] - pts[idx[-2]]) / v[idx[-1]]
    out = {}
    for key in ["pos_x", "pos_y", "ref_yaw", "ref_v"]:
        vals = np.asarray(raw[key])[idx]
        xq = np.linspace(0, len(idx) - 1, n_out)
        interp = np.interp(xq, np.arange(len(idx)), vals)
        if key == "ref_yaw" and (np.abs(np.diff(vals)) > np.deg2rad(250)).any():
            interp = np.mod(
                np.interp(xq, np.arange(len(idx)), np.unwrap(vals, period=2 * np.pi)),
                2 * np.pi,
            )
        out[key] = interp
    return c, out


@pytest.fixture(scope="module")
def monteblanco():
    path = os.path.join(DEFAULT_TRAJECTORY_PATH, "reftraj_monteblanco_edgar.json")
    with open(path) as fh:
        raw = json.load(fh)
    traj = load_ref_trajectory(path)
    return raw, traj


@pytest.mark.parametrize("qidx", [0, 100, 333, 700, 1100, 1185])
def test_matches_reference_semantics(monteblanco, qidx):
    raw, traj = monteblanco
    pose = np.array([raw["pos_x"][qidx] + 0.3, raw["pos_y"][qidx] - 0.2])
    c_ref, ref = _reference_planner(raw, pose, TP, NOUT)
    c, win = planner_emulator(traj, jnp.asarray(pose), TP, NOUT)
    assert int(c) == c_ref
    np.testing.assert_allclose(np.array(win.pos[:, 0]), ref["pos_x"], atol=1e-9)
    np.testing.assert_allclose(np.array(win.pos[:, 1]), ref["pos_y"], atol=1e-9)
    np.testing.assert_allclose(np.array(win.v), ref["ref_v"], atol=1e-9)
    # yaw: wrap-aware comparison (circular vs conditional-unwrap interpolation)
    dy = np.mod(np.array(win.yaw) - ref["ref_yaw"] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dy, 0.0, atol=1e-9)


def test_wraps_at_lap_end(monteblanco):
    raw, traj = monteblanco
    pose = np.array([raw["pos_x"][-2], raw["pos_y"][-2]])
    c, win = planner_emulator(traj, jnp.asarray(pose), TP, NOUT)
    c_ref, ref = _reference_planner(raw, pose, TP, NOUT)
    assert int(c) == c_ref
    np.testing.assert_allclose(np.array(win.pos[:, 0]), ref["pos_x"], atol=1e-9)
