"""Fault-injection disturbance streams (state-derivative + measurement noise).

Reference semantics (Utils/MPC_sim_utils.py:16-99):
  * 'uniform'  — a sample drawn uniformly(ish) inside the axis-aligned
    ellipsoid with semi-axes = the configured magnitudes (sampleFromEllipsoid:
    radius ~ U^(1/n), direction ~ normalized gaussian),
  * 'gaussian' — independent N(0, sigma_j) per component,
  * 'absolute' — the constant upper bound.

Unlike the reference's unseeded np.random, draws are keyed `jax.random`
streams — every scenario/step is reproducible and batched draws are
deterministic under vmap (SURVEY.md §5.3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TYPE_NONE, TYPE_UNIFORM, TYPE_GAUSSIAN, TYPE_ABSOLUTE = 0, 1, 2, 3

_TYPE_BY_NAME = {
    "none": TYPE_NONE,
    "uniform": TYPE_UNIFORM,
    "gaussian": TYPE_GAUSSIAN,
    "absolute": TYPE_ABSOLUTE,
}


class DisturbanceConfig(NamedTuple):
    kind: int            # TYPE_* (static)
    magnitudes: jnp.ndarray  # (n,) per-component bound / std


def disturbance_config(type_name: str, magnitudes, enabled: bool = True) -> DisturbanceConfig:
    kind = _TYPE_BY_NAME[type_name] if enabled else TYPE_NONE
    return DisturbanceConfig(kind=kind, magnitudes=jnp.asarray(magnitudes))


def draw_disturbance(cfg: DisturbanceConfig, key):
    """One disturbance vector (n,) for the given PRNG key."""
    n = cfg.magnitudes.shape[0]
    if cfg.kind == TYPE_NONE:
        return jnp.zeros_like(cfg.magnitudes)
    if cfg.kind == TYPE_UNIFORM:
        k1, k2 = jax.random.split(key)
        r = jax.random.uniform(k1) ** (1.0 / n)
        x = jax.random.normal(k2, (n,))
        x = x / jnp.linalg.norm(x) * r
        return cfg.magnitudes * x
    if cfg.kind == TYPE_GAUSSIAN:
        return cfg.magnitudes * jax.random.normal(key, (n,))
    return cfg.magnitudes  # absolute


def load_playback(logs_path: str, log_file: str, n_steps: int):
    """Load a recorded disturbance realization from a previous run's
    full_logs.npz for replay (reference sim_main_params.yaml:44-48 /
    MPC_sim_utils.py:39-45: arrays `sim_disturbance_derivatives` and
    `sim_disturbance_state_estimation`). Returns (w_deriv, w_se) of shape
    (n_steps, 7), zero-padded if the recording is shorter."""
    import os

    import numpy as np

    path = log_file if os.path.isabs(log_file) else os.path.join(logs_path, log_file)
    data = np.load(path)
    out = []
    for name in ("sim_disturbance_derivatives", "sim_disturbance_state_estimation"):
        w = np.asarray(data[name])[:n_steps]
        if w.shape[0] < n_steps:
            w = np.concatenate(
                [w, np.zeros((n_steps - w.shape[0], w.shape[1]), w.dtype)]
            )
        out.append(jnp.asarray(w[:, :7]))
    return tuple(out)
