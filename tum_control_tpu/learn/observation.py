"""RL observation generator (jit-safe port of RL_WMPC/observation.py).

obs = min-max-normalized [lat_dev, vel_dev,
                          10 future reference velocities,
                          10 smoothed future reference yaw rates]

Parity notes (RL_WMPC/observation.py:16-75 + NMPC_class.py:208-222):
  * yaw rate = diff(unwrap(ref_yaw)) / Ts with Ts the *simulator* period
    (0.02 s), although window points are Ts_MPC (0.08 s) apart — a reference
    quirk (rates scaled 4x) that the trained policies bake in; replicated.
  * 10-point moving average ('valid' convolution) smooths the rates,
  * sample indices are linspace over the available points,
  * normalization bounds: lat [-3,3] m, vel dev [-5,5] m/s, v [0,39] m/s,
    yaw rate [-3.2,3.2] rad/s. No clipping (reference leaves it commented).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ObservationConfig(NamedTuple):
    n_points: int = 10      # obs_n_anticipation_points
    Ts: float = 0.02        # divisor for yaw-rate differencing (sim Ts)
    smooth_N: int = 10

    @property
    def n_observations(self) -> int:
        return 2 + 2 * self.n_points


def make_observation(cfg: ObservationConfig, lat_dev, vel_dev, ref_window):
    """(n_obs,) observation from the current deviations + an (N+1)-point
    reference window (RefWindow)."""
    v_ref = ref_window.v
    yaw = jnp.unwrap(ref_window.yaw)
    yaw_rate = jnp.diff(yaw) / cfg.Ts
    kern = jnp.ones(cfg.smooth_N) / cfg.smooth_N
    yaw_rate = jnp.convolve(yaw_rate, kern, mode="valid")

    iv = np.linspace(0, v_ref.shape[0] - 1, cfg.n_points).astype(int)
    iy = np.linspace(0, yaw_rate.shape[0] - 1, cfg.n_points).astype(int)
    raw = jnp.concatenate(
        [jnp.stack([lat_dev, vel_dev]), v_ref[iv], yaw_rate[iy]]
    )
    lo = jnp.asarray(
        np.concatenate([[-3.0, -5.0], np.full(cfg.n_points, 0.0), np.full(cfg.n_points, -3.2)])
    )
    hi = jnp.asarray(
        np.concatenate([[3.0, 5.0], np.full(cfg.n_points, 39.0), np.full(cfg.n_points, 3.2)])
    )
    return (raw - lo) / (hi - lo)
