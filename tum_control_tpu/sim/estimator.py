"""State estimation emulation: per-state moving-average filter.

Replicates Utils/SimulationMode_main_class.py:82-86,152-156 +
moving_average_filter (:10-19): each of the 8 MPC-state components keeps a
ring buffer of the last 15 measurements and outputs the mean over its own
window size [1,1,4,2,2,3,4,2], truncated while the buffer is still filling.

The deque becomes a fixed (8, BUF) ring buffer in the scan carry; the
truncated start is realized with a count-dependent mask, so the filter is a
pure function with static shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BUF = 15
WINDOW_SIZES = np.array([1, 1, 4, 2, 2, 3, 4, 2])


class EstimatorState(NamedTuple):
    buf: jnp.ndarray    # (nx, BUF) ring buffer, slot `head` is the newest
    count: jnp.ndarray  # () number of samples seen so far


def init_estimator(nx: int = 8, dtype=None) -> EstimatorState:
    return EstimatorState(
        buf=jnp.zeros((nx, BUF), dtype=dtype), count=jnp.zeros((), dtype=jnp.int32)
    )


def estimate(state: EstimatorState, x, window_sizes=WINDOW_SIZES):
    """Push measurement x, return (filtered_x, new_state)."""
    nx = x.shape[0]
    buf = jnp.concatenate([state.buf[:, 1:], x[:, None]], axis=1)  # newest last
    count = jnp.minimum(state.count + 1, BUF)
    w = jnp.asarray(window_sizes)
    # effective window: min(window, samples available) — the reference uses a
    # truncated average until `window` samples exist
    eff = jnp.minimum(w, count)
    idx = jnp.arange(BUF)[None, :]  # ages: BUF-1 = newest
    take = idx >= (BUF - eff[:, None])
    filtered = jnp.sum(jnp.where(take, buf, 0.0), axis=1) / eff.astype(buf.dtype)
    return filtered, EstimatorState(buf=buf, count=count)
