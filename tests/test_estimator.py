"""Moving-average state estimator vs a literal deque port of the reference
(SimulationMode_main_class.py:10-19, 82-86, 152-156)."""
from collections import deque

import jax.numpy as jnp
import numpy as np

from tum_control_tpu.sim.estimator import WINDOW_SIZES, estimate, init_estimator


def _reference_filter(measurements):
    bufs = [deque(maxlen=15) for _ in range(8)]
    out = []
    for x in measurements:
        filtered = np.zeros(8)
        for i in range(8):
            bufs[i].append(x[i])
            data = np.array(bufs[i])
            w = WINDOW_SIZES[i]
            n = len(data)
            # reference moving_average_filter returns the last element of the
            # filtered sequence: truncated mean while filling, else window mean
            if n - 1 < w:
                filtered[i] = np.mean(data[: n])
            else:
                filtered[i] = np.mean(data[n - w : n])
        out.append(filtered)
    return np.array(out)


def test_matches_reference_deque_filter():
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((40, 8)).cumsum(axis=0)
    want = _reference_filter(xs)
    st = init_estimator(8)
    got = []
    for x in xs:
        y, st = estimate(st, jnp.asarray(x))
        got.append(np.array(y))
    np.testing.assert_allclose(np.array(got), want, rtol=1e-12, atol=1e-12)


def test_identity_for_window_one():
    st = init_estimator(8)
    xs = np.arange(8.0)
    y, st = estimate(st, jnp.asarray(xs))
    # components with window 1 pass through unfiltered
    assert float(y[0]) == 0.0 and float(y[1]) == 1.0
