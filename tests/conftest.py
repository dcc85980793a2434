"""Test configuration: CPU backend with 8 virtual devices, float64.

The container's sitecustomize preloads jax and pins the axon TPU platform;
backends initialize lazily, so switching to CPU here (before any op runs)
works. Tests run in f64 for tight numerical tolerances; the TPU path runs
the same code in f32 (validated by bench.py on hardware).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line("markers", "golden: tests needing the reference golden logs")


@pytest.fixture(scope="session")
def golden_nmpc_log():
    """The ACC24 nominal-NMPC no-disturbance golden run, if present."""
    import numpy as np

    path = os.path.join(
        REFERENCE_ROOT,
        "Papers_Plots/ACC24_SNMPC",
        "NMPC_FnodistSE_n10uph15v0.8vlt0.35yrt0.035p0.82023-09-17_16-06-27/full_logs.npz",
    )
    if not os.path.exists(path):
        pytest.skip("golden logs not available")
    return np.load(path)
