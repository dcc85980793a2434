"""Native real-time runtime: build, timing loop, telemetry round trip."""
import os
import time

import numpy as np
import pytest

from tum_control_tpu.utils.rt_runtime import RealtimeExecutor, read_telemetry


def test_executor_cycle_and_telemetry(tmp_path):
    ex = RealtimeExecutor(period_s=0.002, ring_capacity=1024)
    starts = []
    for i in range(50):
        t0 = ex.begin_cycle()
        starts.append(t0)
        ex.record(t0, 100_000 + i, 0, 1.5, 0.01, -0.2, 0.3, 0.004)
    stats = ex.stats()
    assert stats["cycles"] == 50
    # periods between cycles should be ~2 ms (generous CI tolerance)
    d = np.diff(starts) / 1e6
    assert np.median(d) == pytest.approx(2.0, rel=0.3)

    path = str(tmp_path / "tele.bin")
    n = ex.export(path)
    assert n == 50
    rec = read_telemetry(path)
    assert rec.shape[0] == 50
    assert rec["status"].max() == 0
    assert rec["solve_ns"][0] == 100_000
    np.testing.assert_allclose(rec["cost"], 1.5)
    ex.close()


def test_deadline_miss_detection():
    ex = RealtimeExecutor(period_s=0.001)
    ex.begin_cycle()
    time.sleep(0.01)  # blow through several deadlines
    ex.begin_cycle()
    assert ex.stats()["deadline_misses"] >= 1
    ex.close()


@pytest.mark.slow
def test_deploy_rt_pipelined_smoke(tmp_path):
    """deploy_rt --pipeline N end-to-end on CPU: all cycles recorded, no
    solver failures, telemetry exported (the async serving mode that hides
    network-attached-accelerator RTT — VERDICT r2 #8)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tele = str(tmp_path / "tele.bin")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy_rt.py"), "--cpu",
         "--cycles", "20", "--pipeline", "2", "--period", "0.02",
         "--telemetry", tele],
        capture_output=True, text=True, timeout=480,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pipeline=2" in out.stdout
    rec = read_telemetry(tele)
    assert rec.shape[0] == 20
    assert (rec["status"] == 0).all()
