"""Real multi-process distributed execution: 2 OS processes x 4 virtual CPU
devices each, stitched by jax.distributed into one 8-device global mesh
running the sharded closed loop (the multi-host TPU path of SURVEY.md §5.8,
exercised without a cluster per §4:308-310).

Both processes must complete, agree bitwise on the globally-reduced metric,
and report every solver status ok.
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_mesh(nproc: int, ndev: int, controller: str = "nominal", sym_compile: bool = False):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    if sym_compile:
        # Gloo pairs connect at the FIRST collective with a fixed transport
        # timeout. With a shared persistent compile cache, ranks that
        # cache-hit reach the collective minutes before ranks that compile
        # cold (whoever wins the first-write race), and the late ranks'
        # connects time out. Disabling the cache makes every rank compile —
        # concurrent, symmetric, skew within the transport timeout.
        env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port), str(ndev), controller],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        _, mean_lat, ok, ndev_seen = lines[-1].split()
        results.append((mean_lat, int(ok), int(ndev_seen)))

    # every process saw the full global mesh
    assert all(r[2] == nproc * ndev for r in results), results
    # bitwise-identical global reduction on every process
    assert len({r[0] for r in results}) == 1, results
    # all 8 scenarios x 3 steps solved ok
    assert all(r[1] == 8 * 3 for r in results), results
    assert float(results[0][0]) < 1.0


@pytest.mark.slow
def test_two_process_cpu_mesh_closed_loop():
    _run_mesh(nproc=2, ndev=4)


@pytest.mark.slow
def test_four_process_cpu_mesh_closed_loop():
    """4 coordinated OS processes x 1 virtual device each — the N>=2-hosts
    scaling-evidence shape of BASELINE.md, one step wider than the 2-process
    case (VERDICT r2 #5). One device per process keeps the Gloo pair count
    low; symmetric (cache-free) compiles keep the 4 ranks' arrival at the
    first collective within the transport's connect timeout on this 2-core
    container."""
    _run_mesh(nproc=4, ndev=1, sym_compile=True)
