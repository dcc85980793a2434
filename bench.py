"""Headline benchmark: aggregate NMPC solve throughput on one TPU chip.

Measures the full closed-loop step (planner window extraction + SQP-RTI
solve + plant RK4 + state estimation) — strictly more work per solve than
the reference's 1.026 ms mean *solver-only* time (BASELINE.md) — batched
over vmapped scenarios, and prints ONE JSON line:

    {"metric": "nmpc_solves_per_sec", "value": ..., "unit": "solve/s",
     "vs_baseline": ...}

vs_baseline = our aggregate solves/s divided by the reference's equivalent
(1 / 1.026 ms = 974.7 solve/s; acados is single-stream — it has no batch
axis). Diagnostics go to stderr.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig

BASELINE_SOLVES_PER_SEC = 1.0 / 1.026e-3  # ACC24 nominal NMPC mean solve time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # batch 128 is the chip's saturation point (tools/batch_sweep.py r3:
    # 64/128/256/512/1024 -> 106/169/159/145/127 k solves/s). The sweep's
    # absolute numbers are below the README headline because it uses
    # 300-step runs (larger fixed-overhead share) and predates the current
    # qp_iters default; the canonical headline is this file's committed
    # driver run (BENCH_r*.json), batch 128 x 1000 steps.
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    settle = 100  # 2 s warm-up: controller/estimator settle before metrics

    # perf-experiment override (default = the shipped MPCConfig value)
    qp_iters = int(os.environ.get("BENCH_QP_ITERS", MPCConfig().qp_iters))
    sim_cfg = SimConfig(sim_mode=0, T=steps * 0.02)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig(qp_iters=qp_iters))
    log(f"devices: {jax.devices()}")

    # batch axis: scenarios starting at curvature-consistent states spread
    # along the lap (parallel/mesh.py::batched_scenarios)
    from tum_control_tpu.parallel.mesh import batched_scenarios

    x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    settle_b = jax.jit(
        jax.vmap(lambda a, b, k: sim.run(a, b, settle, key=k)[0])
    )
    run_b = jax.jit(jax.vmap(lambda c: sim.run_from(c, steps)))

    t0 = time.time()
    carry0 = settle_b(x0m_b, x0s_b, keys)
    carry, logarr = run_b(carry0)
    jax.block_until_ready(logarr.lat_dev)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    carry0 = settle_b(x0m_b, x0s_b, keys)
    jax.block_until_ready(carry0.x_sim)
    t0 = time.time()
    carry, logarr = run_b(carry0)
    jax.block_until_ready(logarr.lat_dev)
    dt = time.time() - t0
    solves = batch * steps
    sps = solves / dt

    status = np.array(logarr.simSolverDebug[..., 4])
    ok_frac = float((status == 0).mean())
    lat = np.abs(np.array(logarr.lat_dev))
    log(f"batch={batch} steps={steps}: {dt:.3f}s -> {sps:.0f} solves/s")
    log(f"solver ok fraction: {ok_frac:.4f}; lat_dev p50/p99: "
        f"{np.percentile(lat, 50):.3f}/{np.percentile(lat, 99):.3f} m")

    # single-stream latency for reference (force a host fetch of the result:
    # through the axon tunnel block_until_ready alone has been observed to
    # return early on a second identical-args call)
    run_1 = jax.jit(lambda a, b: sim.run(a, b, steps))
    c1, l1 = run_1(x0m, x0s)  # compile
    float(np.asarray(l1.lat_dev).sum())
    t0 = time.time()
    c1, l1 = run_1(x0m + 1e-6, x0s + 1e-6)
    s = float(np.asarray(l1.lat_dev).sum())
    log(f"single-stream per-step latency: {(time.time()-t0)/steps*1e3:.3f} ms")

    # --- SNMPC / R2NMPC batched throughput (BASELINE.md: SNMPC 6.178 ms
    # mean single-stream in the reference) ---
    for name, base_ms in (("snmpc", 6.178), ("rnmpc", 1.026)):
        try:
            steps_c = min(steps, 300)
            sim_c, *_ = build_simulation(
                SimConfig(sim_mode=0, T=steps_c * 0.02), MPCConfig(controller=name)
            )
            run_c = jax.jit(
                jax.vmap(lambda a, b, k: sim_c.run(a, b, steps_c, key=k))
            )
            carry_c, log_c = run_c(x0m_b, x0s_b, keys)
            jax.block_until_ready(log_c.lat_dev)
            t0 = time.time()
            carry_c, log_c = run_c(x0m_b, x0s_b, keys)
            jax.block_until_ready(log_c.lat_dev)
            dt_c = time.time() - t0
            sps_c = batch * steps_c / dt_c
            ok_c = float((np.array(log_c.simSolverDebug[..., 4]) == 0).mean())
            log(
                f"{name}: {sps_c:.0f} solves/s (batch={batch}, steps={steps_c}), "
                f"ok={ok_c:.4f}, vs_ref_single_stream={sps_c * base_ms / 1e3:.1f}x"
            )
        except Exception as exc:  # pragma: no cover
            log(f"{name} bench failed: {exc}")

    print(
        json.dumps(
            {
                "metric": "nmpc_solves_per_sec",
                "value": round(sps, 1),
                "unit": "solve/s",
                "vs_baseline": round(sps / BASELINE_SOLVES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
