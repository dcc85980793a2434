"""Post-precision-fix IPM iteration sweep: throughput + tail quality.

The qp_iters=6 default was tuned in round 1 *with* the MXU precision defect
(docs/RESULTS.md); with exact gradient products fewer iterations may reach
the same closed-loop quality. Measures batch-256 throughput and lat_dev
p50/p99 over 1000 steps (2 s settle) per iteration count.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.parallel.mesh import batched_scenarios

batch, steps, settle = 256, 1000, 100
counts = [int(v) for v in sys.argv[1:]] or [4, 5, 6]

for it in counts:
    sim_cfg = SimConfig(sim_mode=0, T=steps * 0.02)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig(qp_iters=it))
    x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    settle_b = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, settle, key=k)[0]))
    run_b = jax.jit(jax.vmap(lambda c: sim.run_from(c, steps)))
    c0 = settle_b(x0m_b, x0s_b, keys)
    carry, log = run_b(c0)
    jax.block_until_ready(log.lat_dev)
    c0 = settle_b(x0m_b, x0s_b, keys)
    jax.block_until_ready(c0.x_sim)
    t0 = time.time()
    carry, log = run_b(c0)
    jax.block_until_ready(log.lat_dev)
    dt = time.time() - t0
    lat = np.abs(np.array(log.lat_dev))
    ok = float((np.array(log.simSolverDebug[..., 4]) == 0).mean())
    print(
        f"qp_iters={it}: {batch*steps/dt:.0f} solves/s, ok={ok:.4f}, "
        f"lat p50/p99/max = {np.percentile(lat,50):.3f}/"
        f"{np.percentile(lat,99):.3f}/{lat.max():.3f} m",
        flush=True,
    )
