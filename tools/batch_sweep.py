"""Chip-saturation sweep: nominal closed-loop throughput vs batch size.

Substantiates the docs/RESULTS.md scaling claim with committed numbers
(VERDICT r2 #5): runs the same settle+measure protocol as bench.py at a
range of batch sizes on the real chip and prints a table.

    python tools/batch_sweep.py [batches...]   (default 64 128 256 512 1024)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.parallel.mesh import batched_scenarios


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    steps, settle = 300, 100
    sim_cfg = SimConfig(sim_mode=0, T=steps * 0.02)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())
    print(f"devices: {jax.devices()}  steps={steps}", flush=True)
    print(f"{'batch':>6} {'solves/s':>10} {'us/solve':>9} {'rel_eff':>8} {'p99 lat_dev':>12}")
    base = None
    TILE = 512  # VMEM-optimal sub-program batch: beyond it the step's
    # inter-kernel intermediates spill to HBM (roofline r4: -33% at 1024).
    # Larger scenario counts tile across sequential 512-wide sub-programs
    # via lax.map, holding per-scenario throughput flat instead.
    for batch in batches:
        x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        settle_b = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, settle, key=k)[0]))
        if batch > TILE:
            tiles = batch // TILE

            def run_b_fn(c):
                ct = jax.tree.map(
                    lambda a: a.reshape((tiles, TILE) + a.shape[1:]), c
                )
                out = jax.lax.map(
                    lambda cc: jax.vmap(lambda x: sim.run_from(x, steps))(cc), ct
                )
                return jax.tree.map(
                    lambda a: a.reshape((batch,) + a.shape[2:]), out
                )

            run_b = jax.jit(run_b_fn)
        else:
            run_b = jax.jit(jax.vmap(lambda c: sim.run_from(c, steps)))
        c0 = settle_b(x0m_b, x0s_b, keys)
        _, lg = run_b(c0)
        jax.block_until_ready(lg.lat_dev)  # compile + warm
        c0 = settle_b(x0m_b, x0s_b, keys)
        jax.block_until_ready(c0.x_sim)
        t0 = time.time()
        _, lg = run_b(c0)
        jax.block_until_ready(lg.lat_dev)
        dt = time.time() - t0
        sps = batch * steps / dt
        per = dt / (batch * steps) * 1e6
        if base is None:
            base = sps / batch  # per-scenario rate at the smallest batch
        eff = sps / (batch * base)
        p99 = float(np.percentile(np.abs(np.asarray(lg.lat_dev)), 99))
        print(f"{batch:>6} {sps:>10.0f} {per:>9.2f} {eff:>8.2f} {p99:>12.3f}", flush=True)


if __name__ == "__main__":
    main()
