"""Diagnose the bench lat_dev tail: per-scenario maxima on TPU f32."""
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

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
settle = 100

sim_cfg = SimConfig(sim_mode=0, T=steps * 0.02)
sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())
x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), batch)

settle_b = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, settle, key=k)))
run_b = jax.jit(jax.vmap(lambda c: sim.run_from(c, steps)))
t0 = time.time()
c0, slog = settle_b(x0m_b, x0s_b, keys)
carry, logarr = run_b(c0)
jax.block_until_ready(logarr.lat_dev)
print(f"ran in {time.time()-t0:.1f}s", file=sys.stderr)

lat = np.abs(np.array(logarr.lat_dev))
slat = np.abs(np.array(slog.lat_dev))
st = np.array(logarr.simSolverDebug[..., 4])
per = lat.max(axis=1)
print("ok frac", (st == 0).mean())
print("p50/p99/max", np.percentile(lat, 50), np.percentile(lat, 99), lat.max())
order = np.argsort(per)
M = traj.n_points
starts = np.linspace(0, M - 1, batch).astype(int)
for i in order[-10:]:
    x0 = np.array(x0m_b[i])
    print(
        f"scen {i} start={starts[i]} settle_max={slat[i].max():.2f} "
        f"run_max={per[i]:.2f} argmax={lat[i].argmax()} v0={x0[3]:.1f} "
        f"yr0={x0[5]:.3f} df0={x0[6]:.3f} a0={x0[7]:.2f} "
        f"stat={int((st[i] != 0).sum())}"
    )
