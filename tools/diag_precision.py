"""Bisect the TPU f32 tail: does forcing f32-exact MXU matmuls fix it?"""
import os
import sys

import jax

if "--highest" in sys.argv:
    jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.parallel.mesh import batched_scenarios

steps, settle = 300, 100
sim_cfg = SimConfig(sim_mode=0, T=steps * 0.02)
sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())
x0m_b, x0s_b = batched_scenarios(traj, 256, dtype=jnp.float32)
idx = jnp.asarray([213, 202, 242, 199, 211])
a_b, b_b = x0m_b[idx], x0s_b[idx]
keys = jax.random.split(jax.random.PRNGKey(0), len(idx))
settle_b = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, settle, key=k)[0]))
run_b = jax.jit(jax.vmap(lambda c: sim.run_from(c, steps)))
c0 = settle_b(a_b, b_b, keys)
carry, log = run_b(c0)
lat = np.abs(np.array(log.lat_dev))
st = np.array(log.simSolverDebug[..., 4])
mode = "highest" if "--highest" in sys.argv else "default"
for j, scen in enumerate([213, 202, 242, 199, 211]):
    print(
        f"[{mode}] scen {scen}: run_max={lat[j].max():.3f} at {lat[j].argmax()}, "
        f"ok={int((st[j] == 0).all())}"
    )
