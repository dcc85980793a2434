import sys, time
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig

K = int(sys.argv[1])
sim_cfg = SimConfig(sim_mode=0, T=100.0)
mpc_cfg = MPCConfig(sqp_iters=K)
sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, mpc_cfg)
n = sim_cfg.Nsim
run = jax.jit(lambda key: sim.run(x0m, x0s, n, key=key))
t0=time.time()
carry, log = run(jax.random.PRNGKey(0))
jax.block_until_ready(log.lat_dev)
wall=time.time()-t0
lat = np.abs(np.asarray(log.lat_dev)); vel = np.abs(np.asarray(log.vel_dev))
ok = np.mean(np.asarray(log.simSolverDebug[:,4])==0)
print(f"sqp_iters={K} dev_lat mean/max {lat.mean():.4f}/{lat.max():.4f} "
      f"dev_vel mean {vel.mean():.4f} ok {ok*100:.1f}% wall {wall:.1f}s")
