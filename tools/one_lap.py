import os, sys
sys.path.insert(0, "/root/repo")
import time
import jax
import numpy as np
from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
track, ctrl, T = sys.argv[1], sys.argv[2], float(sys.argv[3])
sim_cfg = SimConfig(sim_mode=0, T=T, track_file=f"track_{track}.json",
                    ref_traj_file=f"reftraj_{track}_edgar.json")
t0=time.time()
sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig(controller=ctrl))
print("build", time.time()-t0, "M:", traj.n_points, flush=True)
n = sim_cfg.Nsim
run = jax.jit(lambda key: sim.run(x0m, x0s, n, key=key))
t0=time.time()
carry, log = run(jax.random.PRNGKey(0))
jax.block_until_ready(log.lat_dev)
wall=time.time()-t0
lat = np.abs(np.asarray(log.lat_dev)); vel = np.abs(np.asarray(log.vel_dev))
ok = float(np.mean(np.asarray(log.simSolverDebug[:,4])==0))
print(f"{track} {ctrl} dev_lat mean/max {lat.mean():.3f}/{lat.max():.3f} "
      f"dev_vel mean {vel.mean():.3f} ok {ok*100:.1f}% wall {wall:.1f}s", flush=True)
