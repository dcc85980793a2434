"""Evaluate a WMPC policy on a full closed-loop run.

    python tools/wmpc_eval.py <model_dir> [T] [track]
    WMPC_EVAL_ACTIONS_PLOT=path.png python tools/wmpc_eval.py ...

Runs enable_WMPC=True with the given model directory (policy_weights.npz +
optional rl_config.yaml with actions_file) and prints dev_lat RMS/max +
dev_vel RMS — the docs/RESULTS.md WMPC comparison metrics. With
WMPC_EVAL_ACTIONS_PLOT set, also saves the policy action-probability trace
figure (learn.evaluation.action_probability_trace).
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig

model_dir = sys.argv[1]
T = float(sys.argv[2]) if len(sys.argv) > 2 else 40.0
track = sys.argv[3] if len(sys.argv) > 3 else "monteblanco"

sim_cfg = SimConfig(
    sim_mode=0, T=T,
    track_file=f"track_{track}.json", ref_traj_file=f"reftraj_{track}_edgar.json",
)
mpc_cfg = MPCConfig(enable_WMPC=True, WMPC_model=model_dir)
sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, mpc_cfg)
n = sim_cfg.Nsim
run = jax.jit(lambda key: sim.run(x0m, x0s, n, key=key))
t0 = time.time()
carry, log = run(jax.random.PRNGKey(0))
jax.block_until_ready(log.lat_dev)
wall = time.time() - t0
lat = np.asarray(log.lat_dev)
vel = np.asarray(log.vel_dev)
ok = float(np.mean(np.asarray(log.simSolverDebug[:, 4]) == 0))
print(
    f"{model_dir} on {track} ({T:.0f}s): dev_lat RMS/max "
    f"{np.sqrt((lat**2).mean()):.3f}/{np.abs(lat).max():.3f} m, "
    f"dev_vel RMS {np.sqrt((vel**2).mean()):.3f} m/s, ok {ok*100:.1f}%, "
    f"wall {wall:.1f}s",
    flush=True,
)

plot = os.environ.get("WMPC_EVAL_ACTIONS_PLOT")
if plot:
    from tum_control_tpu.learn.evaluation import action_probability_trace

    action_probability_trace(model_dir, track=track, T=T, plot_path=plot)
    print(f"action-probability trace -> {plot}", flush=True)
