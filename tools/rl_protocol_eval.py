"""WMPC evaluation at the reference's own protocol (VERDICT r3 #7).

The reference trains on monteblanco+modena (rl_training.py:66) and
evaluates trained policies with full-lap rollouts (RL_WMPC/evaluation.py:
65-105, `run_policy`). This tool runs the full protocol for a set of
policies: full T-second laps (default 120 s, the ACC24 golden window, >= 1
lap) on ALL THREE tracks, reporting per-track dev_lat RMS/max and dev_vel
RMS for

  * static weights (the shipped MPC_params.yaml point, no WMPC),
  * the converted reference SB3 policy (new_BO_F),
  * the self-trained pure-JAX PPO seeds.

Run: python tools/rl_protocol_eval.py [T] [model_dir ...]   (CPU f64)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("RL_EVAL_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig

TRACKS = ("monteblanco", "modena", "lvms")
DEFAULT_MODELS = (
    "data/wmpc_models/new_BO_F",
    "data/wmpc_models/jax_ppo_r2",
    "data/wmpc_models/jax_ppo_s1",
    "data/wmpc_models/jax_ppo_s2",
)


def run_one(track: str, T: float, model_dir: str = None):
    sim_cfg = SimConfig(
        sim_mode=0, T=T,
        track_file=f"track_{track}.json",
        ref_traj_file=f"reftraj_{track}_edgar.json",
    )
    mpc_cfg = (
        MPCConfig(enable_WMPC=True, WMPC_model=model_dir)
        if model_dir else MPCConfig()
    )
    sim, x0m, x0s, *_ = build_simulation(sim_cfg, mpc_cfg)
    n = sim_cfg.Nsim
    carry, log = jax.jit(lambda k: sim.run(x0m, x0s, n, key=k))(jax.random.PRNGKey(0))
    lat = np.asarray(log.lat_dev)
    vel = np.asarray(log.vel_dev)
    ok = float(np.mean(np.asarray(log.simSolverDebug[:, 4]) == 0))
    return (
        float(np.sqrt((lat**2).mean())), float(np.abs(lat).max()),
        float(np.sqrt((vel**2).mean())), ok,
    )


def main():
    T = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    models = sys.argv[2:] or [m for m in DEFAULT_MODELS if os.path.exists(m)]
    rows = [("static (MPC_params.yaml)", None)] + [
        (os.path.basename(m), m) for m in models
    ]
    print(f"full {T:.0f} s laps, all tracks  (lat RMS / lat max / vel RMS / ok%)")
    agg = {}
    for name, mdir in rows:
        cells = []
        for track in TRACKS:
            t0 = time.time()
            r, mx, v, ok = run_one(track, T, mdir)
            cells.append(f"{track[:5]}: {r:.3f}/{mx:.3f}/{v:.3f}/{ok*100:.0f}%")
            agg.setdefault(name, []).append((r, mx))
        mean_rms = np.mean([a[0] for a in agg[name]])
        worst_max = np.max([a[1] for a in agg[name]])
        print(
            f"{name:26s} {'  '.join(cells)}  | mean RMS {mean_rms:.3f}, "
            f"worst max {worst_max:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
