"""Full-lap closed-loop evaluation on all three reference tracks
(BASELINE.md target: Monteblanco, Modena, LVMS) for every controller.

Run: python tools/multitrack_eval.py [T_seconds]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig


def main():
    T = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    for track in ("monteblanco", "modena", "lvms"):
        for ctrl in ("nominal", "snmpc", "rnmpc"):
            sim_cfg = SimConfig(
                sim_mode=0, T=T,
                track_file=f"track_{track}.json",
                ref_traj_file=f"reftraj_{track}_edgar.json",
            )
            sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig(controller=ctrl))
            n = sim_cfg.Nsim
            run = jax.jit(lambda key: sim.run(x0m, x0s, n, key=key))
            t0 = time.time()
            carry, log = run(jax.random.PRNGKey(0))
            jax.block_until_ready(log.lat_dev)
            wall = time.time() - t0
            lat = np.abs(np.asarray(log.lat_dev))
            vel = np.abs(np.asarray(log.vel_dev))
            ok = float(np.mean(np.asarray(log.simSolverDebug[:, 4]) == 0))
            print(
                f"{track:12s} {ctrl:8s} dev_lat mean/max {lat.mean():.3f}/{lat.max():.3f} "
                f"dev_vel mean {vel.mean():.3f} ok {ok*100:.1f}% wall {wall:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
