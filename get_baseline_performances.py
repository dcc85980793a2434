"""Baseline sweep: every WMPC parameter set over full laps, fully batched.

Reference analog: Learning_To_Adapt/SafeRL_WMPC/get_baseline_performances.py
runs 26 parameter sets x tracks sequentially (one acados closed loop each)
and stores per-set npz logs. Here the whole (parameter set x track) product
is ONE vmapped device program.

    python get_baseline_performances.py [--T 40] [--tracks monteblanco lvms]
                                        [--out Logs/baseline] [--cpu]
"""
import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=float, default=40.0)
    ap.add_argument("--tracks", nargs="+", default=["monteblanco", "lvms"])
    ap.add_argument("--params", default="data/F.csv")
    ap.add_argument("--out", default="Logs/baseline")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tum_control_tpu import config as cfg_mod
    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig
    from tum_control_tpu.learn.bo.objective import params_to_mods
    from tum_control_tpu.learn.wmpc import load_param_table
    from tum_control_tpu.track.trajectory import load_ref_trajectory, stack_trajectories

    sim_cfg = SimConfig(sim_mode=0, T=args.T)
    sim, *_ = build_simulation(sim_cfg, MPCConfig())
    n_steps = sim_cfg.Nsim
    table = load_param_table(os.path.join(cfg_mod.REPO_ROOT, args.params))
    stacked = stack_trajectories(
        [
            load_ref_trajectory(
                os.path.join(sim_cfg.trajectory_path, f"reftraj_{t}_edgar.json")
            )
            for t in args.tracks
        ]
    )
    n_sets, n_tracks = len(table), len(args.tracks)
    print(f"sweeping {n_sets} parameter sets x {n_tracks} tracks x {n_steps} steps")

    def run_one(p, track_idx):
        traj = jax.tree.map(lambda a: a[track_idx], stacked)
        mods = params_to_mods(sim.controller.engine, p)
        px = traj.pos[0]
        x0m = jnp.concatenate(
            [px, jnp.stack([jnp.mod(traj.yaw[0], 2 * jnp.pi), traj.v[0]]), jnp.zeros(4, px.dtype)]
        )
        carry = sim.init_carry(x0m, x0m[:7], jax.random.PRNGKey(0))

        def step(c, i):
            c, log = sim.step(
                c, (i, jnp.zeros(7, px.dtype), jnp.zeros(7, px.dtype)), traj=traj, mods=mods
            )
            return c, (log.lat_dev, log.vel_dev, log.simU, log.simSolverDebug[4])

        _, (lat, vel, U, status) = jax.lax.scan(step, carry, jnp.arange(n_steps))
        return lat, vel, U, status

    runner = jax.jit(
        jax.vmap(jax.vmap(run_one, in_axes=(None, 0)), in_axes=(0, None))
    )
    lat, vel, U, status = runner(
        jnp.asarray(table), jnp.arange(n_tracks, dtype=jnp.int32)
    )
    lat, vel, status = np.asarray(lat), np.asarray(vel), np.asarray(status)

    os.makedirs(args.out, exist_ok=True)
    for ti, tname in enumerate(args.tracks):
        tdir = os.path.join(args.out, tname)
        os.makedirs(tdir, exist_ok=True)
        for si in range(n_sets):
            np.savez(
                os.path.join(tdir, f"{si}.npz"),
                lat_devs=lat[si, ti],
                vel_devs=vel[si, ti],
                simU=np.asarray(U)[si, ti],
                status=status[si, ti],
                params=table[si],
            )
        summary = np.stack(
            [
                np.abs(lat[:, ti]).max(axis=1),
                np.sqrt((vel[:, ti] ** 2).mean(axis=1)),
                (status[:, ti] == 0).mean(axis=1),
            ],
            axis=1,
        )
        np.savetxt(
            os.path.join(tdir, "summary.csv"),
            summary,
            delimiter=",",
            header="max_lat_dev,rms_vel_dev,solver_ok_frac",
        )
        print(f"{tname}: max|lat| range [{summary[:,0].min():.3f}, {summary[:,0].max():.3f}] m")


if __name__ == "__main__":
    main()
