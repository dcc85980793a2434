"""Validate the WMPC action catalogs UNDER DISTURBANCE (VERDICT r4 #6).

The reference validates its weight catalogs on nominal laps only
(Learning_To_Adapt/SafeRL_WMPC/_baseline/ holds noise-free sweeps), yet a
weights-varying controller will index the catalog mid-disturbance. This
sweeps every set of each catalog under the reference's state-estimation
noise envelope (Config/EDGAR/sim_main_params.yaml:50-67, gaussian), with
N seeds per (set, track), fully batched as one vmapped device program:

    (sets x tracks x seeds) closed loops -> worst-case max|lat_dev| and
    solver-success per set, plus the per-catalog worst case.

    python tools/catalog_noise_validation.py [--T 40] [--seeds 3]
           [--catalogs data/F.csv data/F_jax_r4.csv data/F_jax_r4_lowrisk.csv]

Writes Logs/catalog_noise_r5.json and prints a per-catalog table.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=float, default=40.0)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tracks", nargs="+", default=["monteblanco", "modena", "lvms"])
    ap.add_argument(
        "--catalogs", nargs="+",
        default=["data/F.csv", "data/F_jax_r4.csv", "data/F_jax_r4_lowrisk.csv"],
    )
    ap.add_argument("--out", default="Logs/catalog_noise_r5.json")
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

    # reference SE-noise envelope, gaussian (sim_main_params.yaml:50-67)
    sim_cfg = SimConfig(sim_mode=0, T=args.T, simulate_state_estimation=True)
    sim, *_ = build_simulation(sim_cfg, MPCConfig())
    n_steps = sim_cfg.Nsim
    stacked = stack_trajectories(
        [
            load_ref_trajectory(
                os.path.join(sim_cfg.trajectory_path, f"reftraj_{t}_edgar.json")
            )
            for t in args.tracks
        ]
    )
    n_tracks = len(args.tracks)

    def run_one(p, track_idx, seed):
        traj = jax.tree.map(lambda a: a[track_idx], stacked)
        mods = params_to_mods(sim.controller.engine, p)
        px = traj.pos[0]
        x0m = jnp.concatenate(
            [px, jnp.stack([jnp.mod(traj.yaw[0], 2 * jnp.pi), traj.v[0]]),
             jnp.zeros(4, px.dtype)]
        )
        carry = sim.init_carry(x0m, x0m[:7], jax.random.PRNGKey(seed))

        def step(c, i):
            c, log = sim.step(
                c, (i, jnp.zeros(7, px.dtype), jnp.zeros(7, px.dtype)),
                traj=traj, mods=mods,
            )
            return c, (log.lat_dev, log.simSolverDebug[4])

        _, (lat, status) = jax.lax.scan(step, carry, jnp.arange(n_steps))
        return jnp.max(jnp.abs(lat)), jnp.mean((status == 0).astype(px.dtype))

    # ONE flattened batch axis (sets x tracks x seeds), padded to a multiple
    # of 128 — the Pallas kernels' native lane width
    runner_flat = jax.jit(jax.vmap(run_one, in_axes=(0, 0, 0)))

    def runner(table_j, tracks_idx, seeds):
        S, Tk, Sd = table_j.shape[0], tracks_idx.shape[0], seeds.shape[0]
        p = jnp.repeat(table_j, Tk * Sd, axis=0)
        tr = jnp.tile(jnp.repeat(tracks_idx, Sd), S)
        se = jnp.tile(seeds, S * Tk)
        n = S * Tk * Sd
        pad = (-n) % 128
        if pad:
            p = jnp.concatenate([p, jnp.tile(p[:1], (pad, 1))])
            tr = jnp.concatenate([tr, jnp.tile(tr[:1], (pad,))])
            se = jnp.concatenate([se, jnp.tile(se[:1], (pad,))])
        ml, ok = runner_flat(p, tr, se)
        return ml[:n].reshape(S, Tk, Sd), ok[:n].reshape(S, Tk, Sd)

    seeds = jnp.arange(args.seeds, dtype=jnp.int32)
    tracks_idx = jnp.arange(n_tracks, dtype=jnp.int32)
    report = {"T": args.T, "seeds": args.seeds, "tracks": args.tracks,
              "noise": "gaussian SE envelope sim_main_params.yaml:50-67",
              "catalogs": {}}
    for cat in args.catalogs:
        table = load_param_table(os.path.join(cfg_mod.REPO_ROOT, cat))
        maxlat, okfrac = runner(jnp.asarray(table), tracks_idx, seeds)
        maxlat = np.asarray(maxlat)      # (sets, tracks, seeds)
        okfrac = np.asarray(okfrac)
        per_set_worst = maxlat.max(axis=(1, 2))
        per_set_ok = okfrac.min(axis=(1, 2))
        crashed = np.nonzero((per_set_worst > 2.0) | (per_set_ok < 1.0))[0]
        report["catalogs"][cat] = {
            "n_sets": int(len(table)),
            "worst_max_lat_dev": float(per_set_worst.max()),
            "median_max_lat_dev": float(np.median(per_set_worst)),
            "min_solver_ok": float(per_set_ok.min()),
            "sets_flagged": [int(i) for i in crashed],
            "per_set_worst": [round(float(v), 3) for v in per_set_worst],
            "per_set_ok": [round(float(v), 4) for v in per_set_ok],
        }
        print(
            f"{cat}: {len(table)} sets, worst max|lat_dev| "
            f"{per_set_worst.max():.3f} m (median {np.median(per_set_worst):.3f}), "
            f"min solver-ok {per_set_ok.min():.4f}, flagged sets: {list(crashed)}",
            flush=True,
        )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
