"""Multi-objective BO of NMPC cost weights (reference bo_optimize.py analog).

    python bo_optimize.py [--initial 50] [--iterations 400] [--batch 5]
                          [--out Logs/bo_trials.csv] [--cpu] [--smoke]

Each candidate weight set is evaluated by batched on-device closed-loop
rollouts over curvature-segmented track pieces (high/low curvature groups,
alternating per iteration). Replaces the reference's 8-process acados pool
with one vmapped TPU program per evaluation batch.
"""
import argparse
import os

import numpy as np

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--initial", type=int, default=50)
    ap.add_argument("--iterations", type=int, default=400)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--out", default="Logs/bo_trials.csv")
    ap.add_argument("--export", default=None, help="export reduced Pareto sets to CSV")
    ap.add_argument("--resume", default=None, help="load trials CSV before optimizing")
    ap.add_argument("--seed-params", default=None,
                    help="CSV of known parameter sets to evaluate as initial trials "
                         "(the reference's boundary-sampling warm start)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig
    from tum_control_tpu.learn.bo.objective import ObjectiveEvaluator, make_segment_batch
    from tum_control_tpu.learn.bo.optimizer import BayesianOptimizer, BOConfig
    from tum_control_tpu.learn.bo.segmentation import get_train_segments
    from tum_control_tpu.track.trajectory import load_ref_trajectory, stack_trajectories

    sim_cfg = SimConfig(sim_mode=0)
    sim, *_ = build_simulation(sim_cfg, MPCConfig())
    tracks = ["modena", "monteblanco"]
    stacked = stack_trajectories(
        [
            load_ref_trajectory(
                os.path.join(sim_cfg.trajectory_path, f"reftraj_{t}_edgar.json")
            )
            for t in tracks
        ]
    )
    groups = get_train_segments(tracks=tracks)
    if args.smoke:
        groups = [g[:2] for g in groups]
    print(f"segments: high-curv {len(groups[0])}, low-curv {len(groups[1])}")

    max_steps = 120 if args.smoke else 1500
    evaluator = ObjectiveEvaluator(sim, stacked, max_steps=max_steps)

    evaluators = []
    for g in groups:
        seg = make_segment_batch(g, tracks)
        evaluators.append(
            lambda p, seg=seg: evaluator.evaluate(jax.numpy.asarray(p), seg)
        )

    cfg = BOConfig(
        n_initial=4 if args.smoke else args.initial,
        n_bayesian_optimization=2 if args.smoke else args.iterations,
        batch_size=2 if args.smoke else args.batch,
        n_mc=16 if args.smoke else 64,
    )
    bo = BayesianOptimizer(evaluators, cfg)
    if args.resume and os.path.exists(args.resume):
        bo.load_trials(args.resume)
    else:
        if args.seed_params:
            seeds = np.loadtxt(args.seed_params, delimiter=",")
            bo._evaluate(bo._norm(seeds), group=0)
            print(f"seeded {len(seeds)} known parameter sets")
        bo.generate_initial_data()
        n_feas = sum(bool(np.asarray(t.feasible).any()) for t in bo.trials)
        print(f"initial data: {len(bo.trials)} trials, any-group feasible {n_feas}")

    for it in range(cfg.n_bayesian_optimization):
        bo.step(it)
        hv = [bo.hypervolume(g) for g in range(2)]
        nf = [
            sum(bool(np.asarray(t.feasible).reshape(-1)[g]) for t in bo.trials)
            for g in range(2)
        ]
        print(f"iter {it}: trials={len(bo.trials)} feasible/group={nf} "
              f"hypervolume={hv}", flush=True)
        bo.store_trials(args.out)

    if args.export:
        from tum_control_tpu.learn.bo.postprocess import export_parameter_sets

        table = export_parameter_sets(bo.trials, args.export)
        print(f"exported {len(table)} parameter sets to {args.export}")


if __name__ == "__main__":
    main()
