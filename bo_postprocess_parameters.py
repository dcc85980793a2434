"""Extract + reduce Pareto parameter sets from stored BO trials
(reference bo_postprocess_parameters.py analog).

    python bo_postprocess_parameters.py TRIALS_CSV [--out data/F_new.csv]
                                        [--per-group 13] [--plot fronts.png]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trials_csv")
    ap.add_argument("--out", default="data/F_new.csv")
    ap.add_argument("--per-group", type=int, default=13)
    ap.add_argument("--max-lat", type=float, default=None,
                    help="exclude Pareto points whose worst segment "
                    "|lat_dev| exceeds this margin (catalog risk control)")
    ap.add_argument("--plot", default=None)
    ap.add_argument(
        "--surrogate-plot",
        default=None,
        metavar="STEM",
        help="save GP surrogate slice figures to STEM_g0.png / STEM_g1.png "
        "(reference helpers.py surrogate visualizer parity)",
    )
    args = ap.parse_args()

    from tum_control_tpu.learn.bo.optimizer import BayesianOptimizer, BOConfig
    from tum_control_tpu.learn.bo.postprocess import export_parameter_sets, extract_pareto

    bo = BayesianOptimizer(evaluators=[], cfg=BOConfig())
    bo.load_trials(args.trials_csv)
    import numpy as np_
    n_feas = sum(bool(np_.asarray(t.feasible).any()) for t in bo.trials)
    print(f"loaded {len(bo.trials)} trials ({n_feas} any-group feasible)")

    table = export_parameter_sets(
        bo.trials, args.out, n_per_group=args.per_group, per_group_files=True,
        max_lat=args.max_lat,
    )
    print(f"exported {len(table)} parameter sets to {args.out} (+ per-group _0/_1)")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 2, figsize=(11, 5))
        for g, ax in enumerate(axs):
            Y_all = np.asarray([t.objectives[g] for t in bo.trials if np.asarray(t.feasible).reshape(-1)[g]])
            _, Yp = extract_pareto(bo.trials, g)
            if len(Y_all):
                ax.scatter(Y_all[:, 0], Y_all[:, 1], s=8, alpha=0.4, label="trials")
            if len(Yp):
                o = np.argsort(Yp[:, 0])
                ax.plot(Yp[o, 0], Yp[o, 1], "r.-", label="Pareto front")
            ax.set_title(f"segment group {g}")
            ax.set_xlabel("-max |lat_dev| [m]")
            ax.set_ylabel("-RMS vel_dev [m/s]")
            ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"front plot -> {args.plot}")

    if args.surrogate_plot:
        from tum_control_tpu.learn.bo.diagnostics import surrogate_slice_plot

        for g in (0, 1):
            out = f"{args.surrogate_plot}_g{g}.png"
            try:
                surrogate_slice_plot(bo, g, out)
                print(f"surrogate slices group {g} -> {out}")
            except ValueError as exc:
                print(f"surrogate slices group {g} skipped: {exc}")


if __name__ == "__main__":
    main()
