"""Regenerate ACC24-style evaluation artifacts from full_logs.npz runs.

Equivalent of the reference's Papers_Plots/ACC24_SNMPC scripts
(generate_runtimes.py, generate_boxplotsv2.py, generate_simRes.py,
generate_gg.py, generate_solver_plots.py): consumes any set of run
directories containing full_logs.npz — the committed reference goldens
and/or runs produced by this framework (the npz layouts match) — and emits
the solver-runtime table + comparison boxplots + result/gg figures.

    python scripts/acc24_figures.py RUN_DIR [RUN_DIR ...] --out OUT_DIR
"""
import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_runs(run_dirs):
    runs = {}
    for d in run_dirs:
        path = os.path.join(d, "full_logs.npz")
        if os.path.exists(path):
            runs[os.path.basename(os.path.normpath(d))] = dict(np.load(path))
    return runs


def runtimes_table(runs, out_path):
    """solver_time_experiments.csv analog (generate_runtimes.py:47-85)."""
    rows = ["run,mean_ms,max_ms,p99_ms,ok_frac"]
    for name, logs in runs.items():
        t = logs["simSolverDebug"][:, 1] * 1e3
        ok = (logs["simSolverDebug"][:, 4] == 0).mean()
        rows.append(
            f"{name},{t.mean():.3f},{t.max():.3f},{np.percentile(t, 99):.3f},{ok:.4f}"
        )
    with open(out_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")


def deviation_boxplots(runs, out_path):
    fig, axs = plt.subplots(1, 3, figsize=(4 + 2 * len(runs), 4.5))
    names = list(runs)
    for ax, key, title in zip(
        axs, ["dev_lat", "dev_vel", "dev_yaw"], ["lateral dev [m]", "velocity dev [m/s]", "yaw dev [rad]"]
    ):
        ax.boxplot([np.abs(runs[n][key]) for n in names], tick_labels=names, showfliers=False)
        ax.set_title(title)
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def gg_diagrams(runs, out_path):
    fig, axs = plt.subplots(1, len(runs), figsize=(5 * len(runs), 4.5), squeeze=False)
    for ax, (name, logs) in zip(axs[0], runs.items()):
        alat = logs["a_lat"][1:]
        alon = logs["MPC_SimX"][1:, 7]
        ax.scatter(alat, alon, s=1.5, c=logs["t"], cmap="viridis")
        ax.set_title(name)
        ax.set_xlabel("a_lat [m/s2]")
        ax.set_ylabel("a_lon [m/s2]")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default="Logs/acc24_figures")
    args = ap.parse_args()
    runs = load_runs(args.run_dirs)
    if not runs:
        print("no full_logs.npz found in the given directories")
        return
    os.makedirs(args.out, exist_ok=True)
    runtimes_table(runs, os.path.join(args.out, "solver_time_experiments.csv"))
    deviation_boxplots(runs, os.path.join(args.out, "SimResBoxplots.png"))
    gg_diagrams(runs, os.path.join(args.out, "gg_diagrams.png"))
    print(f"wrote artifacts for {len(runs)} runs to {args.out}")


if __name__ == "__main__":
    main()
