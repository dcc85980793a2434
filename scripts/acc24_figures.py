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


def track_layout(out_path, track_file="track_monteblanco.json", ref_file="reftraj_monteblanco_edgar.json"):
    """Track layout figure (Monteblanco_Layoutplot.py analog): boundaries +
    reference line colored by speed, rotated so the start heading is
    horizontal, with start marker and direction arrow."""
    import json

    traj_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "data", "Trajectories")
    with open(os.path.join(traj_dir, track_file)) as fh:
        trk = json.load(fh)
    with open(os.path.join(traj_dir, ref_file)) as fh:
        ref = json.load(fh)

    yaw0 = float(np.asarray(ref["ref_yaw"])[0])
    ang = -yaw0 + np.pi
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])

    def rot(x, y):
        p = R @ np.stack([np.asarray(x), np.asarray(y)])
        return p[0], p[1]

    fig, ax = plt.subplots(figsize=(10, 6))
    for xs, ys in ((trk["X_i"], trk["Y_i"]), (trk["X_o"], trk["Y_o"])):
        ax.plot(*rot(xs, ys), "k-", lw=0.8)
    rx, ry = rot(ref["pos_x"], ref["pos_y"])
    v = np.asarray(ref["ref_v"])
    sc = ax.scatter(rx, ry, c=v, s=2.0, cmap="viridis")
    fig.colorbar(sc, ax=ax, label="ref. velocity [m/s]")
    ax.plot(rx[0], ry[0], "r*", ms=14, label="start")
    k = min(25, len(rx) - 1)
    ax.annotate(
        "", xy=(rx[k], ry[k]), xytext=(rx[0], ry[0]),
        arrowprops=dict(arrowstyle="-|>", color="r", lw=2),
    )
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend(loc="best")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def uncertainty_propagation_figure(out_path):
    """SNMPC uncertainty-propagation illustration
    (generate_uncertainty_propagation_plots.py analog), built from *real*
    propagated PCE samples instead of hand-drawn sinusoids: the initial-state
    fan is stepped through the SNMPC discrete dynamics; sample spread, PCE
    mean, the mean + kappa*sigma chance-constraint surrogate and the
    UPH freeze are all shown on the yaw-rate channel (the disturbed state
    with the most visible spread)."""
    import jax
    import jax.numpy as jnp

    from tum_control_tpu.api import build_controller
    from tum_control_tpu.config import MPCConfig, SimConfig

    mpc_cfg = MPCConfig(controller="snmpc", uncertainty_propagation_horizon=8)
    sim_cfg = SimConfig()
    ctrl = build_controller(mpc_cfg, sim_cfg)
    x0 = jnp.asarray([0.0, 0.0, 0.0, 22.0, 0.0, 0.0, 0.04, 0.3])
    stacked = ctrl._fan(x0)
    u = jnp.asarray([0.0, 0.05])
    f = jax.jit(ctrl.engine.funcs.dyn_step)

    n_steps = 14
    traj = [np.asarray(stacked).reshape(-1, 8)]
    xk = stacked
    for k in range(n_steps):
        xk = f(jnp.asarray(k), xk, u)
        traj.append(np.asarray(xk).reshape(-1, 8))
    traj = np.stack(traj)  # (n_steps+1, ns1, 8)

    ch = 5  # yaw rate: disturbed channel with visible spread
    t = np.arange(n_steps + 1) * sim_cfg.Ts_MPC
    uph = mpc_cfg.uncertainty_propagation_horizon
    kappa = float(np.sqrt((1 - mpc_cfg.gamma) / mpc_cfg.gamma))

    fig, ax = plt.subplots(figsize=(9, 5))
    for s in range(1, traj.shape[1]):
        ax.plot(t, traj[:, s, ch], color="0.65", lw=0.8,
                label="PCE samples" if s == 1 else None)
    mean = traj[:, 0, ch]
    std = traj[:, 1:, ch].std(axis=1)
    ax.plot(t, mean, "b-", lw=2, label="nominal (PCE mean)")
    ax.fill_between(t, mean - kappa * std, mean + kappa * std, color="b",
                    alpha=0.15, label=r"mean $\pm\,\kappa\sigma$ surrogate")
    ax.axvline(uph * sim_cfg.Ts_MPC, color="r", ls="--",
               label=f"UPH (samples freeze), node {uph}")
    ax.set_xlabel("prediction time [s]")
    ax.set_ylabel("yaw rate [rad/s]")
    ax.legend(loc="best", fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="*", default=[])
    ap.add_argument("--out", default="Logs/acc24_figures")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)
    runs = load_runs(args.run_dirs)
    if runs:
        runtimes_table(runs, os.path.join(args.out, "solver_time_experiments.csv"))
        deviation_boxplots(runs, os.path.join(args.out, "SimResBoxplots.png"))
        gg_diagrams(runs, os.path.join(args.out, "gg_diagrams.png"))
    # run-independent paper figures
    track_layout(os.path.join(args.out, "Monteblanco_Layout.png"))
    uncertainty_propagation_figure(
        os.path.join(args.out, "Uncertainty_Propagation.png")
    )
    print(f"wrote artifacts ({len(runs)} runs) to {args.out}")


if __name__ == "__main__":
    main()
