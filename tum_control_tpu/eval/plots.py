"""Offline result plots, mirroring the reference's evaluation figures
(Utils/MPC_sim_utils.py:490-776: plotRes result grid, BoxPlots deviation
boxplots, plotMPCperf solver KPIs, plotTrackSim track heatmap).

Host-side matplotlib on assembled log dicts; every figure is saved headless
(Agg) into the run directory.
"""
from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_results_grid(logs, path):
    """3x3 grid: trajectory, velocity, yaw, controls, accelerations, devs."""
    t = logs["t"]
    CiLX, REF, U = logs["CiLX"], logs["simREF"], logs["simU"]
    fig, axs = plt.subplots(3, 3, figsize=(16, 10))
    axs[0, 0].plot(REF[:, 0], REF[:, 1], "k--", lw=0.8, label="ref")
    axs[0, 0].plot(CiLX[:, 0], CiLX[:, 1], "b", lw=0.8, label="sim")
    axs[0, 0].set_title("trajectory")
    axs[0, 0].legend()
    axs[0, 1].plot(t, REF[:, 3], "k--", label="ref_v")
    axs[0, 1].plot(t, CiLX[1:, 3], "b", label="v")
    axs[0, 1].set_title("velocity [m/s]")
    axs[0, 2].plot(t, REF[:, 2], "k--")
    axs[0, 2].plot(t, CiLX[1:, 2], "b")
    axs[0, 2].set_title("yaw [rad]")
    axs[1, 0].plot(t, U[:, 0])
    axs[1, 0].set_title("jerk [m/s3]")
    axs[1, 1].plot(t, U[:, 1])
    axs[1, 1].set_title("steering rate [rad/s]")
    axs[1, 2].plot(t, logs["MPC_SimX"][1:, 7])
    axs[1, 2].set_title("acceleration [m/s2]")
    axs[2, 0].plot(t, logs["dev_lat"])
    axs[2, 0].set_title("lateral deviation [m]")
    axs[2, 1].plot(t, logs["dev_vel"])
    axs[2, 1].set_title("velocity deviation [m/s]")
    axs[2, 2].plot(t, logs["a_lat"][1:])
    axs[2, 2].set_title("lateral acceleration [m/s2]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_boxplots(logs, path):
    fig, axs = plt.subplots(1, 3, figsize=(9, 4))
    for ax, key, title in zip(
        axs, ["dev_vel", "dev_yaw", "dev_lat"], ["vel dev", "yaw dev", "lat dev"]
    ):
        ax.boxplot(np.abs(logs[key]))
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_mpc_perf(logs, path):
    t, dbg = logs["t"], logs["simSolverDebug"]
    fig, axs = plt.subplots(2, 2, figsize=(11, 7))
    axs[0, 0].plot(t, dbg[:, 0])
    axs[0, 0].set_title("cost")
    axs[0, 1].plot(t, dbg[:, 1] * 1e3)
    axs[0, 1].set_title("solve time [ms]")
    axs[1, 0].plot(t, dbg[:, 3])
    axs[1, 0].set_title("QP iterations")
    axs[1, 1].plot(t, dbg[:, 4])
    axs[1, 1].set_title("status")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_track_sim(logs, path, track=None):
    fig, ax = plt.subplots(figsize=(9, 8))
    if track is not None:
        ax.plot(track.center[:, 0], track.center[:, 1], "k--", lw=0.5)
        ax.plot(track.inner[:, 0], track.inner[:, 1], "k", lw=0.8)
        ax.plot(track.outer[:, 0], track.outer[:, 1], "k", lw=0.8)
    sc = ax.scatter(
        logs["CiLX"][1:, 0], logs["CiLX"][1:, 1], c=np.abs(logs["dev_lat"]), s=3, cmap="viridis"
    )
    fig.colorbar(sc, label="|lat dev| [m]")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_disturbances(logs, path):
    t = logs["t"]
    fig, axs = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    axs[0].plot(t, logs["sim_disturbance_derivatives"])
    axs[0].set_title("state-derivative disturbances")
    axs[1].plot(t, logs["sim_disturbance_state_estimation"])
    axs[1].set_title("state-estimation noise")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_all(logs, run_dir, track=None):
    plot_results_grid(logs, os.path.join(run_dir, "SimResults.png"))
    plot_boxplots(logs, os.path.join(run_dir, "SimResBoxplots.png"))
    plot_mpc_perf(logs, os.path.join(run_dir, "MPC_performance.png"))
    plot_track_sim(logs, os.path.join(run_dir, "TrackSim.png"), track=track)
    if np.any(logs["sim_disturbance_derivatives"]) or np.any(
        logs["sim_disturbance_state_estimation"]
    ):
        plot_disturbances(logs, os.path.join(run_dir, "Disturbances.png"))
