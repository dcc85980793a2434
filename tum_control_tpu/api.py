"""High-level assembly: configs -> controller + closed-loop simulation.

The equivalent of the reference main.py's object wiring (main.py:24-44),
with controller selection by config value instead of import editing.
"""
from __future__ import annotations

import os

import jax.numpy as jnp

from tum_control_tpu import config as cfg_mod
from tum_control_tpu.config import MPCConfig, SimConfig, load_gg_table, load_tire_params, load_vehicle_params
from tum_control_tpu.controllers.common import GGTables
from tum_control_tpu.sim.closed_loop import ClosedLoopSim
from tum_control_tpu.sim.disturbances import disturbance_config
from tum_control_tpu.track.trajectory import initial_state, load_ref_trajectory, load_track


def build_controller(mpc_cfg: MPCConfig, sim_cfg: SimConfig, config_path: str = None):
    config_path = config_path or cfg_mod.DEFAULT_CONFIG_PATH
    vp = load_vehicle_params(config_path, sim_cfg.veh_params_file_MPC)
    tp = load_tire_params(config_path, sim_cfg.tire_params_file_MPC)
    gg = GGTables(*load_gg_table(config_path, mpc_cfg.lookuptable_gg_limits))
    name = mpc_cfg.controller.lower()
    if name == "nominal":
        from tum_control_tpu.controllers.nominal import NominalNMPC

        return NominalNMPC(mpc_cfg, sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg)
    if name == "snmpc":
        from tum_control_tpu.controllers.snmpc import StochasticNMPC

        return StochasticNMPC(mpc_cfg, sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg)
    if name == "rnmpc":
        from tum_control_tpu.controllers.rnmpc import ReducedRobustNMPC

        return ReducedRobustNMPC(mpc_cfg, sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg)
    raise ValueError(f"unknown controller '{mpc_cfg.controller}'")


def build_simulation(sim_cfg: SimConfig, mpc_cfg: MPCConfig, config_path: str = None):
    """Returns (sim, x0_mpc, x0_sim, traj, track)."""
    config_path = config_path or cfg_mod.DEFAULT_CONFIG_PATH
    controller = build_controller(mpc_cfg, sim_cfg, config_path)
    traj = load_ref_trajectory(
        os.path.join(sim_cfg.trajectory_path, sim_cfg.ref_traj_file)
    )
    track = load_track(os.path.join(sim_cfg.trajectory_path, sim_cfg.track_file))
    vp_sim = load_vehicle_params(config_path, sim_cfg.veh_params_file_simulator)
    tp_sim = load_tire_params(config_path, sim_cfg.tire_params_file_simulator)
    x0_mpc, x0_sim = initial_state(traj, sim_cfg.idx_ref_start)

    dist_deriv = disturbance_config(
        sim_cfg.disturbance_type_derivatives,
        sim_cfg.w_derivatives,
        enabled=sim_cfg.simulate_disturbances,
    )
    dist_se = disturbance_config(
        sim_cfg.disturbance_type_state_estimation,
        sim_cfg.w_state_estimation,
        enabled=sim_cfg.simulate_state_estimation,
    )
    sim = ClosedLoopSim(
        controller=controller,
        traj=traj,
        sim_mode=sim_cfg.sim_mode,
        Ts=sim_cfg.Ts_sim_step,
        Tp=sim_cfg.Tp,
        N=sim_cfg.N,
        vp_sim=vp_sim,
        tp_sim=tp_sim,
        dist_deriv=dist_deriv,
        dist_se=dist_se,
        playback=sim_cfg.disturbance_playback,
    )
    return sim, jnp.asarray(x0_mpc), jnp.asarray(x0_sim), traj, track
