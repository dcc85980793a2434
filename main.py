"""Closed-loop NMPC simulation entry point (reference main.py equivalent).

    python main.py [--controller nominal|snmpc|rnmpc] [--config data/Config]
                   [--sim-params EDGAR/sim_main_params.yaml]
                   [--mpc-params EDGAR/MPC_params.yaml]
                   [--no-plots] [--seed 0]

Unlike the reference (controller chosen by editing imports, main.py:16-18),
the controller is a config value / CLI flag. The whole loop runs as one
jitted XLA program on the available accelerator.
"""
import argparse
import os
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="config root (default data/Config)")
    ap.add_argument("--sim-params", default="EDGAR/sim_main_params.yaml")
    ap.add_argument("--mpc-params", default="EDGAR/MPC_params.yaml")
    ap.add_argument("--controller", default=None, choices=["nominal", "snmpc", "rnmpc"])
    ap.add_argument("--logs-path", default="Logs/")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--T", type=float, default=None, help="override simulation time [s]")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tum_control_tpu import config as cfg_mod
    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import load_mpc_config, load_sim_config
    from tum_control_tpu.eval.logger import assemble_logs, evaluation

    config_path = args.config or cfg_mod.DEFAULT_CONFIG_PATH
    sim_cfg = load_sim_config(os.path.join(config_path, args.sim_params))
    if args.T is not None:
        sim_cfg = type(sim_cfg)(**{**sim_cfg.__dict__, "T": args.T})
    mpc_cfg = load_mpc_config(os.path.join(config_path, args.mpc_params))
    if args.controller:
        mpc_cfg = type(mpc_cfg)(**{**mpc_cfg.__dict__, "controller": args.controller})

    sim, x0_mpc, x0_sim, traj, track = build_simulation(sim_cfg, mpc_cfg, config_path)
    n_steps = sim_cfg.Nsim
    print(
        f"controller={mpc_cfg.controller} simMode={sim_cfg.sim_mode} "
        f"N={sim_cfg.N} Nsim={n_steps} track={sim_cfg.track_file}"
    )

    playback = None
    if sim_cfg.disturbance_playback:
        if not sim_cfg.playback_log_file:
            raise ValueError(
                "disturbance_playback is enabled but playback_log_file is empty "
                "(the run would silently replace disturbances with zeros)"
            )
        from tum_control_tpu.sim.disturbances import load_playback

        playback = load_playback(args.logs_path, sim_cfg.playback_log_file, n_steps)
        print(f"replaying disturbances from {sim_cfg.playback_log_file}")

    run = jax.jit(
        lambda key: sim.run(x0_mpc, x0_sim, n_steps, key=key, playback=playback)
    )
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    carry, sim_log = run(key)
    jax.block_until_ready(sim_log.lat_dev)
    wall = time.time() - t0
    print(f"simulated {n_steps} steps in {wall:.2f}s "
          f"({wall / n_steps * 1e3:.3f} ms/step incl. compile)")

    logs = assemble_logs(sim_log, x0_mpc, x0_sim, sim_cfg.T)
    evaluation(
        logs,
        logs_path=args.logs_path,
        run_name=sim_cfg.file_logs_name,
        save=sim_cfg.save_logs,
        make_plots=not args.no_plots,
        wall_time=wall,
    )


if __name__ == "__main__":
    main()
