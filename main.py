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

    # Chunked execution: XLA can't time individual solves in-graph, so the
    # run is split into jitted chunks and each chunk's host wall time is
    # spread over its steps into simSolverDebug[:, 1] — the analog of the
    # acados per-solve time_tot the reference logs (NMPC_class.py:202-206).
    import numpy as np

    # During-sim live visualization (reference Logging_Plotting.py:193-229):
    # chunks shrink to live_plot_freq steps and each chunk boundary renders
    # the state so far — overlapped with the NEXT chunk's device execution,
    # so rendering only throttles the loop if it is slower than the chunk.
    live_view = None
    if sim_cfg.live_visualization in (1, 2):
        from tum_control_tpu.eval.live_viz import LiveView

        gif = (os.path.join(args.logs_path, sim_cfg.GIF_file_name)
               if sim_cfg.GIF_animation_generation else None)
        live_view = LiveView(
            track=track, mode=sim_cfg.live_visualization,
            window=(float(sim_cfg.xwidth), float(sim_cfg.ywidth)), gif_path=gif,
            show=bool(os.environ.get("DISPLAY")),
        )
        chunk = max(1, min(int(sim_cfg.live_plot_freq), n_steps))
    else:
        chunk = max(1, min(250, n_steps))
    sizes = [chunk] * (n_steps // chunk)
    if n_steps % chunk:
        sizes.append(n_steps % chunk)

    runners = {}

    def get_runner(sz):
        if sz not in runners:
            runners[sz] = jax.jit(
                lambda c, pb, _sz=sz: sim.run_from(c, _sz, playback=pb)
            )
        return runners[sz]

    def pb_slice(pos, sz):
        if playback is None:
            return None
        return (playback[0][pos : pos + sz], playback[1][pos : pos + sz])

    key = jax.random.PRNGKey(args.seed)
    # compile all chunk shapes outside the timed region
    warm = sim.init_carry(x0_mpc, x0_sim, key)
    lg0 = None
    for sz in sorted(set(sizes)):
        w, lg0 = get_runner(sz)(warm, pb_slice(0, sz))
    jax.block_until_ready(w.x_sim)

    # Preallocated full-run log buffers, filled chunk by chunk — avoids
    # re-concatenating the whole history at every live-viz frame (O(n^2)
    # host work over a run).
    buffers = jax.tree.map(
        lambda x: np.empty((n_steps,) + np.asarray(x).shape[1:], np.asarray(x).dtype),
        lg0,
    )

    def partial_assemble(pos):
        part = jax.tree.map(lambda b: b[:pos], buffers)
        return assemble_logs(part, x0_mpc, x0_sim, pos * sim_cfg.Ts_sim_step)

    # Live rendering runs on a dedicated worker thread so it overlaps the
    # NEXT chunk's device execution without contaminating the per-chunk
    # device timing (the renderer reads buffers[:pos], the main thread
    # writes [pos:] — disjoint). All matplotlib calls stay on this one
    # thread (Agg backend).
    render_q = None
    render_thread = None
    if live_view is not None:
        import queue as _queue
        import threading as _threading

        render_q = _queue.Queue(maxsize=2)

        def _render_worker():
            while True:
                p = render_q.get()
                if p is None:
                    break
                live_view.update(partial_assemble(p), p)

        render_thread = _threading.Thread(target=_render_worker, daemon=True)
        render_thread.start()

    carry = sim.init_carry(x0_mpc, x0_sim, key)
    step_times = []
    pos = 0
    t0 = time.time()
    for sz in sizes:
        tc = time.time()
        # async dispatch: the chunk starts executing on-device immediately
        carry, lg = get_runner(sz)(carry, pb_slice(pos, sz))
        jax.block_until_ready(lg.lat_dev)
        # pure dispatch+device wall time: rendering happens on its own
        # thread, so simSolverDebug[:,1] is not inflated by host drawing
        step_times.append(np.full(sz, (time.time() - tc) / sz))
        lg_np = jax.tree.map(np.asarray, lg)
        jax.tree.map(lambda b, x: b.__setitem__(slice(pos, pos + sz), x), buffers, lg_np)
        pos += sz
        if render_q is not None:
            try:
                render_q.put_nowait(pos)  # skip frames if the renderer lags
            except _queue.Full:
                pass
    wall = time.time() - t0
    if live_view is not None:
        render_q.put(None)
        render_thread.join()
        live_view.update(partial_assemble(pos), pos)
        n_frames = live_view.finish()
        if sim_cfg.GIF_animation_generation:
            print(f"live viz: {n_frames} frames -> "
                  f"{os.path.join(args.logs_path, sim_cfg.GIF_file_name)}")
    sim_log = buffers
    print(f"simulated {n_steps} steps in {wall:.2f}s "
          f"({wall / n_steps * 1e3:.3f} ms/step, compile excluded)")

    logs = assemble_logs(
        sim_log, x0_mpc, x0_sim, sim_cfg.T,
        step_times=np.concatenate(step_times),
    )
    wmpc_sets = getattr(sim.controller, "param_table", None)
    evaluation(
        logs,
        logs_path=args.logs_path,
        run_name=sim_cfg.file_logs_name,
        save=sim_cfg.save_logs,
        make_plots=not args.no_plots,
        wall_time=wall,
        wmpc_sets=wmpc_sets,
    )


if __name__ == "__main__":
    main()
