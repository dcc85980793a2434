"""Auxiliary subsystems: disturbance playback, live-viz replay, checkpoints."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.eval.logger import assemble_logs


def test_disturbance_playback_roundtrip():
    """Record a disturbed run, replay the recorded realization, get the
    identical trajectory (the reference's only seed-control mechanism,
    sim_main_params.yaml:44-48)."""
    n = 40
    cfg_rec = SimConfig(
        sim_mode=0, T=n * 0.02, simulate_disturbances=True, simulate_state_estimation=True
    )
    sim, x0m, x0s, *_ = build_simulation(cfg_rec, MPCConfig())
    _, log_rec = jax.jit(lambda: sim.run(x0m, x0s, n, key=jax.random.PRNGKey(3)))()

    cfg_play = SimConfig(
        sim_mode=0,
        T=n * 0.02,
        simulate_disturbances=True,
        simulate_state_estimation=True,
        disturbance_playback=True,
    )
    sim2, *_ = build_simulation(cfg_play, MPCConfig())
    playback = (log_rec.dist_deriv, log_rec.dist_se)
    _, log_play = jax.jit(
        lambda: sim2.run(x0m, x0s, n, key=jax.random.PRNGKey(99), playback=playback)
    )()
    # identical up to compile-level float reassociation (the playback branch
    # omits the RNG draw ops, changing fusion slightly)
    np.testing.assert_allclose(np.asarray(log_play.CiLX), np.asarray(log_rec.CiLX), atol=1e-8)
    np.testing.assert_allclose(np.asarray(log_play.simU), np.asarray(log_rec.simU), atol=1e-8)


def test_live_viz_replay_and_gif(tmp_path):
    from tum_control_tpu.eval.live_viz import animate

    cfg = SimConfig(sim_mode=0, T=0.6)
    sim, x0m, x0s, traj, track = build_simulation(cfg, MPCConfig())
    _, log = jax.jit(lambda: sim.run(x0m, x0s, 30))()
    logs = assemble_logs(log, x0m, x0s, cfg.T)
    gif = str(tmp_path / "run.gif")
    n_frames = animate(logs, track=track, mode=2, frame_skip=10, gif_path=gif)
    assert n_frames >= 2
    assert os.path.getsize(gif) > 1000
    n1 = animate(logs, track=track, mode=1, frame_skip=15, gif_path=str(tmp_path / "m1.gif"))
    assert n1 >= 1


def test_live_viz_during_sim(tmp_path):
    """True during-sim rendering (reference Logging_Plotting.py:193-229):
    LiveView consumes PARTIAL logs at chunk boundaries while the loop runs
    and exports the same GIF pipeline as replay mode."""
    from tum_control_tpu.eval.live_viz import LiveView

    cfg = SimConfig(sim_mode=0, T=0.6)
    sim, x0m, x0s, traj, track = build_simulation(cfg, MPCConfig())
    step = jax.jit(lambda c: sim.run_from(c, 10))
    carry = sim.init_carry(x0m, x0s, jax.random.PRNGKey(0))

    gif = str(tmp_path / "live.gif")
    view = LiveView(track=track, mode=2, gif_path=gif)
    chunk_logs = []
    for k in range(3):  # 3 chunks of 10 steps, rendering after each
        carry, lg = step(carry)
        chunk_logs.append(lg)
        part = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *chunk_logs,
        )
        logs = assemble_logs(part, x0m, x0s, (k + 1) * 10 * cfg.Ts)
        view.update(logs, (k + 1) * 10)
    n = view.finish()
    assert n == 3
    assert os.path.getsize(gif) > 1000


def test_log_parity_solve_time_and_wmpc_trace(tmp_path):
    """simSolverDebug[:,1] must carry real (nonzero) per-solve times and a
    WMPC run must export RL_WMPC_logs.npz with the action trace — the
    reference logs acados time_tot (NMPC_class.py:202-206) and the WMPC
    action/weight-set trace (Logging_Plotting.py:284-287)."""
    from tum_control_tpu.eval.logger import evaluation

    n = 45  # > 2 weight-update periods
    cfg = SimConfig(sim_mode=0, T=n * 0.02)
    mpc = MPCConfig(
        controller="nominal",
        enable_WMPC=True,
        WMPC_model="data/wmpc_models/new_BO_F",
        weights_update_period=20,
    )
    if not os.path.exists("data/wmpc_models/new_BO_F"):
        import pytest

        pytest.skip("converted model missing")
    sim, x0m, x0s, *_ = build_simulation(cfg, mpc)
    _, log = jax.jit(lambda: sim.run(x0m, x0s, n, key=jax.random.PRNGKey(0)))()
    times = np.full(n, 1.25e-3)
    logs = assemble_logs(log, x0m, x0s, cfg.T, step_times=times)
    assert (logs["simSolverDebug"][:, 1] > 0).all()
    np.testing.assert_allclose(logs["simSolverDebug"][:, 1], times)
    assert logs["RL_actions"].shape == (n,)
    assert (logs["RL_actions"] >= 0).all()
    # after the first update period the policy must have picked an action
    assert len(np.unique(logs["RL_actions"])) >= 1

    evaluation(
        logs, logs_path=str(tmp_path), run_name="w", save=True,
        make_plots=False, timestamp=False,
        wmpc_sets=sim.controller.param_table,
    )
    d = np.load(str(tmp_path / "w" / "RL_WMPC_logs.npz"))
    assert d["RL_actions"].shape == (n,)
    assert d["WMPC_sets"].shape[1] == 7
    full = np.load(str(tmp_path / "w" / "full_logs.npz"))
    assert "RL_actions" not in full
    assert (full["simSolverDebug"][:, 1] > 0).all()


def test_checkpoint_roundtrip(tmp_path):
    from tum_control_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
    path = str(tmp_path / "ck")
    save_pytree(path, tree)
    out = load_pytree(path, jax.tree.map(jnp.zeros_like, tree))
    np.testing.assert_allclose(np.asarray(out["w"]), np.arange(6.0).reshape(2, 3))
    assert int(out["step"]) == 7


def test_offline_plot_suite(tmp_path):
    """All reference evaluation figures render from an assembled log
    (plotRes/BoxPlots/plotMPCperf incl. track heatmaps/plotTrackSim/
    gg diagram/state errors — Utils/MPC_sim_utils.py:268-872)."""
    from tum_control_tpu.eval import plots

    cfg = SimConfig(sim_mode=0, T=0.6)
    sim, x0m, x0s, traj, track = build_simulation(cfg, MPCConfig())
    _, log = jax.jit(lambda: sim.run(x0m, x0s, 30))()
    logs = assemble_logs(log, x0m, x0s, cfg.T)
    plots.plot_all(logs, str(tmp_path), track=track)
    for f in (
        "SimResults.png",
        "SimResBoxplots.png",
        "MPC_performance.png",
        "TrackSim.png",
        "GGDiagram.png",
        "StateErrors.png",
    ):
        assert os.path.getsize(str(tmp_path / f)) > 5000, f
