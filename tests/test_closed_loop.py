"""Closed-loop integration tests: all three controller families track the
reference trajectories; statistical comparison against the golden logs.

The committed golden logs used older model parameters (docs/PARITY.md), so
closed-loop comparisons are statistical: deviations of the same order, not
trace equality.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.eval.logger import assemble_logs


def _run(sim_cfg, mpc_cfg, n_steps, key=0):
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, mpc_cfg)
    carry, log = jax.jit(lambda: sim.run(x0m, x0s, n_steps, key=jax.random.PRNGKey(key)))()
    return carry, log, x0m, x0s


@pytest.mark.parametrize("controller", ["nominal", "snmpc", "rnmpc"])
def test_controller_tracks_monteblanco(controller):
    n = 60 if controller != "nominal" else 150
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    carry, log, *_ = _run(sim_cfg, MPCConfig(controller=controller), n)
    status = np.array(log.simSolverDebug[:, 4])
    assert np.all(status == 0)
    assert float(jnp.max(jnp.abs(log.lat_dev))) < 0.15
    # steering-rate bound respected on the applied control
    assert float(jnp.max(jnp.abs(log.simU[:, 1]))) <= 0.322 + 1e-9


def test_external_cost_closed_loop_lap():
    """EXTERNAL ego-frame lon/lat cost with anisotropic weights tracks
    Monteblanco closed-loop (the reference's dev_lonlat formulation,
    NMPC_STM_acados_settings_dev_lonlat.py:71-96)."""
    n = 150
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    mpc_cfg = MPCConfig(costfunction_type="EXTERNAL", q_lon=5.0, q_lat=1.5)
    carry, log, *_ = _run(sim_cfg, mpc_cfg, n)
    status = np.array(log.simSolverDebug[:, 4])
    assert np.all(status == 0)
    assert float(jnp.max(jnp.abs(log.lat_dev))) < 0.2
    assert float(jnp.max(jnp.abs(log.simU[:, 1]))) <= 0.322 + 1e-9


def test_mode1_runs_and_is_finite():
    sim_cfg = SimConfig(sim_mode=1, T=2.0)
    carry, log, *_ = _run(sim_cfg, MPCConfig(), sim_cfg.Nsim)
    assert np.all(np.isfinite(np.array(log.CiLX)))


def test_disturbed_run_reproducible():
    sim_cfg = SimConfig(
        sim_mode=0, T=1.0, simulate_disturbances=True, simulate_state_estimation=True
    )
    _, log1, *_ = _run(sim_cfg, MPCConfig(), 50, key=7)
    _, log2, *_ = _run(sim_cfg, MPCConfig(), 50, key=7)
    np.testing.assert_array_equal(np.array(log1.CiLX), np.array(log2.CiLX))
    _, log3, *_ = _run(sim_cfg, MPCConfig(), 50, key=8)
    assert not np.array_equal(np.array(log3.dist_se), np.array(log1.dist_se))


def test_log_assembly_shapes():
    sim_cfg = SimConfig(sim_mode=0, T=0.6)
    carry, log, x0m, x0s = _run(sim_cfg, MPCConfig(), 30)
    logs = assemble_logs(log, x0m, x0s, sim_cfg.T)
    assert logs["MPC_SimX"].shape == (31, 8)
    assert logs["CiLX"].shape == (31, 7)
    assert logs["simU"].shape == (30, 2)
    assert logs["simREF"].shape == (30, 4)
    assert logs["simSolverDebug"].shape == (30, 5)
    assert logs["dev_lat"].shape == (30,)
    # yaw post-processed into [0, 2pi)
    assert np.all(logs["CiLX"][:, 2] >= 0) and np.all(logs["CiLX"][:, 2] < 2 * np.pi)


def test_playback_from_log_file_roundtrip(tmp_path):
    """Record a disturbed run to full_logs.npz, replay the realization from
    the file (reference sim_main_params.yaml:44-48 / MPC_sim_utils.py:39-45):
    the replayed disturbances and plant trace match the recording exactly."""
    from tum_control_tpu.api import build_simulation as build
    from tum_control_tpu.eval.logger import save_logs
    from tum_control_tpu.sim.disturbances import load_playback

    n = 40
    rec_cfg = SimConfig(
        sim_mode=0, T=n * 0.02, simulate_disturbances=True,
        simulate_state_estimation=True,
    )
    sim, x0m, x0s, *_ = build(rec_cfg, MPCConfig())
    _, log_rec = jax.jit(
        lambda: sim.run(x0m, x0s, n, key=jax.random.PRNGKey(3))
    )()
    logs = assemble_logs(log_rec, x0m, x0s, rec_cfg.T)
    path = tmp_path / "full_logs.npz"
    save_logs(logs, str(path))

    play_cfg = SimConfig(
        sim_mode=0, T=n * 0.02, simulate_disturbances=True,
        simulate_state_estimation=True, disturbance_playback=True,
        playback_log_file="full_logs.npz",
    )
    sim_p, x0m_p, x0s_p, *_ = build(play_cfg, MPCConfig())
    playback = load_playback(str(tmp_path), "full_logs.npz", n)
    _, log_play = jax.jit(
        lambda: sim_p.run(x0m_p, x0s_p, n, key=jax.random.PRNGKey(99), playback=playback)
    )()
    np.testing.assert_array_equal(
        np.array(log_play.dist_deriv), np.array(log_rec.dist_deriv)
    )
    np.testing.assert_array_equal(
        np.array(log_play.dist_se), np.array(log_rec.dist_se)
    )
    # identical disturbances -> identical closed loop despite a different key
    np.testing.assert_allclose(
        np.array(log_play.CiLX), np.array(log_rec.CiLX), atol=1e-12
    )


def test_monteblanco_30s_quality_regression():
    """Falsifiable full-scale quality gate on CPU (VERDICT r1 #8): 30 s of
    Monteblanco must track with dev_lat mean < 0.25 m, max < 1.0 m, and 100%
    solver success — the claims docs/RESULTS.md makes from hardware runs,
    re-verifiable in CI."""
    n = 1500
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    carry, log, *_ = _run(sim_cfg, MPCConfig(), n)
    status = np.array(log.simSolverDebug[:, 4])
    lat = np.abs(np.array(log.lat_dev))
    assert np.all(status == 0)
    assert lat.mean() < 0.25, lat.mean()
    assert lat.max() < 1.0, lat.max()
    assert float(jnp.max(jnp.abs(log.simU[:, 1]))) <= 0.322 + 1e-9


@pytest.mark.parametrize("controller", ["snmpc", "rnmpc"])
def test_stochastic_controllers_30s_quality_regression(controller):
    """Same falsifiable 30 s gate for the stochastic/robust families
    (VERDICT r2 #3): the full-lap hardware claims (docs/RESULTS.md: SNMPC
    0.161/0.857 m, R²NMPC 0.162/0.842 m mean/max dev_lat) must be
    re-verifiable by pytest alone. CPU measurements on this window:
    snmpc 0.127/0.861, rnmpc 0.135/0.837."""
    n = 1500
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    carry, log, *_ = _run(sim_cfg, MPCConfig(controller=controller), n)
    status = np.array(log.simSolverDebug[:, 4])
    lat = np.abs(np.array(log.lat_dev))
    assert np.all(status == 0)
    assert lat.mean() < 0.2, lat.mean()
    assert lat.max() < 1.0, lat.max()
    assert float(jnp.max(jnp.abs(log.simU[:, 1]))) <= 0.322 + 1e-9


def test_wmpc_beats_static_weights():
    """Weights-varying MPC quality gate (VERDICT r2 #3): the converted
    reference policy (new_BO_F) must beat the static MPC_params.yaml weights
    over the same 40 s Monteblanco segment — the docs/RESULTS.md claim
    (0.178 vs 0.283 m dev_lat RMS on hardware; CPU: 0.176 vs 0.280)."""
    n = 2000
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    _, log_s, *_ = _run(sim_cfg, MPCConfig(), n)
    _, log_w, *_ = _run(
        sim_cfg,
        MPCConfig(enable_WMPC=True, WMPC_model="data/wmpc_models/new_BO_F"),
        n,
    )
    rms = lambda a: float(np.sqrt((np.array(a) ** 2).mean()))
    rms_s, rms_w = rms(log_s.lat_dev), rms(log_w.lat_dev)
    assert np.all(np.array(log_w.simSolverDebug[:, 4]) == 0)
    assert rms_w < rms_s, (rms_w, rms_s)
    assert rms_w < 0.25, rms_w
    # velocity tracking must not be sacrificed for the lateral gain
    assert rms(log_w.vel_dev) < 1.1 * rms(log_s.vel_dev)


@pytest.mark.golden
def test_statistics_vs_golden(golden_nmpc_log):
    """First 15 s of the nominal no-disturbance run vs the golden ACC24 log:
    deviations must be of the same order (not trace-equal — see PARITY.md)."""
    n = 750
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    carry, log, *_ = _run(sim_cfg, MPCConfig(), n)
    g_lat = np.abs(golden_nmpc_log["dev_lat"][:n])
    o_lat = np.abs(np.array(log.lat_dev))
    # same order: our mean within 3x of golden's (and absolutely small)
    assert o_lat.mean() < max(3.0 * g_lat.mean(), 0.15)
    assert o_lat.max() < max(3.0 * g_lat.max(), 0.5)
    # control envelopes comparable
    g_u = golden_nmpc_log["simU"][:n]
    o_u = np.array(log.simU)
    assert np.abs(o_u[:, 1]).max() <= 0.322 + 1e-9
    assert np.abs(o_u[:, 0]).max() < 3.0 * max(np.abs(g_u[:, 0]).max(), 1.0)


@pytest.mark.parametrize("track", ["modena", "lvms"])
def test_nominal_tracks_other_tracks(track):
    """BASELINE.md targets all three reference tracks; Monteblanco is covered
    above, Modena/LVMS here (short horizon, CPU)."""
    n = 150
    sim_cfg = SimConfig(
        sim_mode=0,
        T=n * 0.02,
        track_file=f"track_{track}.json",
        ref_traj_file=f"reftraj_{track}_edgar.json",
    )
    carry, log, *_ = _run(sim_cfg, MPCConfig(), n)
    status = np.array(log.simSolverDebug[:, 4])
    assert np.all(status == 0)
    # Corner severity differs per track: Modena's first corner arrives during
    # the jerk-limited cold-start braking (a(0)=0 vs ref_acc<0 — the
    # reference's model shares this start) and peaks near 1.0 m; the
    # reference's own Modena usage (RL training) tolerates lat_dev < 2.0 m
    # (rl_config.yaml max_lat_dev). Full-lap statistics: docs/RESULTS.md.
    assert float(jnp.max(jnp.abs(log.lat_dev))) < 1.2
    assert float(jnp.max(jnp.abs(log.simU[:, 1]))) <= 0.322 + 1e-9
