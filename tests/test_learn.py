"""Learning-layer tests: policy parity vs torch, observation, PCE math."""
import io
import os
import zipfile

import jax.numpy as jnp
import numpy as np
import pytest

from tum_control_tpu.learn.observation import ObservationConfig, make_observation
from tum_control_tpu.learn.policy import load_sb3_policy
from tum_control_tpu.track.planner import RefWindow

WMPC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "wmpc_models", "new_BO_F"
)
SB3_ZIP = (
    "/root/reference/Learning_To_Adapt/SafeRL_WMPC/_models/new_BO_F/best_model/best_model.zip"
)


@pytest.mark.skipif(not os.path.exists(WMPC_DIR), reason="converted model missing")
def test_policy_forward_matches_torch():
    """Our JAX MLP must reproduce the original torch policy's logits."""
    torch = pytest.importorskip("torch")
    if not os.path.exists(SB3_ZIP):
        pytest.skip("reference checkpoint unavailable")
    with zipfile.ZipFile(SB3_ZIP) as z:
        with z.open("policy.pth") as fh:
            sd = torch.load(io.BytesIO(fh.read()), map_location="cpu", weights_only=False)

    policy = load_sb3_policy(os.path.join(WMPC_DIR, "policy_weights.npz"))
    rng = np.random.default_rng(0)
    obs = rng.uniform(0, 1, size=(5, 22)).astype(np.float32)

    # torch-side forward (tanh MLP trunk + linear action head)
    x = torch.tensor(obs)
    for i in (0, 2, 4):
        w = sd[f"mlp_extractor.policy_net.{i}.weight"]
        b = sd[f"mlp_extractor.policy_net.{i}.bias"]
        x = torch.tanh(x @ w.T + b)
    logits_t = (x @ sd["action_net.weight"].T + sd["action_net.bias"]).numpy()

    logits_j = np.asarray(policy.logits(jnp.asarray(obs)))
    np.testing.assert_allclose(logits_j, logits_t, rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.argmax(logits_j, 1), np.argmax(logits_t, 1))


def test_observation_shapes_and_bounds():
    n = 39
    yaw = np.linspace(0.2, 1.4, n) % (2 * np.pi)
    win = RefWindow(
        pos=jnp.asarray(np.stack([np.linspace(0, 50, n), np.zeros(n)], 1)),
        yaw=jnp.asarray(yaw),
        v=jnp.asarray(np.full(n, 20.0)),
    )
    cfg = ObservationConfig(Ts=0.02)
    obs = np.asarray(make_observation(cfg, 0.5, -1.0, win))
    assert obs.shape == (22,)
    # lat_dev 0.5 in [-3,3] -> (0.5+3)/6
    assert obs[0] == pytest.approx((0.5 + 3) / 6)
    assert obs[1] == pytest.approx((-1.0 + 5) / 10)
    # velocities 20 m/s normalized over [0, 39]
    np.testing.assert_allclose(obs[2:12], 20 / 39, rtol=1e-6)


def test_pce_regression_matrix_properties():
    from tum_control_tpu.controllers import pce

    n_samples, n_vars, degree = 10, 3, 2
    alphas = pce.alpha_indices(n_vars, degree)
    L = pce.n_poly_terms(n_vars, degree)
    assert alphas.shape == (L, n_vars)
    assert L == 10
    # total degree ascending, constant term first
    assert alphas[0].sum() == 0
    assert np.all(np.diff(alphas.sum(1)) >= 0)

    w, A = pce.regression_matrix(n_samples, n_vars, degree)
    assert w.shape == (n_vars, n_samples)
    assert A.shape == (L, n_samples)
    # A is the pseudo-inverse of the basis matrix: A @ Phi = I
    Phi = pce.pce_basis(w, alphas)
    np.testing.assert_allclose(A @ Phi, np.eye(L), atol=1e-8)
    # constant function -> mean weights sum to 1, higher coeffs 0
    coeff = A @ np.ones(n_samples)
    np.testing.assert_allclose(coeff[0], 1.0, atol=1e-8)
    np.testing.assert_allclose(coeff[1:], 0.0, atol=1e-8)


def test_pce_regression_matrix_underdetermined():
    """L > n_samples must yield a finite minimum-norm fit plus a warning —
    the reference's explicit inv(Phi'Phi) produces a ~1e17-entry garbage
    matrix there (its committed n10/uph10 heavy-noise experiment,
    stochastic_mpc_utils.py:66-74; see docs/PARITY.md r4 addendum)."""
    import warnings

    from tum_control_tpu.controllers import pce

    n_samples, n_vars, degree = 10, 7, 2
    L = pce.n_poly_terms(n_vars, degree)
    assert L == 36 > n_samples
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        w, A = pce.regression_matrix(n_samples, n_vars, degree)
    assert any("underdetermined" in str(r.message) for r in rec)
    assert np.isfinite(A).all() and np.abs(A).max() < 10.0
    # minimum-norm LS still reproduces sampled values: Phi @ A is the
    # orthogonal projector onto range(Phi), so Phi @ (A @ y) == y exactly
    # when the design has full row rank
    Phi = pce.pce_basis(w, pce.alpha_indices(n_vars, degree))
    y = np.sin(np.arange(n_samples))
    np.testing.assert_allclose(Phi @ (A @ y), y, atol=1e-8)
    # determined case unchanged vs the explicit normal-equations form
    w3, A3 = pce.regression_matrix(10, 3, 2)
    Phi3 = pce.pce_basis(w3, pce.alpha_indices(3, 2))
    np.testing.assert_allclose(A3, np.linalg.inv(Phi3.T @ Phi3) @ Phi3.T, atol=1e-10)


def test_hermite_orthonormality():
    from tum_control_tpu.controllers import pce

    # Gauss-Hermite check: E[He_m He_n] = delta_mn under N(0,1)
    x, wq = np.polynomial.hermite_e.hermegauss(40)
    wq = wq / wq.sum()
    for m in range(4):
        for n in range(4):
            val = np.sum(wq * pce.hermite_norm(x, m) * pce.hermite_norm(x, n))
            np.testing.assert_allclose(val, 1.0 if m == n else 0.0, atol=1e-10)


def test_fan_initial_state():
    from tum_control_tpu.controllers import pce

    stds = np.array([0, 0, 0, 0.8, 0.35, 0.035, 0, 0])
    w, _ = pce.regression_matrix(10, 3, 2)
    x0 = jnp.arange(8.0)
    fan = np.asarray(pce.fan_initial_state(x0, w, stds))
    assert fan.shape == (11, 8)
    np.testing.assert_allclose(fan[0], np.arange(8.0))
    # only the active indices are perturbed
    np.testing.assert_allclose(fan[:, [0, 1, 2, 6, 7]], np.tile([0, 1, 2, 6, 7], (11, 1)))
    assert np.abs(fan[1:, 3] - 3.0).max() > 0


@pytest.mark.skipif(not os.path.exists(WMPC_DIR), reason="converted model missing")
def test_wmpc_wraps_rnmpc_closed_loop():
    """WMPC over R2NMPC: both extra states (weight mods + robust bound
    tightening) must compose in one jitted loop — the reference embeds the
    WMPC block in the R2 controller too
    (Reduced_Robustified_NMPC_class.py:205-246, 373-405)."""
    import jax

    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig

    n = 45  # > 2 weight-update periods
    sim_cfg = SimConfig(sim_mode=0, T=n * 0.02)
    mpc_cfg = MPCConfig(
        controller="rnmpc",
        enable_WMPC=True,
        WMPC_model="data/wmpc_models/new_BO_F",
        weights_update_period=20,
    )
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, mpc_cfg)
    carry, log = jax.jit(
        lambda: sim.run(x0m, x0s, n, key=jax.random.PRNGKey(0))
    )()
    status = np.array(log.simSolverDebug[:, 4])
    assert np.all(status == 0)
    assert float(jnp.max(jnp.abs(log.lat_dev))) < 0.2
    # the robust corrections must be active (nonzero back-offs carried)
    extra = carry.extra
    assert float(jnp.max(extra.base.corr_steer)) > 0
    assert float(jnp.max(extra.base.corr_acc)) > 0
    # and the WMPC weights must have been rewritten from the Pareto table
    from tum_control_tpu.learn.wmpc import load_param_table

    table = load_param_table(
        os.path.join(os.path.dirname(WMPC_DIR), "..", "F.csv")
    )
    p = table[int(extra.action)]
    np.testing.assert_allclose(
        np.asarray(extra.W), [p[0], p[0], p[1], p[2], p[3], p[4]]
    )


def test_policy_npz_roundtrip(tmp_path):
    """save_policy_npz must be the exact inverse of load_sb3_policy, so
    trained and converted checkpoints are interchangeable artifacts."""
    import jax

    from tum_control_tpu.learn.policy import init_mlp_policy, save_policy_npz

    p = init_mlp_policy(jax.random.PRNGKey(0), obs_dim=22, n_actions=26)
    path = str(tmp_path / "policy_weights.npz")
    save_policy_npz(p, path)
    q = load_sb3_policy(path)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_callback_saves_best(tmp_path):
    """EvalCallback: keeps the best-by-eval-reward checkpoint + history
    (reference SB3 EvalCallback semantics, rl_training.py:102-166)."""
    import jax

    from tum_control_tpu.learn.policy import init_mlp_policy, load_sb3_policy as load
    from tum_control_tpu.learn.ppo import EvalCallback

    p1 = init_mlp_policy(jax.random.PRNGKey(1), obs_dim=4, n_actions=3)
    p2 = init_mlp_policy(jax.random.PRNGKey(2), obs_dim=4, n_actions=3)

    class FakeTrainer:
        rewards = iter([0.5, 0.9, 0.7])

        def evaluate(self, policy, key, n_envs=None, n_steps=None):
            return next(self.rewards)

    cb = EvalCallback(FakeTrainer(), str(tmp_path), eval_freq=1)
    cb(0, p1, {})
    cb(1, p2, {})   # best (0.9) -> saves p2
    cb(2, p1, {})   # worse -> keeps p2
    assert cb.best == 0.9
    best = load(str(tmp_path / "best_model" / "policy_weights.npz"))
    np.testing.assert_array_equal(np.asarray(best.act_w), np.asarray(p2.act_w))
    ev = np.load(str(tmp_path / "evaluations.npz"))
    np.testing.assert_array_equal(ev["updates"], [0, 1, 2])
    np.testing.assert_allclose(ev["mean_reward"], [0.5, 0.9, 0.7])


def test_rlenv_propagates_extra_over_rnmpc_base():
    """Training over an extra-carrying base (R2NMPC) must propagate its
    carried constraint-tightening state through env rollouts instead of
    silently dropping it (round-1 weak #7), and the RL weight mods must
    reach the solve."""
    import jax

    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig
    from tum_control_tpu.learn.env import RLEnv, RLEnvConfig
    from tum_control_tpu.learn.wmpc import load_param_table
    from tum_control_tpu.track.trajectory import load_ref_trajectory, stack_trajectories

    sim_cfg = SimConfig(sim_mode=0)
    sim, *_ = build_simulation(sim_cfg, MPCConfig(controller="rnmpc"))
    traj = load_ref_trajectory(
        os.path.join(sim_cfg.trajectory_path, "reftraj_monteblanco_edgar.json")
    )
    stacked = stack_trajectories([traj])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table = load_param_table(os.path.join(root, "data", "F.csv"))
    env = RLEnv(sim, stacked, table, ObservationConfig(Ts=sim_cfg.Ts),
                RLEnvConfig(n_mpc_steps=3))

    es, obs = env.reset(jax.random.PRNGKey(0))
    assert es.carry.extra is not None
    np.testing.assert_array_equal(np.asarray(es.carry.extra.corr_steer), 0.0)
    es2, obs2, reward, done = jax.jit(env.step)(es, jnp.asarray(0))
    # R2 corrections refreshed by the inner solves
    assert float(np.abs(np.asarray(es2.carry.extra.corr_steer)).max()) > 0.0
    assert np.isfinite(float(reward))


@pytest.mark.slow
def test_bo_candidates_always_finite_and_progress():
    """BO pipeline on a synthetic objective: every proposed candidate must
    be finite (the r1 campaign silently evaluated NaN parameter vectors for
    all BO-proposed trials — f32 GP Cholesky failures propagated through the
    acquisition gradients), and the optimizer should add feasible trials."""
    from tum_control_tpu.learn.bo.optimizer import BayesianOptimizer, BOConfig

    lo = np.asarray(BOConfig().bounds_lo)
    hi = np.asarray(BOConfig().bounds_hi)
    center = lo + 0.4 * (hi - lo)

    def make_eval(shift):
        def ev(params):
            P = np.asarray(params)
            z = (P - center) / (hi - lo)
            # calibrated to ~30% feasible under Sobol sampling (the real
            # problem's group-0 rate), so the initial data seeds the GPs
            feas = np.linalg.norm(z, axis=1) < 0.78
            objs = np.stack(
                [-np.abs(z[:, 0] + shift) - 0.3, -np.abs(z[:, 1]) - 0.4], axis=1
            )
            objs = np.where(feas[:, None], objs, np.nan)
            return objs, feas

        return ev

    cfg = BOConfig(n_initial=20, n_bayesian_optimization=4, batch_size=3, n_mc=16)
    bo = BayesianOptimizer([make_eval(0.0), make_eval(0.1)], cfg, seed=0)
    bo.generate_initial_data()
    for it in range(cfg.n_bayesian_optimization):
        bo.step(it)
    P = np.stack([t.params for t in bo.trials])
    assert np.all(np.isfinite(P)), "BO proposed non-finite parameters"
    assert len(bo.trials) == 20 + 4 * 3
    n_feas = sum(bool(np.asarray(t.feasible).any()) for t in bo.trials[20:])
    assert n_feas > 0, "BO never proposed a feasible candidate on an easy problem"

def test_bo_postprocess_max_lat_margin(tmp_path):
    """The catalog risk margin (--max-lat) excludes Pareto points whose
    worst segment |lat_dev| exceeds it (VERDICT r2 #6: crash threshold
    alone admits sets riding too close to 2.0 m on full laps)."""
    from tum_control_tpu.learn.bo.optimizer import Trial
    from tum_control_tpu.learn.bo.postprocess import export_parameter_sets

    # two non-dominated points per group: one safe (0.5 m), one risky (1.5 m)
    safe = Trial(params=np.full(7, 1.0), objectives=np.array([[-0.5, -0.6]] * 2),
                 feasible=np.array([True, True]), group=0)
    risky = Trial(params=np.full(7, 9.0), objectives=np.array([[-1.5, -0.2]] * 2),
                  feasible=np.array([True, True]), group=1)
    out = tmp_path / "F_m.csv"
    table = export_parameter_sets([safe, risky], str(out), n_per_group=4)
    assert len(table) == 2  # no margin: both exported
    table = export_parameter_sets([safe, risky], str(out), n_per_group=4, max_lat=1.0)
    assert len(table) == 1
    np.testing.assert_allclose(table[0], safe.params)


def test_bo_postprocess_pareto_export(tmp_path):
    """Pareto extraction, reduction, and combined + per-group CSV export
    (reference BO_WMPC/postprocessing.py:12-91 + bo_postprocess_parameters.py:
    combined F.csv and per-group F_0/F_1 catalogs)."""
    from tum_control_tpu.learn.bo.optimizer import Trial
    from tum_control_tpu.learn.bo.postprocess import export_parameter_sets, extract_pareto

    rng = np.random.default_rng(0)
    trials = []
    for i in range(40):
        y = rng.uniform(-1.0, 0.0, size=(2, 2))
        trials.append(
            Trial(
                params=rng.uniform(0.5, 5.0, size=7),
                objectives=y,
                feasible=np.array([i % 3 != 0, i % 4 != 0]),
                group=i % 2,
            )
        )
    # a dominating point must survive Pareto extraction; an infeasible or
    # dominated one must not
    best = Trial(
        params=np.full(7, 2.0), objectives=np.zeros((2, 2)),
        feasible=np.array([True, True]), group=0,
    )
    dominated = Trial(
        params=np.full(7, 3.0), objectives=np.full((2, 2), -2.0),
        feasible=np.array([True, True]), group=1,
    )
    trials += [best, dominated]

    for g in (0, 1):
        X, Y = extract_pareto(trials, g)
        assert any(np.allclose(x, best.params) for x in X)
        assert not any(np.allclose(x, dominated.params) for x in X)
        # no extracted point may dominate another
        for a in range(len(Y)):
            for b in range(len(Y)):
                if a != b:
                    assert not (
                        np.all(Y[a] >= Y[b]) and np.any(Y[a] > Y[b])
                    )

    out = tmp_path / "F_test.csv"
    table = export_parameter_sets(trials, str(out), n_per_group=4, per_group_files=True)
    assert out.exists()
    g0 = np.loadtxt(tmp_path / "F_test_0.csv", delimiter=",").reshape(-1, 7)
    g1 = np.loadtxt(tmp_path / "F_test_1.csv", delimiter=",").reshape(-1, 7)
    combined = np.loadtxt(out, delimiter=",").reshape(-1, 7)
    assert len(g0) <= 4 + 2 and len(g1) <= 4 + 2  # n_clusters + per-dim bests
    # combined = per-group stacks with cross-group duplicates removed (the
    # reference dedups via a set before the combined export); `best` is
    # Pareto-optimal in both groups but must appear exactly once
    stacked = np.vstack([g0, g1])
    assert len(combined) <= len(stacked)
    assert sum(np.allclose(r, best.params, rtol=1e-3) for r in combined) == 1
    for r in combined:
        assert any(np.allclose(r, s, rtol=1e-3) for s in stacked)
    np.testing.assert_allclose(table, combined, rtol=1e-3)
