"""Controller-specific unit tests: R2 tightening semantics, SNMPC behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tum_control_tpu.api import build_controller
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.track.planner import RefWindow


def _window(N, v=20.0):
    n = N + 1
    t = np.arange(n) * 0.08
    return RefWindow(
        pos=jnp.asarray(np.stack([v * t, np.zeros(n)], 1)),
        yaw=jnp.asarray(np.zeros(n)),
        v=jnp.asarray(np.full(n, v)),
    )


@pytest.mark.slow
def test_rnmpc_one_step_delayed_tightening():
    sim_cfg = SimConfig()
    ctrl = build_controller(MPCConfig(controller="rnmpc"), sim_cfg)
    x0 = jnp.array([0.0, 0.0, 0.0, 20.0, 0.0, 0.0, 0.0, 0.0])
    win = _window(ctrl.N)
    st = ctrl.init_state(x0)
    extra0 = ctrl.init_extra()
    # first solve runs with zero corrections...
    assert float(jnp.abs(extra0.corr_steer).max()) == 0.0
    out, st, extra1 = ctrl.solve_with_extra(st, extra0, x0, win)
    # ...and produces nonzero corrections for the next solve
    assert float(extra1.corr_steer[1]) > 0.0
    assert float(jnp.abs(extra1.corr_acc[1:]).max()) > 0.0
    # node 0 never tightened; nodes >= UPH share the last correction
    uph = ctrl.uph
    assert float(extra1.corr_steer[0]) == 0.0
    np.testing.assert_allclose(
        np.asarray(extra1.corr_steer[uph:]), float(extra1.corr_steer[uph]), rtol=0
    )
    # the mods built from the corrections tighten delta_f bounds at 1..N-1
    mods = ctrl._mods_from_extra(extra1)
    nh = ctrl.nh
    base_ub = np.asarray(ctrl.engine.con_ub)
    new_ub = np.asarray(mods.con_ub)
    assert np.all(new_ub[1:-1, nh] < base_ub[1:-1, nh])
    assert new_ub[0, nh] == base_ub[0, nh] and new_ub[-1, nh] == base_ub[-1, nh]
    # covariance grows along the horizon -> corrections increase up to UPH
    cs = np.asarray(extra1.corr_steer[1:uph])
    assert np.all(np.diff(cs) >= -1e-12)


@pytest.mark.slow
def test_snmpc_structured_condense_equals_dense():
    """The structured (block-sparse, two-phase) linearize+condense must be
    numerically identical to the dense 88-dim stacked-state path — the QP is
    the same, only the factorization of the recurrence differs."""
    from tum_control_tpu import config as cm
    from tum_control_tpu.config import load_gg_table, load_tire_params, load_vehicle_params
    from tum_control_tpu.controllers.common import GGTables
    from tum_control_tpu.controllers.snmpc import StochasticNMPC

    sim_cfg = SimConfig(Tp=10 * 0.08)
    mpc = MPCConfig(controller="snmpc")
    vp = load_vehicle_params(cm.DEFAULT_CONFIG_PATH, sim_cfg.veh_params_file_MPC)
    tp = load_tire_params(cm.DEFAULT_CONFIG_PATH, sim_cfg.tire_params_file_MPC)
    gg = GGTables(*load_gg_table(cm.DEFAULT_CONFIG_PATH, mpc.lookuptable_gg_limits))
    c_s = StochasticNMPC(mpc, sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg, structured=True)
    c_d = StochasticNMPC(mpc, sim_cfg.N, sim_cfg.Ts_MPC, vp, tp, gg, structured=False)
    assert c_s.engine.funcs.lin_condense is not None
    assert c_d.engine.funcs.lin_condense is None

    x0 = jnp.array([0.0, 0.0, 0.3, 20.0, 0.1, 0.05, 0.01, -0.5])
    n = sim_cfg.N + 1
    t = np.arange(n) * 0.08
    win = RefWindow(
        pos=jnp.asarray(
            np.stack([20 * np.cos(0.3) * t, 20 * np.sin(0.3) * t + 0.3], 1)
        ),
        yaw=jnp.asarray(0.3 + 0.05 * t),
        v=jnp.asarray(np.full(n, 21.0)),
    )
    st = c_d.init_state(x0)
    for _ in range(3):
        _, st = c_d.solve(st, x0, win)

    d0 = c_d._fan(x0) - st.X[0]
    A, B, xi = c_d.engine._linearize(st)
    e_ref, G_ref = c_d.engine._condense(A, B, xi, d0)
    e_st, G_st = c_s.engine.funcs.lin_condense(st.X, st.U, d0)
    np.testing.assert_allclose(np.asarray(e_st), np.asarray(e_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(G_st), np.asarray(G_ref), atol=1e-12)

    # the analytic con_jac/y_jac hooks must produce the *identical* QP
    assert c_s.engine.funcs.con_jac is not None and c_s.engine.funcs.y_jac is not None
    qp_d = c_d.engine._build_qp(st, c_d._fan(x0), *c_d.make_yref(win))[0]
    qp_s = c_s.engine._build_qp(st, c_s._fan(x0), *c_s.make_yref(win))[0]
    for f in qp_d._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(qp_s, f)), np.asarray(getattr(qp_d, f)), atol=1e-9
        )

    u_d, st_d, _ = c_d.engine.solve(st, c_d._fan(x0), *c_d.make_yref(win))
    u_s, st_s, _ = c_s.engine.solve(st, c_s._fan(x0), *c_s.make_yref(win))
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_d), atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_s.X), np.asarray(st_d.X), atol=1e-10)


def test_snmpc_uph_freeze_semantics():
    sim_cfg = SimConfig()
    ctrl = build_controller(MPCConfig(controller="snmpc"), sim_cfg)
    f = ctrl.engine.funcs
    x0 = jnp.array([0.0, 0.0, 0.2, 15.0, 0.1, 0.05, 0.01, 0.3])
    stacked = ctrl._fan(x0)
    u = jnp.array([0.4, 0.01])
    uph = ctrl.cfg.uncertainty_propagation_horizon
    nxt_live = np.asarray(f.dyn_step(0, stacked, u)).reshape(-1, 8)
    nxt_frozen = np.asarray(f.dyn_step(uph, stacked, u)).reshape(-1, 8)
    xs = np.asarray(stacked).reshape(-1, 8)
    # beyond the UPH the samples stay frozen, the nominal keeps integrating
    np.testing.assert_allclose(nxt_frozen[1:], xs[1:], rtol=0)
    assert np.abs(nxt_frozen[0] - xs[0]).max() > 1e-3
    # below the UPH every sample moves and the nominal is the PCE mean
    assert np.abs(nxt_live[1:] - xs[1:]).max() > 1e-3


def test_snmpc_constraint_is_nominal_beyond_uph():
    ctrl = build_controller(MPCConfig(controller="snmpc"), SimConfig())
    f = ctrl.engine.funcs
    x0 = jnp.array([0.0, 0.0, 0.2, 30.0, 0.1, 0.15, 0.01, 1.5])
    stacked = ctrl._fan(x0)
    uph = ctrl.cfg.uncertainty_propagation_horizon
    h_cc = np.asarray(f.con_stage(0, stacked))
    h_nom = np.asarray(f.con_stage(uph, stacked))
    # chance-constraint surrogate adds the kappa*sigma margin -> tighter value
    assert h_cc[0] > h_nom[0]


@pytest.mark.slow
def test_full_zoro_augmented_model():
    """Full-ZoRo augmented model (robust_utils): packed-symmetric round
    trip, Lyapunov covariance growth consistent with the discrete
    P_propagation of the reduced controller, and UPH freeze semantics
    (reference Robust_NMPC_pred_model_utils.py:47-183)."""
    from tum_control_tpu import config as cm
    from tum_control_tpu.config import load_tire_params, load_vehicle_params
    from tum_control_tpu.controllers import robust_utils as ru
    from tum_control_tpu.models.vehicle_stm import pred_ode

    sim_cfg = SimConfig()
    vp = load_vehicle_params(cm.DEFAULT_CONFIG_PATH, sim_cfg.veh_params_file_MPC)
    tp = load_tire_params(cm.DEFAULT_CONFIG_PATH, sim_cfg.tire_params_file_MPC)
    f = lambda x, u: pred_ode(x, u, vp, tp)

    # vec <-> sym round trip
    rng = np.random.default_rng(0)
    M = rng.normal(size=(8, 8))
    M = M + M.T
    np.testing.assert_allclose(
        np.asarray(ru.vec2sym_mat(ru.sym_mat2vec(jnp.asarray(M)))), M, atol=1e-14
    )

    dt = 0.08
    W = jnp.asarray(np.diag([0.01, 0.8, 0.35, 0.035]) ** 2)
    step = ru.make_aug_step(f, W, dt, substeps=8)
    x0 = jnp.asarray([0.0, 0.0, 0.2, 18.0, 0.05, 0.02, 0.01, 0.3])
    Sigma0 = jnp.asarray(np.diag([1e-5, 1e-5, 1e-4, 0.4, 0.17, 0.017, 1e-5, 1e-5]) ** 2)
    xa = ru.aug_initial_state(x0, Sigma0)
    u = jnp.asarray([0.2, 0.01])

    xa1 = step(xa, u, 0.0)
    Sigma1 = np.asarray(ru.vec2sym_mat(xa1[8:]))
    # nominal part matches the plain model integration
    from tum_control_tpu.models.integrators import rk4_multistep

    x1_plain = rk4_multistep(f, x0, u, dt, 8)
    np.testing.assert_allclose(np.asarray(xa1[:8]), np.asarray(x1_plain), atol=1e-10)
    # symmetric and PSD-ish
    np.testing.assert_allclose(Sigma1, Sigma1.T, atol=1e-12)
    assert np.linalg.eigvalsh(Sigma1).min() > -1e-12

    # consistency with the reduced controller's discrete propagation
    # Sigma' ~ A_d Sigma A_d' + dt * B W B' to O(dt^2)
    A_d = np.asarray(jax.jacfwd(lambda xx: rk4_multistep(f, xx, u, dt, 8))(x0))
    B = ru.B_SEL
    Sigma_disc = A_d @ np.asarray(Sigma0) @ A_d.T + dt * (B @ np.asarray(W) @ B.T)
    scale = max(np.abs(Sigma_disc).max(), 1e-12)
    assert np.abs(Sigma1 - Sigma_disc).max() / scale < 0.05

    # UPH freeze: stop_flag = 1 keeps Sigma constant while x propagates
    xa_frozen = step(xa, u, 1.0)
    np.testing.assert_allclose(np.asarray(xa_frozen[8:]), np.asarray(xa[8:]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xa_frozen[:8]), np.asarray(x1_plain), atol=1e-10)
