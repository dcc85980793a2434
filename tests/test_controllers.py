"""Controller-specific unit tests: R2 tightening semantics, SNMPC behavior."""
import jax
import jax.numpy as jnp
import numpy as np

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
