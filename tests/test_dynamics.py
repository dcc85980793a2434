"""Vehicle model unit tests: hand values, finite differences, NaN safety."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tum_control_tpu.models.integrators import rk4_multistep, rk4_step
from tum_control_tpu.models.vehicle_stm import VLONG_EPS, pred_ode, sim_ode, sim_ode_disturbed
from tum_control_tpu.params import TireParams, VehicleParams

VP = VehicleParams()
TP = TireParams()


def _numpy_pred_ode(x, u):
    """Independent numpy re-derivation of the prediction ODE for cross-checks."""
    posx, posy, yaw, vlong, vlat, yawrate, delta, a = x
    jerk, srate = u
    g = 9.81
    vk = np.hypot(vlong, vlat) * 3.6
    fr = 0.009 + 0.002 * vk / 100 + 0.0003 * (vk / 100) ** 4
    Fzf = VP.m * VP.lr * g / (VP.lf + VP.lr)
    Fzr = VP.m * VP.lf * g / (VP.lf + VP.lr)
    Fxf = -fr * Fzf
    Fxr = VP.m * a - fr * Fzr
    Faero = 0.5 * VP.ro * VP.S * VP.Cd * vlong**2
    if vlong > VLONG_EPS:
        af = delta - np.arctan((vlat + VP.lf * yawrate) / vlong)
        ar = np.arctan((VP.lr * yawrate - vlat) / vlong)
    else:
        af = ar = 0.0
    pac = lambda al, B, C, D, E: D * np.sin(C * np.arctan(B * al - E * (B * al - np.arctan(B * al))))
    Fyf = pac(af, TP.Bf, TP.Cf, TP.Df, TP.Ef)
    Fyr = pac(ar, TP.Br, TP.Cr, TP.Dr, TP.Er)
    Fmaxf = np.sqrt(Fzf**2 + (TP.Cf * Fzf) ** 2)
    Fmaxr = np.sqrt(Fzr**2 + (TP.Cr * Fzr) ** 2)
    Fyf *= np.cos(np.arcsin(np.clip(Fxf / Fmaxf, -0.98, 0.98)))
    Fyr *= np.cos(np.arcsin(np.clip(Fxr / Fmaxr, -0.98, 0.98)))
    cd, sd = np.cos(delta), np.sin(delta)
    return np.array(
        [
            vlong * np.cos(yaw) - vlat * np.sin(yaw),
            vlong * np.sin(yaw) + vlat * np.cos(yaw),
            yawrate,
            (Fxr - Faero - Fyf * sd + Fxf * cd + VP.m * vlat * yawrate) / VP.m,
            (Fyr + Fyf * cd + Fxf * sd - VP.m * vlong * yawrate) / VP.m,
            (VP.lf * (Fyf * cd + Fxf * sd) - VP.lr * Fyr) / VP.Iz,
            srate,
            jerk,
        ]
    )


@pytest.mark.parametrize(
    "x,u",
    [
        (np.array([10.0, -5.0, 0.3, 20.0, 0.5, 0.1, 0.02, 1.0]), np.array([0.5, 0.01])),
        (np.array([0.0, 0.0, 2.5, 37.5, -0.8, -0.4, -0.1, -2.0]), np.array([-3.0, 0.1])),
        (np.array([1.0, 1.0, 6.0, 5.0, 0.0, 0.0, 0.3, 0.0]), np.array([0.0, -0.2])),
    ],
)
def test_pred_ode_matches_independent_numpy(x, u):
    got = np.array(pred_ode(jnp.array(x), jnp.array(u), VP, TP))
    want = _numpy_pred_ode(x, u)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_sim_ode_consistent_with_pred_ode():
    """The 7-state plant ODE equals the 8-state model with a as an input."""
    x8 = np.array([3.0, 4.0, 1.0, 15.0, 0.3, 0.2, 0.05, 1.5])
    u8 = np.array([0.7, 0.03])
    x7 = x8[:7]
    u7 = np.array([x8[7], u8[1]])
    d8 = np.array(pred_ode(jnp.array(x8), jnp.array(u8), VP, TP))
    d7 = np.array(sim_ode(jnp.array(x7), jnp.array(u7), VP, TP))
    np.testing.assert_allclose(d7, d8[:7], rtol=1e-12)


def test_disturbed_ode_additive():
    x = jnp.array([0.0, 0.0, 0.5, 12.0, 0.1, 0.05, 0.02])
    u = jnp.array([1.0, 0.01])
    w = jnp.array([0.1, -0.2, 0.01, 0.5, -0.05, 0.02, 0.03])
    np.testing.assert_allclose(
        np.array(sim_ode_disturbed(x, u, w, VP, TP)),
        np.array(sim_ode(x, u, VP, TP)) + np.array(w),
        rtol=1e-12,
    )


def test_low_speed_no_nan_values_and_grads():
    for vl in [0.0, 5e-4, 1e-3, 2e-3]:
        x = jnp.array([0.0, 0.0, 0.0, vl, 0.0, 0.0, 0.1, 0.5])
        u = jnp.array([1.0, 0.1])
        d = pred_ode(x, u, VP, TP)
        assert np.all(np.isfinite(np.array(d)))
        J = jax.jacfwd(lambda xx: pred_ode(xx, u, VP, TP))(x)
        assert np.all(np.isfinite(np.array(J)))


def test_jacobian_matches_finite_differences():
    x = jnp.array([2.0, -1.0, 0.8, 22.0, 0.4, 0.15, -0.04, 0.8])
    u = jnp.array([0.3, -0.05])
    J = np.array(jax.jacfwd(lambda xx: pred_ode(xx, u, VP, TP))(x))
    eps = 1e-6
    for i in range(8):
        dx = np.zeros(8)
        dx[i] = eps
        fd = (
            np.array(pred_ode(jnp.array(x) + dx, u, VP, TP))
            - np.array(pred_ode(jnp.array(x) - dx, u, VP, TP))
        ) / (2 * eps)
        np.testing.assert_allclose(J[:, i], fd, rtol=1e-5, atol=1e-6)


def test_rk4_convergence_order():
    """RK4 halving the step should cut the error by ~2^4."""
    x = jnp.array([0.0, 0.0, 0.1, 25.0, 0.2, 0.1, 0.03, 1.0])
    u = jnp.array([0.5, 0.05])
    f = lambda xx, uu: pred_ode(xx, uu, VP, TP)
    ref = rk4_multistep(f, x, u, 0.08, 64)
    e1 = np.abs(np.array(rk4_multistep(f, x, u, 0.08, 1) - ref)).max()
    e2 = np.abs(np.array(rk4_multistep(f, x, u, 0.08, 2) - ref)).max()
    assert e1 / e2 > 10.0


@pytest.mark.golden
def test_plant_step_against_golden_log(golden_nmpc_log):
    """One plant RK4 step from golden states reproduces the next golden state.

    The committed ACC24 runs used an older tire parametrization (see
    docs/PARITY.md), so the tolerance here is the documented model-drift
    bound, not solver accuracy.
    """
    d = golden_nmpc_log
    CiLX, MPC_SimX, simU = d["CiLX"], d["MPC_SimX"], d["simU"]
    f = lambda x, u: sim_ode(x, u, VP, TP)
    idxs = [0, 10, 500, 2500, 5000]
    for i in idxs:
        x = jnp.array(CiLX[i])
        u = jnp.array([MPC_SimX[i + 1, 7], simU[i, 1]])
        xn = np.array(rk4_multistep(f, x, u, 0.02, 4))
        err = np.abs(xn - CiLX[i + 1])
        err[2] = np.abs((err[2] + np.pi) % (2 * np.pi) - np.pi)
        assert err.max() < 0.05
