"""Shared controller pieces: gg-limit interpolation and acceleration
constraint shapes.

Replicates the velocity-varying combined lat/lon acceleration constraints of
the reference OCPs (NMPC_STM_acados_settings.py:62-119): gg-table lookup by
linear interpolation (`cs.interpolant` -> `jnp.interp`), asymmetric
longitudinal limit (braking uses -acc_min), and the three constraint shapes
(0 separate, 1 diamond, 2 circle).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_H = {0: 2, 1: 2, 2: 1}  # number of nonlinear constraint rows per shape


class GGTables:
    def __init__(self, vel, ax_max, ax_min, ay_max):
        self.vel = jnp.asarray(vel)
        self.ax_max = jnp.asarray(ax_max)
        self.ay_max = jnp.asarray(ay_max)
        # ax_min column unused by the controllers (kept for evaluation)
        self.ax_min = jnp.asarray(ax_min)

    def ay_lim(self, v):
        return jnp.interp(v, self.vel, self.ay_max)

    def ax_lim(self, v):
        return jnp.interp(v, self.vel, self.ax_max)


def acc_constraints(vel_abs, a_lon, a_lat, gg: GGTables, acc_min: float, shape: int):
    """Normalized acceleration constraint rows h(x) for one node.

    Returns (nh,) values; bounds are given by `acc_bounds(shape)`.
    """
    ay_max = gg.ay_lim(vel_abs)
    ax_max = jnp.where(a_lon < 0, -acc_min, gg.ax_lim(vel_abs))
    if shape == 0:
        return jnp.stack([a_lon / ax_max, a_lat / ay_max])
    if shape == 1:
        return jnp.stack([a_lon / ax_max + a_lat / ay_max, a_lon / ax_max - a_lat / ay_max])
    return jnp.stack([(a_lon / ax_max) ** 2 + (a_lat / ay_max) ** 2])


def interp_slope(x, xp, fp):
    """d/dx of jnp.interp(x, xp, fp), matching JAX's AD exactly: the active
    segment's slope in-range (right-continuous segment selection), 0 where
    the lookup clamps."""
    i = jnp.clip(jnp.searchsorted(xp, x, side="right"), 1, xp.shape[0] - 1)
    df = (fp[i] - fp[i - 1]) / (xp[i] - xp[i - 1])
    return jnp.where((x < xp[0]) | (x > xp[-1]), 0.0, df)


def acc_constraints_jac(x8, gg: GGTables, acc_min: float, shape: int):
    """Analytic value + Jacobian of the gg rows as a function of the 8-state
    [.,.,.,vlong,vlat,yawrate,.,a_lon]: h = acc_constraints(|v|, a_lon,
    vlong*yawrate) with |v| = sqrt(vlong^2+vlat^2).

    Returns (h (nh,), dh (nh, 8)). Hand-derived chain rule instead of
    jacfwd — jacfwd pushes 8 tangents through the interp/ratio graph per
    copy, which dominates SNMPC's QP assembly over (nodes x samples)
    (r3 dissection, VERDICT r3 weak #1). Values match `acc_constraints`
    bit-for-bit (same primitive graph); derivatives match jacfwd's
    convention (interp_slope above; `where` branch derivatives).
    """
    vlong, vlat, yawrate, a_lon = x8[3], x8[4], x8[5], x8[7]
    v = jnp.sqrt(vlong**2 + vlat**2)
    dv3, dv4 = vlong / v, vlat / v
    ay_m = gg.ay_lim(v)
    day = interp_slope(v, gg.vel, gg.ay_max)
    ax_i = gg.ax_lim(v)
    dax_i = interp_slope(v, gg.vel, gg.ax_max)
    neg = a_lon < 0
    ax_m = jnp.where(neg, -acc_min, ax_i)
    dax_m = jnp.where(neg, 0.0, dax_i)

    a_lat = vlong * yawrate
    rlon = a_lon / ax_m
    rlat = a_lat / ay_m
    # d rlon / d x
    t_lon = -a_lon * dax_m / ax_m**2
    dlon3, dlon4, dlon5, dlon7 = t_lon * dv3, t_lon * dv4, jnp.zeros_like(v), 1.0 / ax_m
    # d rlat / d x
    t_lat = -a_lat * day / ay_m**2
    dlat3 = yawrate / ay_m + t_lat * dv3
    dlat4 = t_lat * dv4
    dlat5 = vlong / ay_m
    dlat7 = jnp.zeros_like(v)

    def row(d3, d4, d5, d7):
        r = jnp.zeros(8, dtype=x8.dtype)
        return r.at[3].set(d3).at[4].set(d4).at[5].set(d5).at[7].set(d7)

    if shape == 0:
        h = jnp.stack([rlon, rlat])
        dh = jnp.stack([row(dlon3, dlon4, dlon5, dlon7), row(dlat3, dlat4, dlat5, dlat7)])
    elif shape == 1:
        h = jnp.stack([rlon + rlat, rlon - rlat])
        dh = jnp.stack(
            [
                row(dlon3 + dlat3, dlon4 + dlat4, dlon5 + dlat5, dlon7 + dlat7),
                row(dlon3 - dlat3, dlon4 - dlat4, dlon5 - dlat5, dlon7 - dlat7),
            ]
        )
    else:
        h = jnp.stack([rlon**2 + rlat**2])
        dh = jnp.stack(
            [
                row(
                    2 * (rlon * dlon3 + rlat * dlat3),
                    2 * (rlon * dlon4 + rlat * dlat4),
                    2 * (rlon * dlon5 + rlat * dlat5),
                    2 * (rlon * dlon7 + rlat * dlat7),
                )
            ]
        )
    return h, dh


def acc_bounds(shape: int):
    """(lh, uh) per constraint row for the given shape."""
    if shape in (0, 1):
        return np.array([-1.0, -1.0]), np.array([1.0, 1.0])
    return np.array([0.0]), np.array([1.0])


def wrap_2pi(yaw):
    """Wrap to [0, 2pi) — the reference's fmod + negative-adjust
    (NMPC_STM_acados_settings.py:41-42). d/dyaw = 1 a.e."""
    return jnp.mod(yaw, 2.0 * jnp.pi)
