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


def acc_bounds(shape: int):
    """(lh, uh) per constraint row for the given shape."""
    if shape in (0, 1):
        return np.array([-1.0, -1.0]), np.array([1.0, 1.0])
    return np.array([0.0]), np.array([1.0])


def wrap_2pi(yaw):
    """Wrap to [0, 2pi) — the reference's fmod + negative-adjust
    (NMPC_STM_acados_settings.py:41-42). d/dyaw = 1 a.e."""
    return jnp.mod(yaw, 2.0 * jnp.pi)
