"""Transcendentals missing from the Pallas TPU lowering set.

Mosaic lowers sin/cos/tan/sqrt/rsqrt/exp/log natively but has no arctan
(checked against jax._src.pallas.mosaic.lowering rules). `atan_poly` is a
branch-free Cephes-style atanf: 3-interval argument reduction + a degree-9
odd minimax polynomial, |rel err| < 3e-7 over the full range — at and below
f32 roundoff for the slip-angle/Pacejka uses in the vehicle model.

Gradient correctness at 0 matters (the cold-start linearization evaluates
slip angles at exactly 0): the |x| <= tan(pi/8) branch is the plain odd
polynomial x*P(x^2) with P(0) = 1, so d/dx at 0 is exactly 1; `sign`/`abs`
appear only in the outer branches where they are locally constant.
"""
from __future__ import annotations

import jax.numpy as jnp

_TAN_PI_8 = 0.41421356237309503
_TAN_3PI_8 = 2.414213562373095


def atan_poly(x):
    """Branch-free f32 arctan (Pallas-lowerable: where/sign/mul/add only)."""
    ax = jnp.abs(x)
    sgn = jnp.sign(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8

    x_big = -1.0 / jnp.where(big, x, 1.0)                 # sign-correct: atan(x) = sgn*pi/2 + atan(-1/x)
    x_mid = sgn * (ax - 1.0) / (ax + 1.0)                 # atan(x) = sgn*(pi/4 + atan((|x|-1)/(|x|+1)))
    xr = jnp.where(big, x_big, jnp.where(mid, x_mid, x))
    z = xr * xr
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * xr + xr
    off = jnp.where(
        big, sgn * (jnp.pi / 2), jnp.where(mid, sgn * (jnp.pi / 4), 0.0)
    )
    return off + p
