"""Fixed-step explicit integrators.

The reference discretizes with classical RK4 everywhere, with different
substep counts per role:

  * OCP shooting: ERK, 4 stages x 3 steps over Ts_MPC
    (NMPC_STM_acados_settings.py:238-240)
  * SNMPC discrete model: single RK4 step over Ts_MPC
    (Stochastic_NMPC/pred_model_dynamic_disc.py:187-208)
  * plant: CasADi 'rk' with 4 finite elements over Ts
    (Vehicle_Simulator/VehicleSimulator.py:73-77)

We expose a generic `rk4_multistep(f, x, u, dt, n_steps)` used for all three.
A plain python loop unrolls at trace time (n_steps is static and tiny).
"""
from __future__ import annotations


import jax


def rk4_step(f, x, u, dt):
    """One classical RK4 step of xdot = f(x, u)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_multistep(f, x, u, dt, n_steps: int):
    """n_steps RK4 sub-steps covering a total interval dt (zero-order-hold u)."""
    h = dt / n_steps
    for _ in range(n_steps):
        x = rk4_step(f, x, u, h)
    return x


def rk4_step_tree(f, x, u, dt):
    """RK4 step where the state is a pytree (e.g. a tuple of per-variable
    arrays — the structure-of-arrays form used inside Pallas kernels, where
    stacking variables into a trailing axis would force a bad lane layout)."""
    axpy = lambda a, k: jax.tree.map(lambda xi, ki: xi + a * ki, x, k)
    k1 = f(x, u)
    k2 = f(axpy(0.5 * dt, k1), u)
    k3 = f(axpy(0.5 * dt, k2), u)
    k4 = f(axpy(dt, k3), u)
    return jax.tree.map(
        lambda xi, a, b, c, d: xi + (dt / 6.0) * (a + 2.0 * b + 2.0 * c + d),
        x, k1, k2, k3, k4,
    )


def rk4_multistep_tree(f, x, u, dt, n_steps: int):
    """Pytree-state version of `rk4_multistep`."""
    h = dt / n_steps
    for _ in range(n_steps):
        x = rk4_step_tree(f, x, u, h)
    return x
