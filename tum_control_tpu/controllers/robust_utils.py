"""Full-ZoRo augmented model: state covariance inside the ODE state with
continuous-time Lyapunov dynamics.

TPU-native equivalent of the reference's non-reduced zoRO formulation
(Robust_NMPC_pred_model_utils.py:47-183, after Zanelli et al., "Zero-order
robust nonlinear MPC with ellipsoidal uncertainty sets", IFAC 2021): the
augmented state is [x (8), vec_sym(Sigma) (36)] and

    Sigma_dot = D Sigma + Sigma D' + B W B'

with D = df/dx evaluated at the nominal state (via `jax.jacfwd` instead of
the reference's hand-pasted CasADi jacobian; the reference additionally
zeros rows/cols {(4,4),(5,3),(5,4),(5,5)} of D "for performance" — we keep
the exact jacobian), B the selector injecting disturbances on
[yaw, vlong, vlat, yawrate], and a stop flag freezing Sigma beyond the
uncertainty propagation horizon. The reduced controller (rnmpc.py) remains
the production path — this module provides the non-reduced formulation for
parity and comparison; like upstream it is not wired into a controller.

The symmetric-matrix <-> packed-vector layout matches the reference's
row-major lower-triangle-by-rows packing (vec2sym_mat/sym_mat2vec,
ibid.:185-218): vec = [M[0,0:], M[1,1:], ..., M[nx-1,nx-1]].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NX = 8
NSIG = NX * (NX + 1) // 2

# disturbance enters [yaw, vlong, vlat, yawrate] (reference B, ibid.:92-100)
B_SEL = np.zeros((NX, 4))
B_SEL[2, 0] = B_SEL[3, 1] = B_SEL[4, 2] = B_SEL[5, 3] = 1.0

# static (row, col) index tables for the packed layout
_rows, _cols = [], []
for _i in range(NX):
    for _j in range(_i, NX):
        _rows.append(_i)
        _cols.append(_j)
_ROWS = np.asarray(_rows)
_COLS = np.asarray(_cols)


def vec2sym_mat(vec):
    """(NSIG,) packed upper-triangle-by-rows -> (NX, NX) symmetric."""
    mat = jnp.zeros((NX, NX), dtype=vec.dtype)
    mat = mat.at[_ROWS, _COLS].set(vec)
    return jnp.where(jnp.eye(NX, dtype=bool), mat, mat + mat.T)


def sym_mat2vec(mat):
    """(NX, NX) symmetric -> (NSIG,) packed upper-triangle-by-rows."""
    return mat[_ROWS, _COLS]


def aug_ode(f_nominal, x_aug, u, W_dist, stop_flag=0.0):
    """Augmented dynamics [x_dot, vec(Sigma_dot)].

    f_nominal : (x (8,), u (2,)) -> x_dot (8,)   the nominal prediction ODE
    W_dist    : (4, 4) disturbance covariance on [yaw, vlong, vlat, yawrate]
    stop_flag : 1.0 freezes Sigma (UPH semantics, ibid.:152-162)
    """
    x, sig_vec = x_aug[:NX], x_aug[NX:]
    x_dot = f_nominal(x, u)
    D = jax.jacfwd(lambda xx: f_nominal(xx, u))(x)
    Sigma = vec2sym_mat(sig_vec)
    B = jnp.asarray(B_SEL, dtype=x.dtype)
    Sigma_dot = D @ Sigma + Sigma @ D.T + B @ W_dist @ B.T
    Sigma_dot = jnp.where(stop_flag == 1.0, jnp.zeros_like(Sigma_dot), Sigma_dot)
    return jnp.concatenate([x_dot, sym_mat2vec(Sigma_dot)])


def make_aug_step(f_nominal, W_dist, dt: float, substeps: int = 3):
    """RK4 discrete step of the augmented model; returns
    (x_aug (44,), u (2,), stop_flag) -> x_aug_next."""
    from tum_control_tpu.models.integrators import rk4_multistep

    def step(x_aug, u, stop_flag=0.0):
        f = lambda xa, uu: aug_ode(f_nominal, xa, uu, W_dist, stop_flag)
        return rk4_multistep(f, x_aug, u, dt, substeps)

    return step


def aug_initial_state(x0, Sigma0):
    """[x0, vec_sym(Sigma0)] (44,)."""
    return jnp.concatenate([jnp.asarray(x0), sym_mat2vec(jnp.asarray(Sigma0))])
