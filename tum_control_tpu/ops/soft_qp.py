"""Exact solver for soft-constrained condensed QPs (the HPIPM replacement).

The reference delegates each RTI quadratic subproblem to HPIPM after full
condensing (NMPC_STM_acados_settings.py:231: FULL_CONDENSING_HPIPM). A key
structural fact of the reference OCPs is that *every* inequality is softened
with L1+L2 slack penalties (Jsbu/Jsbx/Jsh = identity, ibid.:164-224) — the
only hard constraints are the dynamics and the initial state, which
condensing eliminates. Optimal slacks then have the closed form
s* = max(0, violation), so the QP is *exactly* equivalent to the
unconstrained strictly-convex piecewise-quadratic program

    min_w  0.5 w'H0 w + g0'w + sum_i psi_i(G_i w + c0_i)

    psi_i(v) = z1_i max(0, v - ub_i) + 0.5 z2_i max(0, v - ub_i)^2
             + z1_i max(0, lb_i - v) + 0.5 z2_i max(0, lb_i - v)^2

(acados slack cost convention: zl's + 0.5 s'Zl s). We solve it with a
semismooth (active-set reweighted) Newton method: each iteration assembles
H = H0 + G' D G over the currently violated rows, takes a Cholesky step and
a vectorized best-of-alpha line search on the exact objective. The problem
is piecewise quadratic, so once the active set settles a single full step
lands on the exact minimizer — the same point HPIPM's interior point
converges to. Fixed iteration count, static shapes, batched via `vmap`:
one TPU program solves thousands of QPs.

Hard rows (e.g. the node-0 input bound, which acados keeps unsoftened:
Zl_0 has only nh entries, NMPC_STM_acados_settings.py:192-198) are encoded
with z1 = 0 and a large z2.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import os

from tum_control_tpu.ops.pallas_kernels.chol import chol_apply_packed, chol_factor_packed

# Residual/gradient matvecs run f32-exact: the MXU's default bf16-pass
# matmul noise (~1e-3 relative) on the *gradient* biases the QP solution
# directly (multi-meter closed-loop weave on high-speed straights, see
# RTIEngine.solve_full); noise on the normal MATRIX only perturbs the
# Newton direction, which the iteration corrects — so matrix-matrix
# products stay at default precision (full speed).
HI = jax.lax.Precision.HIGHEST

# Lowering strategy for the f32-exact matvecs: "vpu" (default) evaluates
# them as broadcast-multiply + reduce — exact f32 on the VPU, no MXU pass
# decomposition; "mxu" uses dot(..., precision=HIGHEST) (6-pass bf16 on the
# MXU). Measured on v5e at batch 256 (BENCH r3 A/B, identical closed-loop
# quality p99 0.777 m): vpu 137.7k solves/s vs mxu 129.5k — batched matvecs
# are a degenerate MXU shape (1 effective RHS column), the VPU path is both
# exact and faster. Env knob kept for future hardware re-evaluation.
_MATVEC = os.environ.get("TUM_QP_MATVEC", "vpu")
_NORMAL_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("TUM_QP_NORMAL", "high")]


def _mv(A, x):
    """A @ x, f32-exact. VPU mode: elementwise mul + reduce (exact, no MXU)."""
    if _MATVEC == "vpu":
        return jnp.sum(A * x[None, :], axis=-1)
    return jnp.dot(A, x, precision=HI)


def _mtv(A, y):
    """A.T @ y, f32-exact."""
    if _MATVEC == "vpu":
        return jnp.sum(A * y[:, None], axis=-2)
    return jnp.dot(A.T, y, precision=HI)


class CondensedQP(NamedTuple):
    """Soft QP data. `G` holds only the *general* constraint rows; when
    `n_id > 0` (passed separately to the solvers — it must stay a static
    python int, not a pytree leaf), the constraint system is understood as
    the general rows followed by `n_id = nz` identity rows over w (the
    condensed input-box rows, whose Jacobian is exactly the identity).
    c0/lb/ub/z1/z2 cover general rows first, identity rows last. Storing
    and multiplying the identity block explicitly would double the IPM's
    constraint matmul work for nothing."""

    H0: jnp.ndarray   # (nz, nz) positive-definite base Hessian
    g0: jnp.ndarray   # (nz,)
    G: jnp.ndarray    # (nc_g, nz) general constraint rows
    c0: jnp.ndarray   # (nc_g + n_id,) constraint values at w = 0
    lb: jnp.ndarray   # (nc_g + n_id,)
    ub: jnp.ndarray   # (nc_g + n_id,)
    z1: jnp.ndarray   # (nc_g + n_id,) linear slack penalty
    z2: jnp.ndarray   # (nc_g + n_id,) quadratic slack penalty


def con_mul(qp: CondensedQP, w, n_id: int = 0):
    """Full constraint-Jacobian product [G; I] w (f32-exact)."""
    Gw = _mv(qp.G, w)
    return jnp.concatenate([Gw, w]) if n_id else Gw


def con_tmul(qp: CondensedQP, y, n_id: int = 0):
    """Transpose product [G; I]' y (f32-exact)."""
    ncg = qp.G.shape[0]
    Gty = _mtv(qp.G, y[:ncg] if n_id else y)
    return Gty + y[ncg:] if n_id else Gty


def con_normal(qp: CondensedQP, d, n_id: int = 0):
    """[G; I]' diag(d) [G; I] without forming the identity block.

    The normal-matrix product needs more than single-pass bf16 (with the
    fixed iteration budget, direction errors from a noisy H do not wash
    out — measured multi-meter closed-loop drift), but 3-pass bf16 (HIGH,
    ~1e-6 relative) is enough; f32-exact (HIGHEST) doubles the cost for no
    measurable closed-loop difference."""
    ncg = qp.G.shape[0]
    H = jnp.matmul(qp.G.T * d[None, :ncg], qp.G, precision=_NORMAL_PREC)
    if n_id:
        H = H + jnp.diag(d[ncg:])
    return H


def _penalty(qp: CondensedQP, v):
    du = v - qp.ub
    dl = qp.lb - v
    pu = jnp.where(du > 0, qp.z1 * du + 0.5 * qp.z2 * du * du, 0.0)
    plo = jnp.where(dl > 0, qp.z1 * dl + 0.5 * qp.z2 * dl * dl, 0.0)
    return jnp.sum(pu + plo)


def objective(qp: CondensedQP, w, n_id: int = 0):
    return 0.5 * w @ _mv(qp.H0, w) + qp.g0 @ w + _penalty(qp, con_mul(qp, w, n_id) + qp.c0)


def solve_soft_qp(qp: CondensedQP, n_iters: int = 15, reg: float = 1e-9, n_id: int = 0):
    """Semismooth-Newton solve from w = 0; returns (w*, kkt_residual_inf)."""
    w0 = jnp.zeros(qp.H0.shape[0], dtype=qp.H0.dtype)
    return newton_polish(qp, w0, n_iters=n_iters, reg=reg, n_id=n_id)


def newton_polish(qp: CondensedQP, w0, n_iters: int = 15, reg: float = 1e-9, n_id: int = 0):
    """Semismooth Newton with exact (bisection) line search from w0."""
    nz = qp.H0.shape[0]
    eye = jnp.eye(nz, dtype=qp.H0.dtype)

    def body(w, _):
        v = con_mul(qp, w, n_id) + qp.c0
        du = v - qp.ub
        dl = qp.lb - v
        au = du > 0
        al = dl > 0
        gamma = jnp.where(au, qp.z1 + qp.z2 * du, 0.0) - jnp.where(al, qp.z1 + qp.z2 * dl, 0.0)
        d = jnp.where(au | al, qp.z2, 0.0)
        grad = _mv(qp.H0, w) + qp.g0 + con_tmul(qp, gamma, n_id)
        H = qp.H0 + con_normal(qp, d, n_id) + reg * eye
        L = chol_factor_packed(H)
        p = -chol_apply_packed(L, grad)

        # exact line search: phi(alpha) = objective(w + alpha p) is convex
        # piecewise quadratic, so phi'(alpha) is nondecreasing piecewise
        # linear — find its root by bracket expansion + bisection.
        s = con_mul(qp, p, n_id)
        q1 = (_mv(qp.H0, w) + qp.g0) @ p  # phi'(0) of the smooth part
        q2 = p @ _mv(qp.H0, p)

        def dphi(alpha):
            va = v + alpha * s
            duu = va - qp.ub
            dll = qp.lb - va
            pen = jnp.where(duu > 0, qp.z1 + qp.z2 * duu, 0.0) - jnp.where(
                dll > 0, qp.z1 + qp.z2 * dll, 0.0
            )
            return q1 + q2 * alpha + pen @ s

        # expand the bracket: smallest 2^k (k <= 8) with dphi >= 0
        ks = 2.0 ** jnp.arange(9)
        dvals = jax.vmap(dphi)(ks)
        pos = dvals >= 0
        hi = jnp.where(jnp.any(pos), ks[jnp.argmax(pos)], ks[-1])

        def bisect(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            up = dphi(mid) > 0
            return jnp.where(up, lo, mid), jnp.where(up, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 45, bisect, (jnp.zeros_like(hi), hi))
        alpha = 0.5 * (lo + hi)
        # guard NaN directions (singular H despite reg): keep w
        w_new = w + alpha * p
        w_new = jnp.where(jnp.all(jnp.isfinite(w_new)), w_new, w)
        return w_new, jnp.max(jnp.abs(grad))

    w, kkts = jax.lax.scan(body, w0, None, length=n_iters)

    # final KKT residual at the solution
    v = con_mul(qp, w, n_id) + qp.c0
    du = v - qp.ub
    dl = qp.lb - v
    gamma = jnp.where(du > 0, qp.z1 + qp.z2 * du, 0.0) - jnp.where(dl > 0, qp.z1 + qp.z2 * dl, 0.0)
    kkt = jnp.max(jnp.abs(_mv(qp.H0, w) + qp.g0 + con_tmul(qp, gamma, n_id)))
    return w, kkt
