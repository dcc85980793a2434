"""Soft-QP solver tests: exactness, consistency, hard-row handling.

The synthetic QPs here are *harsher* than the real RTI subproblems (dense
random rows, O(1) initial violations of hard constraints, widely spread
penalties) — if the solver is exact on these, the warm-started OCP QPs are
easy."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from tum_control_tpu.ops.ipm import solve_soft_qp_ipm
from tum_control_tpu.ops.soft_qp import CondensedQP, objective, solve_soft_qp


def _random_qp(rng, nz=12, nc=20, hard_rows=2):
    A = rng.standard_normal((nz + 4, nz))
    H0 = A.T @ A / nz + 0.1 * np.eye(nz)
    g0 = rng.standard_normal(nz)
    G = rng.standard_normal((nc, nz))
    c0 = rng.standard_normal(nc)
    lb = -rng.uniform(0.1, 1.0, nc)
    ub = rng.uniform(0.1, 1.0, nc)
    z1 = rng.uniform(10.0, 200.0, nc)
    z2 = rng.uniform(1.0, 20.0, nc)
    z1[:hard_rows] = 0.0
    z2[:hard_rows] = 1e7
    return CondensedQP(
        H0=jnp.array(H0), g0=jnp.array(g0), G=jnp.array(G), c0=jnp.array(c0),
        lb=jnp.array(lb), ub=jnp.array(ub), z1=jnp.array(z1), z2=jnp.array(z2),
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beats_scipy_and_self_consistent(seed):
    rng = np.random.default_rng(seed)
    qp = _random_qp(rng)

    res = minimize(
        lambda w: float(objective(qp, jnp.array(w))),
        np.zeros(qp.H0.shape[0]),
        method="Nelder-Mead",
        options={"maxiter": 8000, "xatol": 1e-8, "fatol": 1e-10},
    )
    w, _ = solve_soft_qp_ipm(qp, n_iters=50, n_polish=2)
    w2, _ = solve_soft_qp_ipm(qp, n_iters=90, n_polish=4)
    f1 = float(objective(qp, w))
    f2 = float(objective(qp, w2))
    # at least as good as the generic optimizer, and converged (more
    # iterations change nothing)
    assert f1 <= res.fun + 1e-4
    assert abs(f1 - f2) <= 1e-6 * max(1.0, abs(f2))
    np.testing.assert_allclose(np.array(w), np.array(w2), atol=1e-4)


def test_unconstrained_limit():
    """With all rows slack-free (z -> 0), solution is -H0^-1 g0."""
    rng = np.random.default_rng(7)
    qp = _random_qp(rng, hard_rows=0)
    qp = qp._replace(z1=jnp.zeros_like(qp.z1), z2=jnp.zeros_like(qp.z2))
    w, kkt = solve_soft_qp(qp, n_iters=5)
    w_exact = np.linalg.solve(np.array(qp.H0), -np.array(qp.g0))
    np.testing.assert_allclose(np.array(w), w_exact, rtol=1e-6, atol=1e-8)


def test_hard_rows_respected():
    rng = np.random.default_rng(3)
    qp = _random_qp(rng, nc=10, hard_rows=10)
    w, _ = solve_soft_qp_ipm(qp, n_iters=60, n_polish=0)
    v = np.array(qp.G @ w + qp.c0)
    assert np.all(v <= np.array(qp.ub) + 1e-4)
    assert np.all(v >= np.array(qp.lb) - 1e-4)


def test_soft_only_warm_rti_like():
    """RTI-like scenario: moderate penalties, small violations -> few iters."""
    rng = np.random.default_rng(11)
    qp = _random_qp(rng, nz=16, nc=30, hard_rows=0)
    # shrink c0 so the start is nearly feasible (warm-started RTI regime)
    qp = qp._replace(c0=0.05 * qp.c0)
    w_fast, _ = solve_soft_qp_ipm(qp, n_iters=20, n_polish=2)
    w_ref, _ = solve_soft_qp_ipm(qp, n_iters=80, n_polish=4)
    # 20 iters lands within RTI-grade accuracy of the fully converged point
    assert float(objective(qp, w_fast)) <= float(objective(qp, w_ref)) + 1e-3


@pytest.mark.parametrize("seed", [0, 1])
def test_identity_tail_rows_equivalent(seed):
    """n_id > 0 (analytic identity rows) must match the same QP with the
    identity block stored explicitly in G (the pre-split formulation)."""
    rng = np.random.default_rng(seed)
    nz, ncg = 10, 14
    base = _random_qp(rng, nz=nz, nc=ncg, hard_rows=1)
    # identity-tail row data (input-box analog: finite bounds, soft)
    lb_u = -rng.uniform(0.2, 1.0, nz)
    ub_u = rng.uniform(0.2, 1.0, nz)
    z1_u = rng.uniform(10.0, 100.0, nz)
    z2_u = rng.uniform(1.0, 10.0, nz)

    split = CondensedQP(
        H0=base.H0, g0=base.g0, G=base.G,
        c0=jnp.concatenate([base.c0, jnp.zeros(nz)]),
        lb=jnp.concatenate([base.lb, jnp.array(lb_u)]),
        ub=jnp.concatenate([base.ub, jnp.array(ub_u)]),
        z1=jnp.concatenate([base.z1, jnp.array(z1_u)]),
        z2=jnp.concatenate([base.z2, jnp.array(z2_u)]),
    )
    full = split._replace(G=jnp.concatenate([base.G, jnp.eye(nz)], axis=0))

    w_full, kkt_full = solve_soft_qp_ipm(full, n_iters=40, n_polish=2)
    w_split, kkt_split = solve_soft_qp_ipm(split, n_iters=40, n_polish=2, n_id=nz)
    np.testing.assert_allclose(np.array(w_split), np.array(w_full), atol=1e-7)
    assert float(objective(split, w_split, n_id=nz)) == pytest.approx(
        float(objective(full, w_full)), abs=1e-8
    )
