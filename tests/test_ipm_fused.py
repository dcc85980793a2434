"""Exactness of the fused IPM-iteration Pallas kernel vs the jnp reference.

The kernel (ops/pallas_kernels/ipm_iter.py) runs in interpret mode here
(CPU CI); on hardware the same code path is exercised by bench.py and the
TPU quality gates. Random soft QPs with mixed hard/soft/one-sided rows,
f32 (the kernel's production dtype).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tum_control_tpu.ops.pallas_kernels.ipm_iter import (
    LANES,
    fused_iteration_batched,
    iteration_ref,
    sigma_of,
    _lanes,
    _unlanes,
)

BIG = 1e12
HARD = 1e7


def _random_problem(B, nz, ncg, seed=0):
    rng = np.random.default_rng(seed)
    nc = ncg + nz
    G = rng.standard_normal((B, ncg, nz)).astype(np.float32)
    A = rng.standard_normal((B, nz, nz + 4)).astype(np.float32)
    H0 = np.einsum("bij,bkj->bik", A, A) / nz + 2.0 * np.eye(nz, dtype=np.float32)
    g0 = rng.standard_normal((B, nz)).astype(np.float32)
    c0 = rng.standard_normal((B, nc)).astype(np.float32)
    lb = (c0 - np.abs(rng.standard_normal((B, nc))) - 0.1).astype(np.float32)
    ub = (c0 + np.abs(rng.standard_normal((B, nc))) + 0.1).astype(np.float32)
    # row variety: some upper-only, some hard
    ub[:, ::7] = BIG * 10
    lb[:, 1::5] = -BIG * 10
    z1 = np.abs(rng.standard_normal((B, nc))).astype(np.float32) * 5 + 0.5
    z2 = np.abs(rng.standard_normal((B, nc))).astype(np.float32) * 5 + 0.5
    z2[:, 2::6] = HARD
    return (jnp.asarray(H0), jnp.asarray(g0), jnp.asarray(G), jnp.asarray(c0),
            jnp.asarray(lb), jnp.asarray(ub), jnp.asarray(z1), jnp.asarray(z2))


def _init_carry(c0, lb, ub, z2, nz):
    B, nc = c0.shape
    act_u = ub < 1e10
    act_l = lb > -1e10
    soft = z2 < 1e6
    s_u = act_u & soft
    s_l = act_l & soft
    ones = jnp.ones((B, nc), jnp.float32)
    su = jnp.where(s_u, ones, 0.0)
    sl = jnp.where(s_l, ones, 0.0)
    pu = jnp.where(act_u, jnp.maximum(ub + su - c0, 1.0), 1.0)
    pl = jnp.where(act_l, jnp.maximum(c0 + sl - lb, 1.0), 1.0)
    lam_u = jnp.where(act_u, ones, 0.0)
    lam_l = jnp.where(act_l, ones, 0.0)
    mu_u = jnp.where(s_u, ones, 0.0)
    mu_l = jnp.where(s_l, ones, 0.0)
    w = jnp.zeros((B, nz), jnp.float32)
    Gw = jnp.zeros((B, nc), jnp.float32)
    nt = (act_u.sum(1) + act_l.sum(1) + s_u.sum(1) + s_l.sum(1)).astype(jnp.float32)
    return (w, Gw, su, sl, pu, pl, lam_u, lam_l, mu_u, mu_l), nt, (act_u, act_l, s_u, s_l)


@pytest.mark.parametrize("nz,ncg", [(12, 10), (16, 6)])
def test_fused_iteration_matches_reference(nz, ncg):
    B = LANES
    H0, g0, G, c0, lb, ub, z1, z2 = _random_problem(B, nz, ncg)
    carry, nt, masks = _init_carry(c0, lb, ub, z2, nz)
    act_u, act_l, s_u, s_l = masks
    npad = -(-nz // 16) * 16

    # reference: sigma -> H -> cholesky -> iteration_ref, per scenario
    sig = jax.vmap(
        lambda *a: sigma_of(*a)
    )(*[c for c in carry[2:10]], z1, z2, act_u, act_l, s_u, s_l)
    eye = jnp.eye(nz, dtype=jnp.float32)
    Hn = jnp.einsum("bic,bi,bid->bcd", G, sig[:, :ncg], G)
    H = H0 + Hn + (sig[:, ncg:, None] + 1e-11) * eye[None]
    L = jnp.linalg.cholesky(H.astype(jnp.float64)).astype(jnp.float32)

    lam_d_r = carry[6] - carry[7]
    rw_r = (
        jnp.sum(H0 * carry[0][:, None, :], axis=2) + g0
        + jnp.sum(G * lam_d_r[:, :ncg, None], axis=1) + lam_d_r[:, ncg:]
    )
    ref_out = jax.vmap(
        lambda *a: iteration_ref(*a, n_id=nz, gamma_ftb=0.99)
    )(L, G, rw_r, c0, lb, ub, z1, z2, nt, *carry)
    ref_carry, ref_sig, ref_unc = ref_out

    # kernel (interpret mode): pad L to npad with identity tail
    Lp = jnp.zeros((B, npad, npad), jnp.float32)
    Lp = Lp.at[:, :nz, :nz].set(L)
    tail = jnp.arange(npad) >= nz
    Lp = Lp + jnp.where(tail, 1.0, 0.0) * jnp.eye(npad, dtype=jnp.float32)[None]
    lanes_mat = lambda a: jnp.transpose(
        a.reshape(B // LANES, LANES, a.shape[1], a.shape[2]), (0, 2, 3, 1)
    )
    lam_d = carry[6] - carry[7]
    rw = (
        jnp.sum(H0 * carry[0][:, None, :], axis=2) + g0
        + jnp.sum(G * lam_d[:, :ncg, None], axis=1) + lam_d[:, ncg:]
    )
    k_carry, k_sig, k_unc = fused_iteration_batched(
        lanes_mat(Lp), lanes_mat(G), _lanes(rw, B),
        _lanes(c0, B), _lanes(lb, B), _lanes(ub, B),
        _lanes(z1, B), _lanes(z2, B), _lanes(nt[:, None], B),
        tuple(_lanes(x, B) for x in carry), 0.99, interpret=True,
    )
    k_carry = [_unlanes(x, B) for x in k_carry]
    names = ["w", "Gw", "su", "sl", "pu", "pl", "lam_u", "lam_l", "mu_u", "mu_l"]
    for name, r, k in zip(names, ref_carry, k_carry):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )
    np.testing.assert_allclose(
        _unlanes(k_sig, B), np.asarray(ref_sig), rtol=2e-4, atol=2e-4
    )
    assert np.array_equal(np.asarray(k_unc).reshape(B), np.asarray(ref_unc))


def test_solver_fast_path_consistency():
    """Full solve_soft_qp_ipm under vmap (fallback path on CPU) matches the
    per-scenario reference run loop-free — guards the custom_vmap plumbing."""
    from tum_control_tpu.ops.ipm import solve_soft_qp_ipm
    from tum_control_tpu.ops.soft_qp import CondensedQP

    B, nz, ncg = 8, 10, 7
    fields = _random_problem(B, nz, ncg, seed=3)
    # f64 under the x64 test config (mixed f32 data + weak-f64 scalars trips
    # scan carry type checks in the polish; production uses one dtype)
    qp_b = CondensedQP(*(f.astype(jnp.float64) for f in fields))
    w_b, kkt_b = jax.vmap(
        lambda *f: solve_soft_qp_ipm(CondensedQP(*f), n_iters=8, n_polish=2, n_id=nz)
    )(*qp_b)
    for i in range(B):
        qp1 = CondensedQP(*(np.asarray(f[i]) for f in qp_b))
        w1, kkt1 = solve_soft_qp_ipm(qp1, n_iters=8, n_polish=2, n_id=nz)
        np.testing.assert_allclose(np.asarray(w_b[i]), np.asarray(w1),
                                   rtol=1e-4, atol=1e-5)
