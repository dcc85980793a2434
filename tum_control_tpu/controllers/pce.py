"""Polynomial chaos expansion (PCE) machinery for SNMPC.

Host-side (numpy) precomputation — all quantities are constants per config,
computed once at controller build (the reference recomputes them at init
too: SNMPC_class.py:91-95). Parity targets:

  * probabilists' Hermite polynomials normalized by sqrt(n!)
    (stochastic_mpc_utils.py:17-25),
  * multi-indices alpha with |alpha| <= degree, sorted by total degree
    ascending (ibid.:27-38),
  * L = (n_vars + d)! / (n_vars! d!) basis terms,
  * regression matrix A = (Phi'Phi)^-1 Phi' over low-discrepancy standard-
    normal samples (ibid.:56-76). The reference draws them via chaospy's
    Hammersley rule; chaospy is not available here, so we generate the
    classical Hammersley set (van der Corput in prime bases + i/n first
    axis) mapped through the normal inverse CDF — the same construction
    chaospy implements.
"""
from __future__ import annotations

import itertools
import math

import numpy as np
from scipy.special import ndtri  # inverse standard normal CDF

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]


def hermite_norm(x, n):
    """Normalized probabilists' Hermite polynomial He_n(x)/sqrt(n!)."""
    if n == 0:
        return np.ones_like(np.asarray(x, dtype=float))
    if n == 1:
        return np.asarray(x, dtype=float)
    hm2 = np.ones_like(np.asarray(x, dtype=float))
    hm1 = np.asarray(x, dtype=float)
    # unnormalized recurrence, normalize at the end
    for k in range(2, n + 1):
        hm2, hm1 = hm1, x * hm1 - (k - 1) * hm2
    return hm1 / math.sqrt(math.factorial(n))


def alpha_indices(n_vars: int, degree: int) -> np.ndarray:
    """Multi-indices with total degree <= degree, ascending total degree."""
    alphas = np.array(list(itertools.product(range(degree + 1), repeat=n_vars)))
    alphas = alphas[alphas.sum(axis=1) <= degree]
    # stable sort by total degree, matching the reference's double reversal
    alphas = alphas[np.argsort(alphas.sum(axis=1))[::-1]][::-1]
    return alphas


def n_poly_terms(n_vars: int, degree: int) -> int:
    return math.factorial(n_vars + degree) // (
        math.factorial(n_vars) * math.factorial(degree)
    )


def _van_der_corput(i: int, base: int) -> float:
    q, denom = 0.0, 1.0
    while i > 0:
        denom *= base
        i, rem = divmod(i, base)
        q += rem / denom
    return q


def hammersley_normal_samples(n_samples: int, n_vars: int) -> np.ndarray:
    """(n_vars, n_samples) standard-normal low-discrepancy samples."""
    u = np.zeros((n_vars, n_samples))
    for i in range(n_samples):
        u[0, i] = (i + 0.5) / n_samples
        for j in range(1, n_vars):
            u[j, i] = _van_der_corput(i + 1, _PRIMES[j - 1])
    u = np.clip(u, 1e-12, 1 - 1e-12)
    return ndtri(u)


def pce_basis(samples: np.ndarray, alphas: np.ndarray) -> np.ndarray:
    """Phi matrix (n_samples, L): product Hermite basis at each sample."""
    n_vars, n_samples = samples.shape
    L = alphas.shape[0]
    Phi = np.ones((n_samples, L))
    for ell in range(L):
        for j in range(n_vars):
            Phi[:, ell] *= hermite_norm(samples[j], int(alphas[ell, j]))
    return Phi


def regression_matrix(n_samples: int, n_vars: int, degree: int):
    """(w_samples (n_vars, n_samples), A (L, n_samples)) — Eq. 8 of the
    SNMPC paper (arXiv:2310.18753), plain least squares.

    Computed via the pseudo-inverse: identical to the reference's
    inv(Phi'Phi)Phi' (stochastic_mpc_utils.py:66-74) whenever the design
    is determined (n_samples >= L), but still well-defined — the
    minimum-norm least-squares estimator — when the basis outnumbers the
    samples. The reference's explicit inverse silently produces a garbage
    ~1e17-entry matrix there (its own committed n10/uph10 heavy-noise
    experiment has L=36 > 11 samples and tracks at 2 m mean / 24 m max;
    its n38 variants NaN'd — see docs/PARITY.md round-4 addendum)."""
    alphas = alpha_indices(n_vars, degree)
    L = alphas.shape[0]
    if n_samples < L:
        import warnings

        warnings.warn(
            f"PCE regression is underdetermined: {n_samples} samples for "
            f"{L} basis terms (n_vars={n_vars}, degree={degree}); using the "
            "minimum-norm least-squares fit. Increase n_samples (>= L) or "
            "reduce the expansion degree / active stds for a proper fit."
        )
    w = hammersley_normal_samples(n_samples, n_vars)
    Phi = pce_basis(w, alphas)
    A = np.linalg.pinv(Phi)
    return w, A


def fan_initial_state(x0, w_samples: np.ndarray, stds) -> np.ndarray:
    """(n_samples+1, nx) sample fan: row 0 nominal, rows 1.. perturbed on the
    nonzero-std indices (stochastic_mpc_utils.py:78-91). Works on jnp or np
    arrays (jit-safe for traced x0)."""
    import jax.numpy as jnp

    stds = np.asarray(stds)
    active = np.nonzero(stds)[0]
    n_samples = w_samples.shape[1]
    nx = stds.shape[0]
    # (n_samples, nx) additive perturbations, constant at trace time
    pert = np.zeros((n_samples, nx))
    pert[:, active] = (stds[active][:, None] * w_samples).T
    rows = x0[None, :] + jnp.asarray(pert, dtype=x0.dtype)
    return jnp.concatenate([x0[None, :], rows], axis=0)
