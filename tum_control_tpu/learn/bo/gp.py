"""Exact Gaussian-process surrogates in JAX.

Replaces BoTorch's SingleTaskGP (BO_WMPC/surrogate_models.py:17-63): RBF-ARD
kernel over the normalized 7-d parameter space, standardized targets,
Gaussian likelihood, hyperparameters fit by Adam on the exact marginal
log-likelihood. The feasibility model (reference: Dirichlet GP classifier,
surrogate_models.py:66-160) is realized as a GP regression on +-1 labels
squashed through a probit — same role (smooth feasibility probability +
uncertainty), simpler machinery; documented design substitution.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def host_device():
    """Context pinning computation to the host CPU backend.

    The GP surrogate/acquisition math is tiny (n <= ~2000, d = 7) — on a
    network-attached accelerator its many small dispatches and per-trial-
    count recompiles are pure tunnel-latency waste (measured ~100 s per BO
    iteration). Only the closed-loop objective evaluation belongs on the
    accelerator."""
    import contextlib

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except Exception:  # CPU-only environments: already there
        return contextlib.nullcontext()


class GPParams(NamedTuple):
    log_lengthscales: jnp.ndarray  # (d,)
    log_outputscale: jnp.ndarray   # ()
    log_noise: jnp.ndarray         # ()


class GPData(NamedTuple):
    X: jnp.ndarray       # (n, d) train inputs (normalized to [0,1]^d)
    y: jnp.ndarray       # (n,) standardized targets
    y_mean: jnp.ndarray
    y_std: jnp.ndarray
    params: GPParams
    L: jnp.ndarray       # (n, n) cholesky of K + sigma^2 I
    alpha: jnp.ndarray   # (n,) K^-1 y


def _kernel(params: GPParams, X1, X2):
    ls = jnp.exp(params.log_lengthscales)
    d = (X1[:, None, :] - X2[None, :, :]) / ls
    return jnp.exp(params.log_outputscale) * jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))


def _K_train(params: GPParams, X):
    # relative jitter: in f32 an absolute 1e-6 floor underflows against a
    # large outputscale and the Cholesky NaNs
    n = X.shape[0]
    jit = jnp.exp(params.log_noise) + 1e-6 + 1e-5 * jnp.exp(params.log_outputscale)
    return _kernel(params, X, X) + jit * jnp.eye(n)


def _mll(params: GPParams, X, y):
    n = X.shape[0]
    K = _K_train(params, X)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    mll = -0.5 * y @ alpha - jnp.sum(jnp.log(jnp.diag(L))) - 0.5 * n * jnp.log(2 * jnp.pi)
    # mild log-normal hyperpriors (the role of BoTorch's Gamma priors,
    # surrogate_models.py SingleTaskGP defaults): plain MLE on a few dozen
    # points collapses lengthscales, and the resulting huge extrapolation
    # variance makes MC-EHVI chase the corners of the space
    prior = (
        -0.5 * jnp.sum((params.log_lengthscales - jnp.log(0.5)) ** 2) / 0.75**2
        - 0.5 * params.log_outputscale**2 / 1.0
        - 0.5 * (params.log_noise + 4.0) ** 2 / 2.0**2
    )
    return mll + prior


def fit_gp(X, y, n_steps: int = 300, lr: float = 0.05, init: GPParams = None) -> GPData:
    """Fit hyperparameters and precompute the posterior factorization.

    `init` warm-starts the hyperparameters (e.g. from the previous BO
    iteration's fit — the training set changes by only q points per
    iteration, so a short continuation converges; a cold 300-step fit at
    n=1024 costs ~40 s of 2-core CPU)."""
    with host_device():
        return _fit_gp(X, y, n_steps, lr, init)


from functools import partial


# MODULE-LEVEL jit: a fresh `jax.jit(lambda ...)` per call never hits the
# jit cache (cache key includes the wrapped function object), so every
# fit paid full XLA compilation — measured 50-130 s per BO iteration at
# 1,200 trials vs ~2 s of actual fitting. With a module-level wrapper the
# cache keys on input shapes only (which the optimizer pins, see
# BayesianOptimizer.M_FEAS/M_OBJ).
@partial(jax.jit, static_argnames=("n_steps", "lr"))
def _fit_loop(X, ys, n_steps, lr, params=None):
    d = X.shape[1]
    if params is None:
        params = GPParams(
            log_lengthscales=jnp.zeros(d) - 0.5,
            log_outputscale=jnp.zeros(()),
            log_noise=jnp.asarray(-4.0),
        )
    opt = optax.adam(lr)
    state = opt.init(params)

    def step(carry, _):
        params, state = carry
        loss, g = jax.value_and_grad(lambda p: -_mll(p, X, ys))(params)
        upd, new_state = opt.update(g, state)
        new_params = optax.apply_updates(params, upd)
        # f32 guard: a failed Cholesky inside the MLL poisons params with
        # NaNs for every later step — skip non-finite updates instead
        ok = jnp.isfinite(loss) & jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(g)])
        )
        keep = lambda n_, o_: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), n_, o_
        )
        return (keep(new_params, params), keep(new_state, state)), None

    # one device dispatch for the whole fit: a python step loop pays one
    # host round-trip per step, which on a network-attached accelerator
    # (~27 ms RTT) dominated the whole BO iteration (measured ~100 s/iter)
    (params, state) = jax.lax.scan(step, (params, state), None, length=n_steps)[0]
    K = _K_train(params, X)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), ys)
    return params, L, alpha


def _fit_gp(X, y, n_steps: int, lr: float, init: GPParams = None) -> GPData:
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    y_mean, y_std = y.mean(), y.std() + 1e-8
    ys = (y - y_mean) / y_std
    params, L, alpha = _fit_loop(X, ys, n_steps, lr, init)
    return GPData(X=X, y=ys, y_mean=y_mean, y_std=y_std, params=params, L=L, alpha=alpha)


def gp_posterior(gp: GPData, Xq):
    """(mean (m,), std (m,)) in the original target scale."""
    Kq = _kernel(gp.params, Xq, gp.X)
    mean_s = Kq @ gp.alpha
    v = jax.scipy.linalg.solve_triangular(gp.L, Kq.T, lower=True)
    var_s = jnp.clip(
        jnp.exp(gp.params.log_outputscale) - jnp.sum(v * v, axis=0), 1e-12, None
    )
    return mean_s * gp.y_std + gp.y_mean, jnp.sqrt(var_s) * gp.y_std


def gp_sample(gp: GPData, Xq, key, n_samples: int):
    """Joint posterior samples (n_samples, m) — for MC acquisition values."""
    Kq = _kernel(gp.params, Xq, gp.X)
    mean_s = Kq @ gp.alpha
    v = jax.scipy.linalg.solve_triangular(gp.L, Kq.T, lower=True)
    Kqq = _kernel(gp.params, Xq, Xq)
    scale = jnp.exp(gp.params.log_outputscale)
    cov = Kqq - v.T @ v + (1e-9 + 1e-5 * scale) * jnp.eye(Xq.shape[0])
    Lq = jnp.linalg.cholesky(cov)
    # f32 guard: a near-singular posterior covariance can still defeat the
    # jitter; fall back to independent per-point samples (exact marginals,
    # dropped cross-correlation) instead of poisoning the acquisition/its
    # gradients with NaNs
    sd_marg = jnp.sqrt(jnp.clip(jnp.diag(cov), 1e-12, None))
    eps = jax.random.normal(key, (n_samples, Xq.shape[0]))
    joint = mean_s[None, :] + eps @ Lq.T
    indep = mean_s[None, :] + eps * sd_marg[None, :]
    samp = jnp.where(jnp.all(jnp.isfinite(Lq)), joint, indep)
    return samp * gp.y_std + gp.y_mean
