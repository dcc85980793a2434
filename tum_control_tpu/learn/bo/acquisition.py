"""Feasibility-weighted expected-hypervolume-improvement acquisition.

Replaces the reference's FeasibilityWeightedEHVI (BO_WMPC/acquisition.py:
22-187 — a qNEHVI subclass whose hypervolume contributions are scaled by
eps*mu_feas + (1-eps)*sigma_feas from the feasibility classifier). Here:

  * 2-objective EHVI by Monte Carlo over joint GP posterior samples, with
    the hypervolume improvement of a candidate computed exactly against the
    current Pareto front (2-D sweep),
  * the same feasibility weighting,
  * candidate selection by scoring a Sobol set and polishing the top points
    with Adam on the (differentiable) MC acquisition — replacing BoTorch's
    optimize_acqf restarts; q candidates come from a greedy pass with
    fantasized front updates.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc

from tum_control_tpu.learn.bo.gp import GPData, gp_posterior, gp_sample


def pareto_mask(Y: np.ndarray) -> np.ndarray:
    """Non-dominated mask for maximization, (n, m) objectives."""
    n = Y.shape[0]
    mask = np.ones(n, dtype=bool)
    for i in range(n):
        if not mask[i]:
            continue
        dom = np.all(Y >= Y[i], axis=1) & np.any(Y > Y[i], axis=1)
        if np.any(dom & mask):
            mask[i] = False
    return mask


def hypervolume_2d(front: np.ndarray, ref: np.ndarray) -> float:
    """Exact dominated hypervolume for 2 objectives (maximization)."""
    pts = front[np.all(front > ref, axis=1)]
    if len(pts) == 0:
        return 0.0
    pts = pts[np.argsort(-pts[:, 0])]
    hv, y_prev = 0.0, ref[1]
    for x, y in pts:
        if y > y_prev:
            hv += (x - ref[0]) * (y - y_prev)
            y_prev = y
    return float(hv)


def _hvi_candidate(f_cand, front_sorted, ref):
    """Hypervolume improvement of one candidate point vs a front sorted by
    descending f0 (jnp, differentiable w.r.t. f_cand)."""
    # contribution = area of the region dominated by cand but not the front.
    # sweep: for each strip between successive front x-coords, the front's
    # y-level is the max y of points with larger x.
    fx = jnp.concatenate([jnp.array([jnp.inf]), front_sorted[:, 0], jnp.array([ref[0]])])
    # running max of y over points with x >= strip start
    fy = jnp.concatenate([jnp.array([ref[1]]), jnp.maximum.accumulate(front_sorted[:, 1])])
    cx, cy = f_cand[0], f_cand[1]
    # strip i spans [max(fx[i+1], ref0), fx[i]] with front level fy[i]
    x_hi = jnp.minimum(fx[:-1], cx)
    x_lo = jnp.maximum(fx[1:], ref[0])
    width = jnp.clip(x_hi - x_lo, 0.0, None)
    height = jnp.clip(cy - jnp.maximum(fy, ref[1]), 0.0, None)
    return jnp.sum(width * height)


class AcqP(NamedTuple):
    """EHVI acquisition data as one pytree, so the jitted value/polish
    functions below cache on shapes (the optimizer pins GP train sizes and
    the front length — see BayesianOptimizer.M_FEAS/M_OBJ/M_FRONT)."""

    gp0: GPData
    gp1: GPData
    feas: GPData
    front: jnp.ndarray   # (k, 2) sorted by descending f0
    ref: jnp.ndarray     # (2,)
    keys: jnp.ndarray    # (2, 2) PRNG keys
    eps: jnp.ndarray     # ()


def _acq_value_ehvi(ap: AcqP, X, n_mc: int):
    # MC posterior samples of both objectives at the candidates
    s0 = gp_sample(ap.gp0, X, ap.keys[0], n_mc)  # (n_mc, m)
    s1 = gp_sample(ap.gp1, X, ap.keys[1], n_mc)
    f = jnp.stack([s0, s1], axis=-1)  # (n_mc, m, 2)
    hvi = jax.vmap(jax.vmap(lambda p: _hvi_candidate(p, ap.front, ap.ref)))(f)
    ehvi = hvi.mean(axis=0)  # (m,)
    mu_f, sd_f = gp_posterior(ap.feas, X)
    p_feas = jax.scipy.stats.norm.cdf(mu_f / (sd_f + 1e-9))
    # exploration term on the PROBABILITY scale (bounded like the
    # reference's Dirichlet-classifier sd): sqrt(p(1-p)) peaks at the
    # feasibility boundary; the raw regression sd is unbounded far from
    # data and drags candidates into the corners
    sigma_p = 2.0 * jnp.sqrt(p_feas * (1.0 - p_feas))
    weight = ap.eps * p_feas + (1.0 - ap.eps) * sigma_p
    return ehvi * weight


def _acq_value_feas(feas_gp: GPData, X):
    mu, sd = gp_posterior(feas_gp, X)
    return jax.scipy.stats.norm.cdf(mu / (sd + 1e-9)) + 0.5 * sd


class _AcqHandle:
    """Callable acquisition bound to a params pytree. Keeping the value
    function at module level (instead of a per-iteration closure) lets the
    jit caches hit across BO iterations — a fresh `jax.jit(lambda ...)`
    per iteration recompiled the screen/polish every time (measured
    7-13 s/iteration of pure compilation)."""

    def __init__(self, kind: str, params, n_mc: int = 0):
        self.kind, self.params, self.n_mc = kind, params, n_mc

    def __call__(self, X):
        if self.kind == "ehvi":
            return _acq_jit_ehvi(self.params, X, self.n_mc)
        return _acq_jit_feas(self.params, X)


from functools import partial

_acq_jit_ehvi = partial(jax.jit, static_argnames=("n_mc",))(_acq_value_ehvi)
_acq_jit_feas = jax.jit(_acq_value_feas)


def make_acquisition(
    gps, feas_gp: GPData, front: np.ndarray, ref: np.ndarray, eps: float, key, n_mc: int = 64
):
    """Returns a differentiable acq(X) for (m, d) candidate batches."""
    front = front[np.argsort(-front[:, 0])]
    # UNCOMMITTED (numpy) leaves: the GPData arrays are CPU-committed (fit_gp
    # runs under host_device); a device-committed leaf built outside that
    # context would pin the whole jitted acquisition to the accelerator and
    # drag every screen/polish through the network tunnel (measured
    # 37-100 s/iteration vs <1 s on the host backend).
    keys_np = np.asarray(jax.random.split(key, 2))
    ap = AcqP(
        gp0=gps[0], gp1=gps[1], feas=feas_gp,
        front=np.asarray(front, dtype=np.float32),
        ref=np.asarray(ref, dtype=np.float32),
        keys=keys_np, eps=np.float32(eps),
    )
    return _AcqHandle("ehvi", ap, n_mc)


def optimize_acquisition(
    acq, d: int, q: int, key, n_raw: int = 512, n_polish: int = 60, lr: float = 0.02
):
    """Select q candidates in [0,1]^d: Sobol screen + Adam polish + greedy
    de-duplication (approximate sequential selection). Runs on the host CPU
    backend (see gp.host_device) — the acquisition math is tiny."""
    from tum_control_tpu.learn.bo.gp import host_device

    with host_device():
        return _optimize_acquisition(acq, d, q, key, n_raw, n_polish, lr)


@partial(jax.jit, static_argnames=("kind", "n_mc", "n_polish", "lr"))
def _polish_loop(params, X, kind, n_mc, n_polish, lr):
    import optax

    if kind == "ehvi":
        value = lambda Z: _acq_value_ehvi(params, Z, n_mc)
    else:
        value = lambda Z: _acq_value_feas(params, Z)
    opt = optax.adam(lr)
    state = opt.init(X)

    def step(carry, _):
        X, state = carry
        loss, g = jax.value_and_grad(lambda Z: -jnp.sum(value(Z)))(X)
        upd, state = opt.update(g, state)
        X_new = jnp.clip(optax.apply_updates(X, upd), 0.0, 1.0)
        # f32 guard: a NaN acquisition gradient must not poison the
        # candidate — keep the pre-update point instead (the round-1 BO
        # campaign silently evaluated NaN parameter vectors for every
        # BO-proposed trial because of this)
        X_new = jnp.where(jnp.isfinite(X_new), X_new, X)
        return (X_new, state), None

    # single dispatch for the whole polish (tunnel-RTT economics, fit_gp)
    return jax.lax.scan(step, (X, state), None, length=n_polish)[0][0]


def _optimize_acquisition(acq, d, q, key, n_raw, n_polish, lr):
    import os as _os
    import time as _time

    _dbg = _os.environ.get("BO_DEBUG_TIMING")
    _t = _time.time()
    sob = qmc.Sobol(d, scramble=True, seed=int(jax.random.randint(key, (), 0, 2**31 - 1)))
    X0 = jnp.asarray(sob.random(n_raw))
    if _dbg:
        print(f"  [acq] sobol+seed {_time.time()-_t:.2f}s", flush=True); _t = _time.time()
    vals0 = acq(X0)
    top = jnp.argsort(-vals0)[: 4 * q]
    X = X0[top]
    screen_vals = np.asarray(vals0)[np.asarray(top)]
    if _dbg:
        print(f"  [acq] screen {_time.time()-_t:.2f}s", flush=True); _t = _time.time()

    if isinstance(acq, _AcqHandle):
        X = _polish_loop(acq.params, X, acq.kind, acq.n_mc, n_polish, lr)
        if _dbg:
            X.block_until_ready()
            print(f"  [acq] polish {_time.time()-_t:.2f}s", flush=True); _t = _time.time()
    else:  # generic callable (tests): per-call jit, no cross-call caching
        import optax

        opt = optax.adam(lr)
        state = opt.init(X)

        def step(carry, _):
            X, state = carry
            loss, g = jax.value_and_grad(lambda Z: -jnp.sum(acq(Z)))(X)
            upd, state = opt.update(g, state)
            X_new = jnp.clip(optax.apply_updates(X, upd), 0.0, 1.0)
            X_new = jnp.where(jnp.isfinite(X_new), X_new, X)
            return (X_new, state), None

        X, state = jax.jit(
            lambda x, s: jax.lax.scan(step, (x, s), None, length=n_polish)[0]
        )(X, state)

    vals = np.asarray(acq(X))
    X_np = np.asarray(X)
    finite = np.all(np.isfinite(X_np), axis=1) & np.isfinite(vals)
    if not finite.any():  # full fallback: raw Sobol screen winners
        X_np, vals = np.asarray(X0[top]), screen_vals
        finite = np.all(np.isfinite(X_np), axis=1) & np.isfinite(vals)
    if not finite.any():  # last resort: fresh space-filling draws
        return np.asarray(sob.random(q))
    order = [i for i in np.argsort(-vals) if finite[i]]
    chosen = []
    for i in order:
        x = X_np[i]
        if all(np.linalg.norm(x - c) > 0.02 for c in chosen):
            chosen.append(x)
        if len(chosen) == q:
            break
    while len(chosen) < q:
        chosen.append(X_np[order[0]])
    return np.stack(chosen)


def make_feasibility_acquisition(feas_gp: GPData):
    """Pure feasibility-seeking acquisition for an empty Pareto front:
    probability-of-feasibility plus exploration bonus."""
    return _AcqHandle("feas", feas_gp)
