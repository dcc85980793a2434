"""Multi-objective BO orchestrator for NMPC cost-weight tuning.

The reference's BayesianOptimization class (BO_WMPC/bayesian_optimization.py)
alternates between two track-segment groups (high/low curvature), fits GP
surrogates + a feasibility model per iteration, optimizes a feasibility-
weighted EHVI acquisition for a batch of q candidates, and evaluates them in
a process pool. Here evaluation is a single batched device program
(ObjectiveEvaluator), surrogates/acquisition are the JAX implementations in
this package, and trials persist to the same CSV layout
(bayesian_optimization.py:464-508) for restart/postprocessing parity.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import numpy as np
from scipy.stats import qmc

from tum_control_tpu.learn.bo.acquisition import (
    hypervolume_2d,
    make_acquisition,
    make_feasibility_acquisition,
    optimize_acquisition,
    pareto_mask,
)
from tum_control_tpu.learn.bo.gp import fit_gp


@dataclasses.dataclass
class BOConfig:
    n_initial: int = 50
    n_bayesian_optimization: int = 400
    batch_size: int = 5
    epsilon: float = 0.8
    n_mc: int = 64
    reference_points: tuple = ((-0.5, -0.75), (-0.4, -0.90))
    bounds_lo: tuple = (1.0, 0.0, 1.0, 0.0, 20.0, 500.0, 500.0)
    bounds_hi: tuple = (30.0, 5.0, 30.0, 6.0, 400.0, 2000.0, 2000.0)


@dataclasses.dataclass
class Trial:
    params: np.ndarray       # (7,) in physical units
    objectives: np.ndarray   # (2, 2): per segment group
    feasible: np.ndarray     # (2,) bool per segment group
    group: int               # which group this trial was selected for


class BayesianOptimizer:
    def __init__(self, evaluators, cfg: BOConfig = BOConfig(), seed: int = 0):
        """evaluators: callable list per group: params (C,7) -> (objs (C,2),
        feasible (C,)). Typically two ObjectiveEvaluator.evaluate closures."""
        self.evaluators = evaluators
        self.cfg = cfg
        self.trials: List[Trial] = []
        # CPU-COMMITTED PRNG chain (explicit device_put — a default_device
        # context alone leaves the key uncommitted, and later splits outside
        # the context run on the accelerator): an accelerator-resident key
        # makes every seed derivation a synchronous tunnel round-trip — the
        # Sobol seeding alone measured 40+ s per BO iteration
        try:
            cpu = jax.devices("cpu")[0]
            self.key = jax.device_put(jax.random.PRNGKey(seed), cpu)
        except Exception:
            self.key = jax.random.PRNGKey(seed)
        self.d = len(cfg.bounds_lo)
        self.lo = np.asarray(cfg.bounds_lo)
        self.hi = np.asarray(cfg.bounds_hi)

    # ------------------------------------------------------------------
    def _denorm(self, Xn):
        return self.lo + Xn * (self.hi - self.lo)

    def _norm(self, X):
        return (X - self.lo) / (self.hi - self.lo)

    def _evaluate(self, Xn: np.ndarray, group: int):
        params = self._denorm(Xn)
        n_groups = len(self.evaluators)
        objs_all = np.full((len(params), 2, 2), np.nan)
        feas_all = np.ones((len(params), max(n_groups, 2)), dtype=bool)
        for g, ev in enumerate(self.evaluators):
            objs, feas = ev(np.asarray(params))
            objs_all[:, g, :] = np.asarray(objs)
            feas_all[:, g] = np.asarray(feas)
        for i in range(len(params)):
            self.trials.append(
                Trial(
                    params=np.asarray(params[i]),
                    objectives=objs_all[i],
                    feasible=feas_all[i],
                    group=group,
                )
            )

    # ------------------------------------------------------------------
    def generate_initial_data(self, n: Optional[int] = None):
        n = n or self.cfg.n_initial
        self.key, k = jax.random.split(self.key)
        sob = qmc.Sobol(self.d, scramble=True, seed=int(jax.random.randint(k, (), 0, 2**31 - 1)))
        # the reference protocol fixes n_initial = 50 (bo_config.yaml:11),
        # not a power of 2 — scipy's Sobol balance warning is expected and
        # irrelevant for seeding a GP (botorch draws the same way)
        import warnings

        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", message=".*balance properties of Sobol.*"
            )
            pts = sob.random(n)
        self._evaluate(pts, group=0)

    # ------------------------------------------------------------------
    def _train_data(self, group: int):
        X, Y, F = [], [], []
        for t in self.trials:
            X.append(self._norm(t.params))
            ok = bool(np.asarray(t.feasible)[group])
            F.append(1.0 if ok else -1.0)
            Y.append(t.objectives[group] if ok else [np.nan, np.nan])
        return np.asarray(X), np.asarray(Y), np.asarray(F)

    # fixed GP training-set sizes: the trial count grows every iteration,
    # and shape-changing inputs force fit_gp's 300-step MLL scan (and the
    # downstream acquisition jits) to RECOMPILE each time — measured
    # 50-130 s/iteration of pure XLA compilation at 1,200 trials vs ~2 s
    # of actual fitting. Subsample above the cap, pad by resampling below
    # it (duplicates are harmless under the learned noise term).
    M_FEAS = 1024
    M_OBJ = 512

    def _fixed_size(self, X, y, M, key):
        # numpy RNG seeded from the key: keeps this off the accelerator
        # (tunnel round-trips) and the outputs uncommitted
        rng = np.random.default_rng(int(np.asarray(jax.random.key_data(key))[0]))
        n = len(X)
        if n >= M:
            idx = rng.choice(n, size=M, replace=False)
        else:
            idx = np.concatenate([np.arange(n), rng.choice(n, size=M - n)])
        return X[idx], y[idx]

    def step(self, iteration: int):
        """One BO iteration on the alternating segment group.

        Like the reference, the parameter space is *mostly infeasible*
        (crash constraints); the feasibility surrogate fits on every trial.
        With an empty feasible set the acquisition degrades gracefully to
        pure feasibility seeking (mu + sigma of the classifier).
        """
        group = iteration % len(self.evaluators)
        X, Y, F = self._train_data(group)
        feas = ~np.isnan(Y[:, 0])
        self.key, kf, ko = jax.random.split(self.key, 3)
        Xf, Ff = self._fixed_size(X, F, self.M_FEAS, kf)
        # hyperparameter warm start across iterations: the data changes by
        # q points/iteration, so a 60-step continuation matches a cold
        # 300-step fit at ~1/5 the (dominant) CPU cost
        warm = getattr(self, "_gp_warm", {})
        self._gp_warm = warm
        fit_w = lambda tag, Xs, ys: warm.__setitem__(
            tag,
            fit_gp(
                Xs, ys,
                n_steps=60 if tag in warm else 300,
                init=warm[tag].params if tag in warm else None,
            ),
        ) or warm[tag]
        feas_gp = fit_w(("feas", group), Xf, Ff)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        if feas.sum() < 1:
            acq = make_feasibility_acquisition(feas_gp)
        else:
            Xo, Yo = self._fixed_size(X[feas], Y[feas], self.M_OBJ, ko)
            gps = [fit_w(("obj", group, j), Xo, Yo[:, j]) for j in range(2)]
            front = Y[feas][pareto_mask(Y[feas])]
            # fixed front size for the same jit-cache reason: duplicates do
            # not change hypervolume contributions; oversized fronts are
            # thinned evenly along the sorted front
            M_FRONT = 64
            if len(front) > M_FRONT:
                order = np.argsort(-front[:, 0])
                sel = np.linspace(0, len(front) - 1, M_FRONT).astype(int)
                front = front[order][sel]
            elif len(front) < M_FRONT:
                front = front[
                    np.concatenate([
                        np.arange(len(front)),
                        np.zeros(M_FRONT - len(front), dtype=int),
                    ])
                ]
            ref = np.asarray(self.cfg.reference_points[group])
            acq = make_acquisition(
                gps, feas_gp, front, ref, self.cfg.epsilon, k1, n_mc=self.cfg.n_mc
            )
        cand = optimize_acquisition(acq, self.d, self.cfg.batch_size, k2)
        self._evaluate(cand, group)

    # ------------------------------------------------------------------
    def hypervolume(self, group: int) -> float:
        _, Y, _ = self._train_data(group)
        Yf = Y[~np.isnan(Y[:, 0])]
        if len(Yf) == 0:
            return 0.0
        return hypervolume_2d(
            Yf[pareto_mask(Yf)], np.asarray(self.cfg.reference_points[group])
        )

    # ------------------------------------------------------------------
    def store_trials(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            for t in self.trials:
                f = np.asarray(t.feasible).astype(int).reshape(-1)
                row = list(t.params) + list(t.objectives.reshape(-1)) + [
                    int(f[0]),
                    int(f[-1]),
                    t.group,
                ]
                fh.write(",".join(str(v) for v in row) + "\n")

    def load_trials(self, path: str):
        skipped = 0
        with open(path) as fh:
            for line in fh:
                vals = line.strip().split(",")
                params = np.asarray([float(v) for v in vals[:7]])
                if not np.all(np.isfinite(params)):
                    skipped += 1  # r1 CSVs contain NaN-parameter trials
                    continue
                self.trials.append(
                    Trial(
                        params=params,
                        objectives=np.asarray([float(v) for v in vals[7:11]]).reshape(2, 2),
                        feasible=np.asarray([bool(int(vals[11])), bool(int(vals[12]))]),
                        group=int(vals[13]),
                    )
                )
        if skipped:
            print(f"load_trials: skipped {skipped} non-finite-parameter rows")
