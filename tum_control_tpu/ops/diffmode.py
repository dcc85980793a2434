"""Differentiable-solver mode switch.

The production compute path wraps its batched linear algebra in
`jax.custom_batching.custom_vmap` objects whose batched rules dispatch to
Pallas TPU kernels (ops/pallas_kernels/). Neither custom_vmap nor Pallas
kernels support reverse-mode autodiff — which is irrelevant for serving,
but the framework's closed loop is otherwise a single differentiable JAX
program, and differentiating THROUGH the simulation scan is a first-class
capability (closed-loop parameter identification, tools/
fit_tires_closedloop.py — something the reference's opaque acados C solver
structurally cannot offer, SURVEY.md §2.3).

Setting TUM_DIFFERENTIABLE=1 in the environment *before import* swaps
every custom_vmap/Pallas wrapper for its mathematically identical plain
jnp implementation (vmap-able AND reverse-differentiable): XLA batched
cholesky/cho_solve, the jnp condense scan, vmap(jacfwd) linearization.
Slower on TPU (the Pallas kernels exist because the XLA fallbacks are),
identical results to solver tolerance.

A second use case besides autodiff: vmapping over MODEL PARAMETERS.
jax.custom_vmap asserts that the wrapped function's closure constants
are unbatched, so the production wrappers cannot batch over quantities
the controllers capture in closures (tire/vehicle parameters). Parameter
-population sweeps (tools/fit_tires_es.py) therefore also run in this
mode.
"""
import os

DIFFERENTIABLE = os.environ.get("TUM_DIFFERENTIABLE", "0") == "1"
