"""TUM-Control-TPU: a TPU-native NMPC framework for autonomous-vehicle trajectory following.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the TUM-CONTROL
reference framework (bzarr/TUM-CONTROL): Nominal NMPC, Stochastic NMPC (PCE
chance constraints), and Reduced Robustified NMPC (ellipsoidal uncertainty)
built on a dynamic single-track Pacejka vehicle model, wrapped in a fully
jit-compiled closed-loop simulator with disturbance injection, state
estimation, logging/evaluation, and a learning layer (Weights-varying MPC via
PPO, multi-objective Bayesian optimization of cost weights).

Architectural principles (TPU-first, not a port):
  * The whole closed loop (planner -> SQP-RTI solve -> plant -> estimator)
    is a single `jax.lax.scan` step: zero host<->device transfers inside.
  * The acados/HPIPM solver stack is replaced by an in-graph SQP-RTI engine:
    soft-constrained QPs solved exactly by a semismooth-Newton method on the
    condensed piecewise-quadratic problem (all reference inequalities are
    L1+L2-softened, which *is* an exact penalty -> unconstrained convex PWQ).
  * Everything is batched: thousands of scenarios (tracks x initial states x
    weight sets x disturbance draws) run as one vmapped/pjit'd program over a
    device mesh; SNMPC's PCE sample dimension is a vmapped axis.
  * Static shapes, branch-free math (`jnp.where` guards), fixed iteration
    counts, explicit PRNG keys -> bitwise-reproducible runs.
"""

__version__ = "0.1.0"

# Persistent compilation cache: Mosaic/XLA compiles of the large closed-loop
# programs are expensive (minutes through this environment's remote-compile
# tunnel); cache them across processes.
import os as _os

import jax as _jax

_cache_dir = _os.environ.get("TUMCTRL_JAX_CACHE", _os.path.expanduser("~/.jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # very old jax without the knobs: run uncached
    pass

from tum_control_tpu import config as config
from tum_control_tpu.params import VehicleParams, TireParams
