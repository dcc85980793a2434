"""Checkpoint / resume for long training sweeps (orbax-backed).

The reference persists RL models as SB3 zips with a `-cont` resume flag
(rl_training.py:92-111) and BO trials as CSV
(bayesian_optimization.py:464-508). Here any pytree — PPO policy + optimizer
state + env states + PRNG keys, or a mid-run scan carry — checkpoints
atomically through orbax (SURVEY.md §5.4 build target).
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_pytree(path: str, tree) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like):
    """Restore a checkpoint with the structure/shapes of `like`."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)
