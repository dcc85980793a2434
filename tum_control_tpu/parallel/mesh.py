"""Device-mesh / sharding helpers for scenario-parallel execution.

The reference's only parallelism is fork-based process pools around
independent closed-loop sims (SURVEY.md §2.4: BO worker pools,
SubprocVecEnv). The TPU-native equivalent is a *batch axis*: scenarios
(tracks x initial states x weight sets x disturbance draws) are vmapped
within a chip and sharded across chips with `jax.sharding` — XLA inserts
the collectives; metric reductions ride ICI.

Mesh axes:
  * 'batch' — scenario data parallelism (the dominant axis),
  * optionally 'sample' — SNMPC PCE-sample parallelism for very large
    sample counts (2-D mesh).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and
pass the global device list; everything else is unchanged (GSPMD handles
cross-host sharding).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis_names=("batch",), shape=None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    return Mesh(devs.reshape(shape), axis_names)


def shard_batch(mesh: Mesh, tree, axis: str = "batch"):
    """Place a pytree of batched arrays with the leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def batched_scenarios(traj, batch: int, dtype=None):
    """(batch, 8) MPC and (batch, 7) plant initial states spread along a lap."""
    import jax.numpy as jnp

    M = traj.n_points
    starts = np.linspace(0, M - 1, batch).astype(np.int32)
    pos = np.asarray(traj.pos)[starts]
    yaw = np.mod(np.asarray(traj.yaw)[starts], 2 * np.pi)
    v = np.asarray(traj.v)[starts]
    z = np.zeros_like(v)
    x0m = jnp.asarray(
        np.stack([pos[:, 0], pos[:, 1], yaw, v, z, z, z, z], axis=1), dtype=dtype
    )
    return x0m, x0m[:, :7]
