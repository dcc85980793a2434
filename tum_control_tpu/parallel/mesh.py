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


def batched_scenarios(traj, batch: int, dtype=None, vp=None):
    """(batch, 8) MPC and (batch, 7) plant initial states spread along a lap.

    States are *curvature-consistent*: dropping a car mid-corner with zero
    vlat/yawrate/delta_f excites a steering-rate-limited weave that takes
    seconds to damp (the round-1 bench's 6 m lat_dev p99 tail). Instead,
    yawrate/steer/side-slip start at their steady-cornering kinematic values
    derived from the reference yaw profile:

        yawrate = dyaw/dt (centered difference over segment times)
        kappa   = yawrate / v
        delta_f = atan(wheelbase * kappa)        (kinematic steering angle)
        vlat    = v * tan(atan(lr * kappa))      (kinematic CG side slip)
        a       = ref_acc

    `vp` supplies wheelbase geometry (VehicleParams); defaults to the EDGAR
    values if omitted.
    """
    import jax.numpy as jnp

    l_wb, lr = (3.128, 1.644) if vp is None else (vp.lf + vp.lr, vp.lr)
    M = traj.n_points
    starts = np.linspace(0, M - 1, batch).astype(np.int32)
    pos = np.asarray(traj.pos)[starts]
    yaw_all = np.unwrap(np.asarray(traj.yaw))
    seg = np.asarray(traj.seg_time)
    v_all = np.asarray(traj.v)
    # centered dyaw/dt; segment j covers point j-1 -> j
    dyaw = yaw_all[(starts + 1) % M] - yaw_all[(starts - 1) % M]
    dyaw = np.mod(dyaw + np.pi, 2 * np.pi) - np.pi  # re-wrap across the seam
    dt2 = seg[starts % M] + seg[(starts + 1) % M]
    yawrate = dyaw / np.maximum(dt2, 1e-6)
    v = v_all[starts]
    kappa = yawrate / np.maximum(v, 0.1)
    delta_f = np.arctan(l_wb * kappa)
    vlat = v * np.tan(np.arctan(lr * kappa))
    acc = np.asarray(traj.acc)[starts]
    yaw = np.mod(np.asarray(traj.yaw)[starts], 2 * np.pi)
    x0m = jnp.asarray(
        np.stack(
            [pos[:, 0], pos[:, 1], yaw, v, vlat, yawrate, delta_f, acc], axis=1
        ),
        dtype=dtype,
    )
    return x0m, x0m[:, :7]
