"""Multi-host / multi-chip execution helpers.

The reference has no distributed backend at all (fork pools only, SURVEY.md
§2.4/§5.8). Here scaling follows the JAX playbook:

  * single host, n chips      — `make_mesh(n)` + sharded batch axis,
  * multi-host slice          — `initialize_distributed()` (jax.distributed)
    before any backend use; the global mesh then spans all hosts and GSPMD
    partitions the same program, with collectives riding ICI within a slice
    and DCN across slices,
  * metric reductions         — plain jnp reductions over sharded arrays
    lower to psum collectives automatically.

`scaling_report` measures aggregate closed-loop solve throughput at
increasing device counts — the scaling-efficiency harness BASELINE.md asks
for (1 chip / 1 host / N hosts).
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from tum_control_tpu.parallel.mesh import batched_scenarios, make_mesh, shard_batch


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (multi-host). Safe to call with
    no arguments inside orchestrated jobs (env-driven autodetection)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def scaling_report(sim, traj, device_counts=None, batch_per_device: int = 128, steps: int = 50):
    """Aggregate solves/s at each device count; returns list of dicts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    device_counts = device_counts or [1, len(jax.devices())]
    results = []
    for n in sorted(set(device_counts)):
        mesh = make_mesh(n)
        batch = batch_per_device * n
        # native dtype (f32 on TPU, f64 under x64 CPU test configs) — forcing
        # f32 here produced mixed-dtype scan carries on x64 builds
        x0m, x0s = batched_scenarios(traj, batch)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        sharding = NamedSharding(mesh, P("batch"))
        x0m, x0s, keys = (jax.device_put(a, sharding) for a in (x0m, x0s, keys))
        run = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, steps, key=k)))
        with mesh:
            out = run(x0m, x0s, keys)
            jax.block_until_ready(out[1].lat_dev)
            t0 = time.time()
            out = run(x0m, x0s, keys)
            jax.block_until_ready(out[1].lat_dev)
            dt = time.time() - t0
        sps = batch * steps / dt
        results.append(
            {"devices": n, "batch": batch, "solves_per_sec": sps,
             "efficiency": None}
        )
    base = results[0]["solves_per_sec"] / results[0]["devices"]
    for r in results:
        r["efficiency"] = r["solves_per_sec"] / (r["devices"] * base)
    return results
