"""Worker for the multi-process jax.distributed CPU-mesh test.

Launched by tests/test_distributed.py as N separate processes. Each process
owns 4 virtual CPU devices; jax.distributed.initialize stitches them into
one 4N-device global mesh, over which a short closed-loop batch is sharded
exactly as a multi-host TPU slice would be (SURVEY.md §5.8).

Usage: python _distributed_worker.py <process_id> <num_processes> <port> \
           [devices_per_process] [controller]
Prints one line: RESULT <mean_lat> <ok_count> <n_global_devices>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4
controller = sys.argv[5] if len(sys.argv) > 5 else "nominal"

# sitecustomize preloads jax and pins the axon TPU platform; backends
# initialize lazily, so flipping to CPU here (before the first op) works —
# same recipe as tests/conftest.py
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ndev}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tum_control_tpu.api import build_simulation  # noqa: E402
from tum_control_tpu.config import MPCConfig, SimConfig  # noqa: E402
from tum_control_tpu.parallel.mesh import batched_scenarios, make_mesh  # noqa: E402

assert len(jax.devices()) == ndev * nproc, jax.devices()
assert len(jax.local_devices()) == ndev

batch, steps = 8, 3
sim, x0m, x0s, traj, _ = build_simulation(
    SimConfig(sim_mode=0, T=steps * 0.02), MPCConfig(controller=controller)
)
x0m_b, x0s_b = batched_scenarios(traj, batch)
keys = jax.random.split(jax.random.PRNGKey(0), batch)

mesh = make_mesh()  # all global devices
sharding = NamedSharding(mesh, P("batch"))


def globalize(host_arr):
    a = np.asarray(host_arr)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


x0m_g, x0s_g, keys_g = (globalize(a) for a in (x0m_b, x0s_b, keys))

run = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, steps, key=k)))
with mesh:
    _, log = run(x0m_g, x0s_g, keys_g)
    # global reductions -> replicated scalars (lower to psum across processes)
    mean_lat = jnp.mean(jnp.abs(log.lat_dev))
    ok = jnp.sum((log.simSolverDebug[..., 4] == 0).astype(jnp.int32))
    jax.block_until_ready(mean_lat)

print(f"RESULT {float(mean_lat):.12e} {int(ok)} {len(jax.devices())}", flush=True)
