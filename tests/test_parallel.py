"""Mesh/sharding layer tests on the 8-virtual-device CPU mesh (conftest).

Validates the framework's production parallelism (scenario data parallelism
over a jax.sharding mesh, SURVEY.md §2.4): sharded execution must be
*exactly* the unsharded computation, and the scaling harness must produce a
well-formed report.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.parallel.distributed import scaling_report
from tum_control_tpu.parallel.mesh import batched_scenarios, make_mesh, shard_batch


@pytest.fixture(scope="module")
def sim_bundle():
    sim_cfg = SimConfig(sim_mode=0, T=0.2)  # 10 control steps
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())
    return sim, traj


def test_make_mesh_and_shard_batch(sim_bundle):
    _, traj = sim_bundle
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    x0m, x0s = batched_scenarios(traj, 16)
    x0m_s = shard_batch(mesh, x0m)
    assert x0m_s.sharding.is_equivalent_to(NamedSharding(mesh, P("batch")), x0m.ndim)
    # each device holds 16/8 = 2 scenarios
    assert x0m_s.addressable_shards[0].data.shape[0] == 2


@pytest.mark.slow
def test_sharded_run_matches_single_device(sim_bundle):
    """Data parallelism must not change the semantics: per-scenario results
    of a sharded batched run match the unsharded vmapped run. (Not bitwise:
    GSPMD partitioning changes XLA's fusion choices, and the closed loop
    amplifies last-bit rounding differences — so compare at physical
    scales: controls to 1e-3 rad/s / m/s^3, deviations to 1e-3 m.)"""
    sim, traj = sim_bundle
    batch, steps = 16, 5
    x0m, x0s = batched_scenarios(traj, batch)
    keys = jax.random.split(jax.random.PRNGKey(7), batch)

    run = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, steps, key=k)))
    _, log_ref = run(x0m, x0s, keys)

    mesh = make_mesh(8)
    x0m_s, x0s_s, keys_s = shard_batch(mesh, (x0m, x0s, keys))
    with mesh:
        _, log_sh = run(x0m_s, x0s_s, keys_s)
        mean_lat = jnp.mean(jnp.abs(log_sh.lat_dev))  # cross-device reduction
        jax.block_until_ready(mean_lat)

    np.testing.assert_allclose(
        np.array(log_sh.lat_dev), np.array(log_ref.lat_dev), atol=1e-3
    )
    np.testing.assert_allclose(np.array(log_sh.simU), np.array(log_ref.simU), atol=1e-3)
    np.testing.assert_array_equal(
        np.array(log_sh.simSolverDebug[..., 4]), np.array(log_ref.simSolverDebug[..., 4])
    )
    assert np.isfinite(float(mean_lat))
    assert (np.array(log_sh.simSolverDebug[..., 4]) == 0).all()


@pytest.mark.slow
def test_scaling_report_shape(sim_bundle):
    sim, traj = sim_bundle
    rep = scaling_report(sim, traj, device_counts=[1, 2], batch_per_device=4, steps=3)
    assert [r["devices"] for r in rep] == [1, 2]
    for r in rep:
        assert r["solves_per_sec"] > 0
        assert r["efficiency"] is not None and r["efficiency"] > 0
    assert rep[0]["efficiency"] == pytest.approx(1.0)
