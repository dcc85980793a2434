from tum_control_tpu.parallel.mesh import make_mesh, shard_batch, batched_scenarios
