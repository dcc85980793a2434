"""Component-level microbenchmark of one batched closed-loop step.

Times (batch-vmapped, jitted) each stage of the hot step separately so
optimization work targets the dominant cost:

    planner | build_qp (linearize+condense+assemble) | ipm | polish-free ipm |
    plant+estimator | full step

Run: python tools/profile_step.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tum_control_tpu.api import build_simulation
from tum_control_tpu.config import MPCConfig, SimConfig
from tum_control_tpu.ops.ipm import solve_soft_qp_ipm
from tum_control_tpu.track.planner import planner_emulator


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sim_cfg = SimConfig(sim_mode=0, T=2.0)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())
    ctrl = sim.controller
    eng = ctrl.engine

    M = traj.n_points
    starts = np.linspace(0, M - 1, batch).astype(np.int32)
    pos = np.asarray(traj.pos)[starts]
    yaw = np.mod(np.asarray(traj.yaw)[starts], 2 * np.pi)
    v = np.asarray(traj.v)[starts]
    x0m_b = jnp.asarray(
        np.stack([pos[:, 0], pos[:, 1], yaw, v, 0 * v, 0 * v, 0 * v, 0 * v], axis=1),
        dtype=jnp.float32,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    # shared inputs
    init_b = jax.vmap(eng.init_state)(x0m_b)
    win_b = jax.vmap(lambda p: planner_emulator(traj, p, sim.Tp, sim.N + 1)[1])(
        x0m_b[:, :2]
    )
    yref_b, yref_e_b = jax.vmap(ctrl.make_yref)(win_b)

    # 1. planner
    t_plan = bench(
        jax.jit(jax.vmap(lambda p: planner_emulator(traj, p, sim.Tp, sim.N + 1)[1])),
        x0m_b[:, :2],
    )

    # 2. build_qp
    build = jax.jit(
        jax.vmap(lambda s, x, yr, ye: eng._build_qp(s, x, yr, ye)[0])
    )
    qp_b = build(init_b, x0m_b, yref_b, yref_e_b)
    t_build = bench(build, init_b, x0m_b, yref_b, yref_e_b)

    # 3. IPM (with polish), matching engine settings
    ipm = jax.jit(
        jax.vmap(
            lambda qp, wm: solve_soft_qp_ipm(
                qp, n_iters=eng.newton_iters, n_polish=1, warm=wm, n_id=eng.nz
            )[0]
        )
    )
    warm_b = jax.vmap(lambda s: s.warm)(init_b)
    t_ipm = bench(ipm, qp_b, warm_b)

    # 4. full solve
    slv = jax.jit(jax.vmap(lambda s, x, yr, ye: eng.solve(s, x, yr, ye)[0]))
    t_solve = bench(slv, init_b, x0m_b, yref_b, yref_e_b)

    # 5. full closed-loop step
    carry_b = jax.vmap(sim.init_carry)(x0m_b, x0m_b[:, :7], keys)
    z7 = jnp.zeros((batch, 7), dtype=jnp.float32)
    stp = jax.jit(
        jax.vmap(lambda c, i, a, b: sim.step(c, (i, a, b))[0].x_sim)
    )
    idx = jnp.zeros(batch, dtype=jnp.int32)
    t_step = bench(stp, carry_b, idx, z7, z7)

    print(f"batch={batch}")
    print(f"planner      : {t_plan*1e3:8.3f} ms")
    print(f"build_qp     : {t_build*1e3:8.3f} ms")
    print(f"ipm+polish   : {t_ipm*1e3:8.3f} ms")
    print(f"solve (all)  : {t_solve*1e3:8.3f} ms")
    print(f"full step    : {t_step*1e3:8.3f} ms -> {batch/t_step:,.0f} solves/s")


if __name__ == "__main__":
    main()
