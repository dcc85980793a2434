"""On-device per-stage timing of the hot closed-loop step, dispatch-free.

Each stage runs R times inside one lax.scan (a single dispatch), so the
measurement is pure device time — robust to host/tunnel latency, unlike
per-call timing. Stages: planner | build_qp | ipm | full solve | plant+est |
full step.

Run: python tools/stage_bench.py [batch] [repeats] [controller]
"""
import os

if __name__ == "__main__" and os.environ.get("STAGE_BENCH_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
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


def scan_time(step, carry, R, name):
    """Time R chained iterations of `step` inside one jitted scan."""
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=R)[0]

    out = run(carry)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(carry)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / R
    print(f"{name:14s}: {dt*1e6:9.1f} us/iter", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    controller = sys.argv[3] if len(sys.argv) > 3 else "nominal"

    sim_cfg = SimConfig(sim_mode=0, T=2.0)
    sim, x0m, x0s, traj, _ = build_simulation(
        sim_cfg, MPCConfig(controller=controller)
    )
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

    init_b = jax.vmap(ctrl.init_state)(x0m_b)
    # engine-level x0 (SNMPC fans the measured state into the stacked copies)
    x0e_b = jax.vmap(ctrl._fan)(x0m_b) if hasattr(ctrl, "_fan") else x0m_b
    win_b = jax.vmap(lambda p: planner_emulator(traj, p, sim.Tp, sim.N + 1)[1])(
        x0m_b[:, :2]
    )
    yref_b, yref_e_b = jax.vmap(ctrl.make_yref)(win_b)
    print(f"batch={batch} repeats={R}", flush=True)

    # 1. planner: carry the pose through a tiny rotation so iterations chain
    def plan_step(p):
        w = jax.vmap(lambda q: planner_emulator(traj, q, sim.Tp, sim.N + 1)[1])(p)
        return p + 1e-6 * w.pos[:, 0, :]

    scan_time(plan_step, x0m_b[:, :2], R, "planner")

    # 2. build_qp: feed the QP gradient back into the carry state
    def build_step(st):
        qp = jax.vmap(lambda s, x, yr, ye: eng._build_qp(s, x, yr, ye)[0])(
            st, x0e_b, yref_b, yref_e_b
        )
        dU = 1e-9 * qp.g0.reshape(batch, eng.N, eng.nu)
        return st._replace(U=st.U + dU)

    scan_time(build_step, init_b, R, "build_qp")

    # 3. ipm: chain through the warm start
    qp_b = jax.jit(
        jax.vmap(lambda s, x, yr, ye: eng._build_qp(s, x, yr, ye)[0])
    )(init_b, x0e_b, yref_b, yref_e_b)
    warm_b = jax.vmap(lambda s: s.warm)(init_b)

    def ipm_step(wm):
        _, _, wm2 = jax.vmap(
            lambda qp, w: solve_soft_qp_ipm(
                qp, n_iters=eng.newton_iters, n_polish=1, warm=w, n_id=eng.nz
            )
        )(qp_b, wm)
        return wm2

    scan_time(ipm_step, warm_b, R, "ipm")

    # 4. full solve chained through the RTI state
    def solve_step(st):
        _, st2, _ = jax.vmap(lambda s, x, yr, ye: eng.solve(s, x, yr, ye))(
            st, x0e_b, yref_b, yref_e_b
        )
        return st2

    scan_time(solve_step, init_b, R, "solve")

    # 5. full closed-loop step (the bench.py quantity)
    carry_b = jax.vmap(sim.init_carry)(x0m_b, x0m_b[:, :7], keys)
    z7 = jnp.zeros((batch, 7), dtype=jnp.float32)

    def full_step(c):
        c2 = jax.vmap(lambda cc: sim.step(cc, (jnp.int32(0), z7[0], z7[0]))[0])(c)
        return c2

    dt = scan_time(full_step, carry_b, R, "full step")
    print(f"-> {batch/dt:,.0f} solves/s", flush=True)


if __name__ == "__main__":
    main()
