"""Real-time deployment loop: native executor + jitted NMPC at a fixed rate.

    python deploy_rt.py [--period 0.02] [--cycles 500] [--controller nominal]
                        [--telemetry /tmp/telemetry.bin]

Runs the single-scenario control cycle (planner + RTI solve on the
accelerator; plant simulation standing in for the vehicle) under the C++
real-time executor: absolute-deadline scheduling, deadline-miss watchdog,
lock-free telemetry, native p50/p99 latency stats against the Ts budget.
This is the serving-path equivalent of the reference's soft real-time loop
(main.py:48-78) with production-grade timing instrumentation.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--period", type=float, default=0.02)
    ap.add_argument("--cycles", type=int, default=500)
    ap.add_argument("--controller", default="nominal")
    ap.add_argument("--telemetry", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig
    from tum_control_tpu.utils.rt_runtime import RealtimeExecutor

    sim_cfg = SimConfig(sim_mode=0, T=args.cycles * 0.02)
    mpc_cfg = MPCConfig(controller=args.controller)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, mpc_cfg)

    step = jax.jit(sim.step)
    carry = sim.init_carry(x0m, x0s, jax.random.PRNGKey(0))
    zeros7 = jnp.zeros(7, dtype=x0m.dtype)
    # warm up compile outside the timed loop
    carry0, log = step(carry, (jnp.array(0), zeros7, zeros7))
    jax.block_until_ready(log.simU)

    ex = RealtimeExecutor(period_s=args.period)
    print(f"running {args.cycles} cycles at {args.period*1e3:.0f} ms period ...")
    for i in range(args.cycles):
        t0 = ex.begin_cycle()
        t_solve = time.perf_counter_ns()
        carry, log = step(carry, (jnp.array(i), zeros7, zeros7))
        jax.block_until_ready(log.simU)
        solve_ns = time.perf_counter_ns() - t_solve
        ex.record(
            t0, solve_ns, int(log.simSolverDebug[4]), float(log.simSolverDebug[0]),
            float(log.lat_dev), float(log.vel_dev), float(log.simU[0]), float(log.simU[1]),
        )
    stats = ex.stats()
    print(stats)
    budget_ms = args.period * 1e3
    print(
        f"p99 solve {stats['solve_ms_p99']:.3f} ms vs {budget_ms:.0f} ms budget; "
        f"misses {stats['deadline_misses']}/{stats['cycles']}"
    )
    if args.telemetry:
        n = ex.export(args.telemetry)
        print(f"exported {n} telemetry records to {args.telemetry}")
    ex.close()


if __name__ == "__main__":
    main()
