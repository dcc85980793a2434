"""Real-time deployment loop: native executor + jitted NMPC at a fixed rate.

    python deploy_rt.py [--period 0.02] [--cycles 500] [--controller nominal]
                        [--telemetry /tmp/telemetry.bin] [--pipeline N]

Runs the single-scenario control cycle (planner + RTI solve on the
accelerator; plant simulation standing in for the vehicle) under the C++
real-time executor: absolute-deadline scheduling, deadline-miss watchdog,
lock-free telemetry, native p50/p99 latency stats against the Ts budget.
This is the serving-path equivalent of the reference's soft real-time loop
(main.py:48-78) with production-grade timing instrumentation.

--pipeline N (default 0 = synchronous) keeps N control steps in flight:
cycle k dispatches step k without blocking (JAX async dispatch chains the
device-resident carry) and blocks only on step k-N's result — the standard
real-time-MPC one-period sensor-to-actuator latency (acados' own RTI
preparation/feedback split has the same contract: the control applied at
cycle k was prepared from cycle k-N information). This hides dispatch/
round-trip latency to a network-attached accelerator: what must fit in the
budget is the *pipelined* completion rate, not the one-shot RTT. On a real
vehicle the same scheme holds by predicting the initial state forward by
N*Ts before each dispatch (here the plant lives inside the step, so
chaining carries is exact).
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
    ap.add_argument("--pipeline", type=int, default=0,
                    help="steps kept in flight (0 = synchronous)")
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
    mode = f"pipeline={args.pipeline}" if args.pipeline else "synchronous"
    print(f"running {args.cycles} cycles at {args.period*1e3:.0f} ms period ({mode}) ...")
    if args.pipeline:
        from collections import deque

        inflight = deque()
        for i in range(args.cycles + args.pipeline):
            is_dispatch = i < args.cycles
            is_retire = i >= args.pipeline
            t0 = ex.begin_cycle() if is_retire else None
            if is_dispatch:
                # async dispatch: chains the device-resident carry, returns
                # immediately — no host sync on the hot path. Start the
                # device->host copies NOW so the retire N cycles later reads
                # host memory instead of paying a synchronous fetch
                # round-trip (measured 67 ms/fetch through the tunnel vs
                # 11.6 ms/cycle total with prefetch).
                carry, log = step(carry, (jnp.array(i), zeros7, zeros7))
                for a in (log.simU, log.simSolverDebug, log.lat_dev, log.vel_dev):
                    a.copy_to_host_async()
                inflight.append((time.perf_counter_ns(), log))
            if is_retire:
                # solve_ns in pipelined mode = dispatch-to-retire latency of
                # the retired step (the true sensor-to-actuator age of the
                # control being applied), not the near-zero host-copy read.
                t_disp, lg = inflight.popleft()
                u = np.asarray(lg.simU)        # step (i - pipeline)'s result
                dbg = np.asarray(lg.simSolverDebug)
                solve_ns = time.perf_counter_ns() - t_disp
                ex.record(
                    t0, solve_ns, int(dbg[4]), float(dbg[0]),
                    float(np.asarray(lg.lat_dev)), float(np.asarray(lg.vel_dev)),
                    float(u[0]), float(u[1]),
                )
    else:
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
    # pipelined solve_ns is dispatch-to-retire (sensor-to-actuator age),
    # which by construction includes the N-period pipeline delay — compare
    # it against the (N+1)-period envelope; synchronous mode against Ts.
    budget_ms = args.period * 1e3 * (args.pipeline + 1 if args.pipeline else 1)
    print(
        f"p99 solve {stats['solve_ms_p99']:.3f} ms vs {budget_ms:.0f} ms "
        f"{'sensor-to-actuator ' if args.pipeline else ''}budget; "
        f"misses {stats['deadline_misses']}/{stats['cycles']}"
    )
    if args.telemetry:
        n = ex.export(args.telemetry)
        print(f"exported {n} telemetry records to {args.telemetry}")
    ex.close()


if __name__ == "__main__":
    main()
