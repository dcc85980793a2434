"""Measure the serving-path completion latency through the device tunnel.

For the deadline-aware dispatcher (deploy_rt.py --pipeline) the governing
number is dispatch->host-visible completion latency of one packed control
step: device solve + device->host copy + tunnel round trip. This probe
paces dispatches at the control period (steady serving state, one step in
flight) and reports the latency distribution, which sets the dispatch
lead time (lead = lat_p90 + margin).

Usage: python tools/tunnel_probe.py [--cycles 300] [--period 0.02]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=300)
    ap.add_argument("--period", type=float, default=0.02)
    ap.add_argument("--controller", default="nominal")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig

    sim, x0m, x0s, traj, _ = build_simulation(
        SimConfig(sim_mode=0, T=args.cycles * 0.02), MPCConfig(controller=args.controller)
    )
    carry = sim.init_carry(x0m, x0s, jax.random.PRNGKey(0))
    zeros7 = jnp.zeros(7, dtype=x0m.dtype)

    @jax.jit
    def step_packed(carry, inp):
        carry, log = sim.step(carry, inp)
        packed = jnp.concatenate([
            log.simU.astype(jnp.float32),
            log.simSolverDebug.astype(jnp.float32),
            jnp.stack([log.lat_dev, log.vel_dev]).astype(jnp.float32),
        ])
        return carry, packed

    idx_dev = [jnp.array(i) for i in range(args.cycles)]
    carry, packed = step_packed(carry, (idx_dev[0], zeros7, zeros7))
    np.asarray(packed)

    lats = np.zeros(args.cycles)
    t_next = time.perf_counter_ns()
    for i in range(args.cycles):
        now = time.perf_counter_ns()
        if now < t_next:
            time.sleep((t_next - now) / 1e9)
        t_next += int(args.period * 1e9)
        t0 = time.perf_counter_ns()
        carry, packed = step_packed(carry, (idx_dev[i], zeros7, zeros7))
        packed.copy_to_host_async()
        np.asarray(packed)  # block until host-visible
        lats[i] = (time.perf_counter_ns() - t0) / 1e6

    q = np.percentile(lats, [10, 50, 90, 99])
    print(
        f"completion latency ms over {args.cycles} paced cycles: "
        f"p10={q[0]:.2f} p50={q[1]:.2f} p90={q[2]:.2f} p99={q[3]:.2f} "
        f"max={lats.max():.2f} mean={lats.mean():.2f}"
    )


if __name__ == "__main__":
    main()
