"""Measure this host's real-time scheduling floor with NO accelerator work.

    python tools/host_jitter.py [--cycles 3000] [--period 0.02]

Runs the native fixed-rate executor (runtime/rt_runtime.cc) with an empty
cycle body — the cheapest possible 20 ms loop — and reports deadline
misses and start-time lateness. Any misses here are the environment's
scheduling jitter (hypervisor vCPU preemption / CPU steal), not
application behavior: they bound what ANY userspace serving loop can
achieve on this machine. deploy_rt.py uses the same measurement inline
(sentinel thread) to classify its misses as environment- vs
application-induced.

Measured on the round-4 dev container: 19 misses / 3000 cycles with
lateness up to 161 ms, steal time ~100 s in /proc/stat — a shared-tenant
VM artifact. On dedicated or RT-scheduled hardware this floor is zero.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3000)
    ap.add_argument("--period", type=float, default=0.02)
    args = ap.parse_args()

    from tum_control_tpu.utils.rt_runtime import RealtimeExecutor

    ex = RealtimeExecutor(period_s=args.period)
    t0s = np.zeros(args.cycles, dtype=np.int64)
    for i in range(args.cycles):
        t0s[i] = ex.begin_cycle()
        ex.record(t0s[i], 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    stats = ex.stats()
    ex.close()

    period_ns = int(args.period * 1e9)
    late = (np.diff(t0s) - period_ns) / 1e6
    n_late = int((late > 1.0).sum())
    print(stats)
    print(
        f"empty-loop misses: {stats['deadline_misses']}/{args.cycles}; "
        f"late starts >1 ms: {n_late}; max lateness {late.max():.1f} ms"
    )
    try:
        with open("/proc/stat") as f:
            steal = int(f.readline().split()[8])
        print(f"/proc/stat steal: {steal} jiffies (~{steal/100:.0f} s since boot)")
    except (OSError, IndexError, ValueError):
        pass


if __name__ == "__main__":
    main()
