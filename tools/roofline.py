"""Roofline / MFU accounting for the batched nominal closed-loop step
(VERDICT r3 #3): how close is the measured throughput to what the chip can
do, and why does throughput decline at large batch?

Three measurements per batch size:
  1. XLA post-fusion cost analysis (`compiled.cost_analysis()`): flops and
     bytes accessed of everything OUTSIDE Pallas custom calls (post-fusion
     byte counts approximate HBM traffic at fusion boundaries).
  2. An analytic model of the Pallas-kernel work XLA cannot see (the
     custom calls report zero flops): fused linearize rollout, condense
     (Gamma build), per-IPM-iteration Cholesky — documented formulas below.
  3. Hardware wall time of the same R-step chained program (one lax.scan,
     dispatch-free; second call, compile excluded).

Combined, they give achieved FLOP/s and HBM GB/s against the v5e peaks
(197 TFLOP/s bf16 MXU upper bound, ~819 GB/s HBM) and the roofline time
max(flops/F_peak, bytes/B_peak). The step is f32 and mostly tiny-matrix /
elementwise work, so the binding roof is HBM bandwidth and VPU issue rate,
not the MXU.

The large-batch decline is then localized by per-stage chained timing
(stage_bench methodology) at the smallest and largest requested batches.

Run: python tools/roofline.py [batches...]   (default 64 128 256 512 1024)
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
from tum_control_tpu.parallel.mesh import batched_scenarios

HBM_PEAK = 819e9      # B/s, TPU v5e
MXU_PEAK = 197e12     # FLOP/s bf16 (upper bound; the f32 VPU peak is far lower)
R = 200               # chained steps per measurement


def pallas_model(N=38, nx=8, nu=2, qp_iters=4, n_polish=1, substeps=3):
    """Per-scenario per-step FLOPs/HBM-bytes of the Pallas kernels (work
    invisible to XLA cost analysis). f32 = 4 B.

    linearize: RK4 x substeps of the 8-state ODE (~250 flop/eval incl.
      Pacejka trig) x 4 stages, once for the value + once per (nx+nu)=10
      forward tangents (JVP ~ same cost as the primal), per stage element.
    condense:  per stage (nx,nx)@(nx,nz+1) + (nx,nu)@(nu,nz) accumulate.
    chol:      one (nz,nz) Cholesky + 2 triangular solves per IPM
      iteration (Mehrotra predictor+corrector share the factorization),
      plus 1 polish factorization.
    HBM bytes: kernel operand/result buffers only (internals are VMEM by
    construction — that is the point of the kernels).
    """
    f32 = 4
    nz = N * nu
    ode = 250.0
    lin_flops = N * (ode * 4 * substeps) * (1 + nx + nu)
    lin_bytes = N * (10 + nx + nx * (nx + nu)) * f32
    cond_flops = N * (2 * nx * nx * (nz + 1) + 2 * nx * nu * nz)
    cond_bytes = N * (nx * nx + nx * nu + nx) * f32 + (N + 1) * (nx + nx * nz) * f32
    it = qp_iters + n_polish
    chol_flops = it * (nz**3 / 3 + 2 * 2 * nz * nz)
    chol_bytes = it * (2 * nz * nz) * f32
    return (lin_flops + cond_flops + chol_flops,
            lin_bytes + cond_bytes + chol_bytes)


def scan_time(step, carry, reps):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=reps)[0]

    out = run(carry)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(carry)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def stage_breakdown(sim, traj, batch, reps):
    """Per-stage chained device timing (stage_bench methodology)."""
    from tum_control_tpu.ops.ipm import solve_soft_qp_ipm
    from tum_control_tpu.track.planner import planner_emulator

    ctrl, eng = sim.controller, sim.controller.engine
    x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    init_b = jax.vmap(ctrl.init_state)(x0m_b)
    win_b = jax.vmap(lambda p: planner_emulator(traj, p, sim.Tp, sim.N + 1)[1])(
        x0m_b[:, :2]
    )
    yref_b, yref_e_b = jax.vmap(ctrl.make_yref)(win_b)

    def build_step(st):
        qp = jax.vmap(lambda s, x, yr, ye: eng._build_qp(s, x, yr, ye)[0])(
            st, x0m_b, yref_b, yref_e_b
        )
        dU = 1e-9 * qp.g0.reshape(batch, eng.N, eng.nu)
        return st._replace(U=st.U + dU)

    qp_b = jax.jit(
        jax.vmap(lambda s, x, yr, ye: eng._build_qp(s, x, yr, ye)[0])
    )(init_b, x0m_b, yref_b, yref_e_b)
    warm_b = jax.vmap(lambda s: s.warm)(init_b)

    def ipm_step(wm):
        _, _, wm2 = jax.vmap(
            lambda qp, w: solve_soft_qp_ipm(
                qp, n_iters=eng.newton_iters, n_polish=1, warm=w, n_id=eng.nz
            )
        )(qp_b, wm)
        return wm2

    def full_step(carry):
        z7 = jnp.zeros((batch, 7), dtype=jnp.float32)
        c2, _ = jax.vmap(sim.step)(carry, (jnp.zeros(batch, jnp.int32), z7, z7))
        return c2

    carry0 = jax.vmap(sim.init_carry)(x0m_b, x0s_b, keys)
    return {
        "build_qp": scan_time(build_step, init_b, reps),
        "ipm": scan_time(ipm_step, warm_b, reps),
        "full_step": scan_time(full_step, carry0, reps),
    }


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    sim_cfg = SimConfig(sim_mode=0, T=R * 0.02)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())

    p_flops, p_bytes = pallas_model(qp_iters=MPCConfig().qp_iters)
    print(
        f"Pallas-kernel work per scenario-step (invisible to XLA cost "
        f"analysis): {p_flops/1e6:.2f} MFLOP, {p_bytes/1e3:.1f} KB\n"
    )
    hdr = (
        f"{'batch':>6} {'ms/step':>8} {'solves/s':>9} {'GFLOP/s':>8} "
        f"{'GB/s':>7} {'%HBM':>5} {'KB/scen':>8} {'roofline%':>9}"
    )
    print(hdr)
    rows = []
    TILE = 512  # VMEM-optimal sub-program batch; larger scenario counts
    # tile across sequential 512-wide sub-programs via lax.map (holds
    # per-scenario throughput flat where the monolithic program spilled)
    for batch in batches:
        x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        if batch > TILE:
            tiles = batch // TILE

            def run_b_fn(a, b, k):
                rs = lambda x: x.reshape((tiles, TILE) + x.shape[1:])
                out = jax.lax.map(
                    lambda abk: jax.vmap(
                        lambda aa, bb, kk: sim.run(aa, bb, R, key=kk)
                    )(*abk),
                    (rs(a), rs(b), rs(k)),
                )
                return jax.tree.map(
                    lambda x: x.reshape((batch,) + x.shape[2:]), out
                )

            run_b = jax.jit(run_b_fn)
        else:
            run_b = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, R, key=k)))
        compiled = run_b.lower(x0m_b, x0s_b, keys).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / R + p_flops * batch
        byts = float(ca.get("bytes accessed", 0.0)) / R + p_bytes * batch

        out = compiled(x0m_b, x0s_b, keys)
        jax.block_until_ready(out[1].lat_dev)
        t0 = time.time()
        out = compiled(x0m_b, x0s_b, keys)
        jax.block_until_ready(out[1].lat_dev)
        dt = (time.time() - t0) / R

        gfs, gbs = flops / dt / 1e9, byts / dt / 1e9
        t_roof = max(flops / MXU_PEAK, byts / HBM_PEAK)
        rows.append((batch, dt))
        print(
            f"{batch:>6} {dt*1e3:8.3f} {batch/dt:9.0f} {gfs:8.1f} "
            f"{gbs:7.1f} {gbs/(HBM_PEAK/1e9)*100:5.1f} "
            f"{byts/batch/1e3:8.1f} {t_roof/dt*100:8.1f}%"
        )

    # --- decline localization: stage scaling smallest vs largest batch ---
    b_lo, b_hi = batches[0], batches[-1]
    print(f"\nper-stage device time, batch {b_lo} vs {b_hi} (us/scenario-step):")
    s_lo = stage_breakdown(sim, traj, b_lo, 100)
    s_hi = stage_breakdown(sim, traj, b_hi, 50)
    for k in s_lo:
        lo, hi = s_lo[k] / b_lo * 1e6, s_hi[k] / b_hi * 1e6
        print(f"  {k:10s}: {lo:6.2f} -> {hi:6.2f}  ({hi/lo:.2f}x)")
    best = min(rows, key=lambda r: r[1] / r[0])
    print(
        f"\nInterpretation: achieved HBM bandwidth stays <= ~10% of peak and\n"
        f"FLOP/s far below any compute peak — the step is latency / VPU-issue\n"
        f"bound on small per-scenario ops, not bandwidth-saturated. This\n"
        f"protocol peaks at batch {best[0]} ({best[0]/best[1]:.0f} solves/s\n"
        f"this run); batches beyond {TILE} tile across sequential\n"
        f"{TILE}-wide sub-programs, which removed the old large-batch VMEM\n"
        f"spill (r4: -33% at 1024). The canonical 1000-step bench protocol\n"
        f"prefers batch 128 by ~4% — state the protocol with every number."
    )


if __name__ == "__main__":
    main()
