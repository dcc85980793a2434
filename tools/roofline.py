"""Roofline / MFU accounting for the batched nominal closed-loop step
(VERDICT r3 #3): how close is the measured throughput to what the chip can
do, and why does throughput decline past batch 128?

Method
------
For each batch size the tool:
  1. lowers + compiles the same R-step chained program the benchmarks time
     (one `lax.scan` over full closed-loop steps, so dispatch overhead is
     excluded) and reads XLA's post-fusion cost analysis: `flops` and
     `bytes accessed`. Post-fusion byte counts approximate real HBM traffic
     (operands/results at fusion boundaries; VMEM-resident intermediates
     inside a fusion are not counted). Pallas custom calls contribute their
     operand/result buffers; their *internal* traffic is VMEM by
     construction (that is the point of the kernels).
  2. times the program on hardware (second call, compile excluded),
  3. reports achieved FLOP/s and HBM GB/s against the v5e peaks and the
     bandwidth-roofline time max(flops/F_peak, bytes/B_peak).

An analytic per-scenario model of the dominant structures (Gamma build, GN
assembly, IPM normal equations + Cholesky) is printed alongside, so the XLA
numbers can be sanity-checked against arithmetic (the model is a lower
bound: it ignores planner gathers, estimator, plant, bookkeeping).

v5e public peaks: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM. The closed-loop
step is f32 and VPU/bandwidth-shaped (tiny 76x76 matrices, elementwise
dynamics), so the binding roof is HBM bandwidth, not the MXU.

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
MXU_PEAK = 197e12     # FLOP/s bf16 (upper bound; our f32 VPU work is far lower)
R = 200               # chained steps per measurement


def analytic_model(N=38, nz=76, nc=78, qp_iters=4, n_polish=1):
    """Per-scenario per-step FLOPs/bytes of the named dominant structures."""
    f32 = 4
    gamma_bytes = (N + 1) * 8 * nz * f32            # Gamma materialization
    lin_io = N * (10 + 8 + 80) * f32                # linearize kernel in+out
    gn_flops = 2 * (N * 4) * nz * nz + 2 * 4 * nz * nz   # Mf'WMf + Me'WeMe
    con_flops = 2 * nc * nz * 8                      # constraint-row contraction
    it = qp_iters + n_polish
    ipm_flops = it * (2 * nc * nz * nz + nz**3 / 3 + 4 * nz * nz)
    dx_flops = 2 * (N + 1) * 8 * nz
    # Gamma is re-read by GN assembly, constraint rows, and dX expansion
    gamma_traffic = 4 * gamma_bytes
    flops = gn_flops + con_flops + ipm_flops + dx_flops
    return flops, gamma_traffic + lin_io


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512, 1024]
    sim_cfg = SimConfig(sim_mode=0, T=R * 0.02)
    sim, x0m, x0s, traj, _ = build_simulation(sim_cfg, MPCConfig())

    a_flops, a_bytes = analytic_model(qp_iters=MPCConfig().qp_iters)
    print(
        f"analytic lower bound (per scenario-step): "
        f"{a_flops/1e6:.2f} MFLOP, {a_bytes/1e3:.1f} KB "
        f"(Gamma+GN+IPM only)\n"
    )
    hdr = (
        f"{'batch':>6} {'ms/step':>8} {'solves/s':>9} {'GFLOP/s':>8} "
        f"{'GB/s':>7} {'%HBM':>5} {'B/scen-step':>11} {'F/scen-step':>11} "
        f"{'roofline%':>9}"
    )
    print(hdr)
    rows = []
    for batch in batches:
        x0m_b, x0s_b = batched_scenarios(traj, batch, dtype=jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        run_b = jax.jit(jax.vmap(lambda a, b, k: sim.run(a, b, R, key=k)))
        lowered = run_b.lower(x0m_b, x0s_b, keys)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / R
        byts = float(ca.get("bytes accessed", 0.0)) / R

        out = compiled(x0m_b, x0s_b, keys)
        jax.block_until_ready(out[1].lat_dev)
        t0 = time.time()
        out = compiled(x0m_b, x0s_b, keys)
        jax.block_until_ready(out[1].lat_dev)
        dt = (time.time() - t0) / R                  # s per batched step

        gfs = flops / dt / 1e9
        gbs = byts / dt / 1e9
        t_roof = max(flops / MXU_PEAK, byts / HBM_PEAK)
        rows.append((batch, dt, byts, flops))
        print(
            f"{batch:>6} {dt*1e3:8.3f} {batch/dt:9.0f} {gfs:8.1f} "
            f"{gbs:7.1f} {gbs/ (HBM_PEAK/1e9) *100:5.1f} "
            f"{byts/batch/1e3:9.1f}KB {flops/batch/1e6:9.2f}M "
            f"{t_roof/dt*100:8.1f}%"
        )

    # decline explanation: bytes per scenario-step growth with batch
    b0 = rows[0]
    print(
        "\nper-scenario HBM traffic vs smallest batch "
        "(growth here = shrinking VMEM residency / lane-group serialization):"
    )
    for batch, dt, byts, flops in rows:
        print(
            f"  batch {batch:>4}: {byts/batch/1e3:7.1f} KB/scen-step "
            f"({byts/batch/(b0[2]/b0[0]):.2f}x of batch {b0[0]})"
        )


if __name__ == "__main__":
    main()
