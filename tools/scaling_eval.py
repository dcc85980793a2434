"""Run the BASELINE.md scaling-efficiency harness on a virtual device mesh.

Real multi-chip hardware is unavailable in this container (one TPU chip
behind a tunnel), so this runs `parallel.distributed.scaling_report` —
the SAME sharded program that would span a real slice — on N virtual CPU
devices (`jax_num_cpu_devices`). Throughput numbers on 2 physical cores
are meaningless as absolute figures; the committed deliverable is the
*sharding correctness + efficiency shape* of the identical pjit program
at 1/2/4/8 devices (VERDICT r4 "What's missing" #3; SURVEY.md §5.8).

Usage:  python tools/scaling_eval.py [out.json]
Writes Logs/scaling_report_cpu8.json by default.
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "Logs/scaling_report_cpu8.json"
    from tum_control_tpu.api import build_simulation
    from tum_control_tpu.config import MPCConfig, SimConfig
    from tum_control_tpu.parallel.distributed import scaling_report

    sim, x0m, x0s, traj, _ = build_simulation(SimConfig(sim_mode=0, T=1.0), MPCConfig())
    rows = scaling_report(
        sim, traj, device_counts=[1, 2, 4, 8], batch_per_device=16, steps=25
    )
    report = {
        "platform": "cpu-virtual",  # 8 virtual devices on 2 physical cores
        "physical_cores": 2,
        "note": (
            "identical pjit program sharded over jax.sharding.Mesh('batch'); "
            "absolute throughput is core-bound on this container — the "
            "deliverable is that the sharded program compiles, runs, and "
            "reduces correctly at every device count"
        ),
        "batch_per_device": 16,
        "steps": 25,
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    for r in rows:
        print(
            f"devices={r['devices']} batch={r['batch']} "
            f"solves/s={r['solves_per_sec']:.0f} eff={r['efficiency']:.2f}"
        )
    print("wrote", out_path)


if __name__ == "__main__":
    main()
