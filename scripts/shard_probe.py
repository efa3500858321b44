"""Attribute the shard_map overhead: 1-device-mesh kstep vs unsharded.

Modes: base (full sharded), noexch (halo exchange skipped — perf bound
only, physics wrong), unsharded.
Usage: python scripts/shard_probe.py [n] [modes...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 360
    modes = sys.argv[2:] or ["unsharded", "base", "noexch"]
    import bench
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.kernels.pallas_kstep import PallasKStepper
    from tidy3d_tpu.solver.lowering import lower
    from tidy3d_tpu.solver.sharding import ShardingPlan, make_mesh

    steps = int(os.environ.get("BENCH_STEPS", "800"))
    for mode in modes:
        PallasKStepper._SKIP_EXCH = mode == "noexch"
        sim = bench._vacuum_sim(n)
        plan = lower(sim)
        plan.num_steps = steps
        plan.tmesh = plan.tmesh[:steps]
        sp = None
        if mode != "unsharded":
            mesh, _ = make_mesh(1, decomp=(1, 1, 1))
            sp = ShardingPlan(mesh, plan.shape)
        runner = FDTDRunner(plan, sharding_plan=sp)
        ks = runner.kstep
        cfg = (ks.bx, ks.by, ks.k, ks.shard is not None) if ks else None
        t0 = time.time()
        runner.run()
        first = time.time() - t0
        ncells = float(np.prod(plan.shape))
        rate = 0.0
        for _ in range(2):
            runner.run()
            rate = max(rate, ncells * runner.steps_run / runner.wall_time)
        print(json.dumps({"mode": mode, "cfg": cfg,
                          "first_s": round(first, 1),
                          "rate_gcs": round(rate / 1e9, 3)}), flush=True)
    PallasKStepper._SKIP_EXCH = False


if __name__ == "__main__":
    main()
