"""Benchmark: FDTD throughput (Gcell*steps/s) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): 20 Gcell*steps/s/chip.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import tidy3d_tpu as td
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower
    from tidy3d_tpu.constants import C_0

    # interior chosen so the total grid (interior + 2x12 PML) is lane-aligned
    # (multiples of 128), which the solver exploits for tile-aligned slabs
    n = int(os.environ.get("BENCH_GRID", "360"))
    steps_target = int(os.environ.get("BENCH_STEPS", "1200"))

    freq0 = C_0 / 1.55
    dl = 0.05
    size = (n * dl, n * dl, n * dl)
    sim = td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=freq0, fwidth=freq0 / 5),
            polarization="Ez")],
        monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=0.0,
    )
    plan = lower(sim)
    # cap the step count for benchmarking
    plan.num_steps = steps_target
    plan.tmesh = plan.tmesh[:steps_target]
    runner = FDTDRunner(plan)

    # first run includes compile; the relay adds ~1 s dispatch jitter per
    # run, so report the best of three steady-state runs
    runner.run()
    ncells = float(np.prod(plan.shape))
    rate = 0.0
    for _ in range(3):
        runner.run()
        rate = max(rate, ncells * runner.steps_run / runner.wall_time)
    value = rate / 1e9
    print(json.dumps({
        "metric": "fdtd_throughput",
        "value": round(value, 3),
        "unit": "Gcell*steps/s",
        "vs_baseline": round(value / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
