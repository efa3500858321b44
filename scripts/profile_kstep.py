"""Profile the kstep kernel(s) on the TPU and print per-kernel durations.

With the static grid partition active, the interior and strip kernels are
separate XLA ops, so the trace shows exactly where group time goes."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import tidy3d_tpu as td
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower
    from tidy3d_tpu.constants import C_0

    n = int(os.environ.get("BENCH_GRID", "360"))
    freq0 = C_0 / 1.55
    dl = 0.05
    sim = td.Simulation(
        center=(0, 0, 0), size=(n * dl,) * 3, run_time=1e-11,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=freq0, fwidth=freq0 / 5),
            polarization="Ez")],
        monitors=[], boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)
    plan = lower(sim)
    plan.num_steps = 240
    plan.tmesh = plan.tmesh[:240]
    runner = FDTDRunner(plan)
    runner.run()  # compile

    trace_dir = "/tmp/kstep_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    runner.run()
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found under", trace_dir)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        pid_name = ev.get("pid")
        durs[name] += ev.get("dur", 0)
        counts[name] += 1
    total = sum(v for k, v in durs.items())
    print(f"{'kernel':60s} {'ms':>10s} {'count':>7s}")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{name[:60]:60s} {d/1000:10.2f} {counts[name]:7d}")


if __name__ == "__main__":
    main()
