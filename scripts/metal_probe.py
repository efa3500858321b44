"""Probe: 7-pole Au half-domain throughput on the real TPU (VERDICT r3 #1)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.material_library import material_library
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower


def build(n, dl=0.05):
    freq0 = C_0 / 1.55
    size = (n * dl,) * 3
    gold = material_library["Au"]["RakicBrendelBormann1998"]
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    return td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, -size[2] / 4), source_time=gp,
                                polarization="Ez")],
        # the half-space extends through the PML (standard tidy3d practice:
        # structures touching a boundary should cross it) so the gold's
        # update coefficients vary along z only and ride the kernel's
        # broadcast-vector path instead of full-grid piece streams
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, size[2] / 2),
                            size=(td.inf, td.inf, size[2])),
            medium=gold)],
        monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 232  # +24 PML = 256
    steps = int(os.environ.get("BENCH_STEPS", "400"))
    sim = build(n)
    t0 = time.time()
    plan = lower(sim)
    print(f"lowered in {time.time()-t0:.1f}s; grid {plan.shape}, "
          f"{len(plan.poles)} poles, {len(plan.pole_masks)} masks")
    plan.num_steps = steps
    plan.tmesh = plan.tmesh[:steps]
    t0 = time.time()
    runner = FDTDRunner(plan)
    kern = "kstep" if runner.kstep is not None else (
        "fused" if runner.fused is not None else
        ("pallas" if runner.pallas is not None else "xla"))
    cfg = None
    if runner.kstep is not None:
        ks = runner.kstep
        cfg = (ks.bx, ks.by, ks.k, ks.q_z0, ks.q_zn, ks.n_bch)
    print(f"runner built in {time.time()-t0:.1f}s; kernel={kern} cfg={cfg}")
    runner.check_memory_budget()
    est = runner.estimate_device_memory()
    print(f"memory estimate: {est['total']/2**30:.2f} GiB "
          f"(consts {est['consts']/2**30:.3f}, state {est['state']/2**30:.3f})")
    runner.run()
    ncells = float(np.prod(plan.shape))
    rate = 0.0
    for _ in range(2):
        runner.run()
        rate = max(rate, ncells * runner.steps_run / runner.wall_time)
    print(json.dumps({"metric": "fdtd_metal", "value": round(rate / 1e9, 3),
                      "unit": "Gcell*steps/s", "kernel_path": kern,
                      "grid": plan.shape}))


if __name__ == "__main__":
    main()
