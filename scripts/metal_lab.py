"""Lab: dissect the dispersive/metal kstep cost on the real TPU.

Usage: python scripts/metal_lab.py [n] [mode ...]
  modes: base poles_off k2 cfg:BX,BY  (default: base poles_off)
Each mode re-lowers and re-builds a fresh runner so env knobs apply.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n, dl=0.05, medium="Au"):
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0
    from tidy3d_tpu.material_library import material_library

    freq0 = C_0 / 1.55
    size = (n * dl,) * 3
    if medium == "Au":
        med = material_library["Au"]["RakicBrendelBormann1998"]
    else:
        med = td.Lorentz(eps_inf=2.0, coeffs=[(8.0, freq0 * 1.8, freq0 / 10)])
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    return td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, -size[2] / 4), source_time=gp,
                                polarization="Ez")],
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, size[2] / 2),
                            size=(td.inf, td.inf, size[2])),
            medium=med)],
        monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def run_mode(n, mode, medium, steps):
    env_save = {}

    def setenv(k, v):
        env_save[k] = os.environ.get(k)
        os.environ[k] = v

    if mode == "poles_off":
        setenv("TIDY3D_TPU_KSTEP_SKIP", "poles")
    elif mode == "k2":
        setenv("TIDY3D_TPU_KSTEP", "2")
    elif mode.startswith("cfg:"):
        setenv("TIDY3D_TPU_KSTEP_CFG", mode[4:])
    elif mode.startswith("env:"):   # env:KEY=VAL
        k, v = mode[4:].split("=", 1)
        setenv(k, v)

    try:
        from tidy3d_tpu.solver.fdtd import FDTDRunner
        from tidy3d_tpu.solver.lowering import lower

        sim = build(n, medium=medium)
        plan = lower(sim)
        plan.num_steps = steps
        plan.tmesh = plan.tmesh[:steps]
        t0 = time.time()
        runner = FDTDRunner(plan)
        build_t = time.time() - t0
        kern = "kstep" if runner.kstep is not None else (
            "fused" if runner.fused is not None else
            ("pallas" if runner.pallas is not None else "xla"))
        cfg = None
        if runner.kstep is not None:
            ks = runner.kstep
            cfg = dict(bx=ks.bx, by=ks.by, k=ks.k, q_z0=ks.q_z0,
                       q_zn=ks.q_zn, n_qch=ks.n_qch, n_bch=ks.n_bch)
        t0 = time.time()
        runner.run()
        first_t = time.time() - t0
        ncells = float(np.prod(plan.shape))
        rate = 0.0
        for _ in range(2):
            runner.run()
            rate = max(rate, ncells * runner.steps_run / runner.wall_time)
        print(json.dumps({
            "mode": mode, "grid": plan.shape, "kernel": kern, "cfg": cfg,
            "build_s": round(build_t, 1), "first_run_s": round(first_t, 1),
            "rate_gcs": round(rate / 1e9, 3)}), flush=True)
    finally:
        for k, v in env_save.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 104
    modes = sys.argv[2:] or ["base", "poles_off"]
    medium = os.environ.get("LAB_MEDIUM", "Au")
    steps = int(os.environ.get("BENCH_STEPS", "400"))
    for mode in modes:
        run_mode(n, mode, medium, steps)


if __name__ == "__main__":
    main()
