"""Benchmark: FDTD throughput (Gcell*steps/s) on one TPU chip.

Prints one JSON line per case: {"metric", "value", "unit", "vs_baseline",
"compile_s", ...}. Baseline north star (BASELINE.md): 20 Gcell*steps/s/chip.

Default cases (all realistic BASELINE configs stay visible in the recorded
artifact — VERDICT r2 item 2, r4 items 1-3):
  fdtd_throughput    vacuum + CPML headline (384^3)
  fdtd_broadband_dft 11-freq running-DFT field+flux monitors (config #3)
  fdtd_dispersive    1-pole Lorentz half-domain (config #4)
  fdtd_combined      dispersive + 11-freq broadband monitors (config #4's
                     actual shape: the two slowest paths compound)
  fdtd_metal         7-pole Au (RakicBrendelBormann) half-space at 256^3
                     — the material-library metal workhorse
  fdtd_sharded       the x-decomposed shard_map kstep path on a 1-device
                     mesh (bounds shard_map overhead on real hardware)
``--headline`` restores the vacuum-only run. BENCH_SKIP=case1,case2 skips
cases; BENCH_METAL_GRID=360 adds the 384^3 metal size.
"""

import json
import os
import sys
import time

import numpy as np


def _emit(label, rate, extra=None):
    rec = {"metric": label, "value": round(rate, 3),
           "unit": "Gcell*steps/s"}
    if extra:
        rec.update(extra)
    rec["vs_baseline"] = round(rate / 20.0, 3)
    print(json.dumps(rec), flush=True)


def _run_case(sim, steps_target, label, repeats=2, make_shard=None):
    import tidy3d_tpu as td  # noqa: F401
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower

    plan = lower(sim)
    plan.num_steps = steps_target
    plan.tmesh = plan.tmesh[:steps_target]
    sharded = make_shard(plan) if make_shard is not None else None
    runner = FDTDRunner(plan, sharding_plan=sharded)
    t0 = time.time()
    runner.run()
    first_s = time.time() - t0
    ncells = float(np.prod(plan.shape))
    rate = 0.0
    for _ in range(repeats):
        runner.run()
        rate = max(rate, ncells * runner.steps_run / runner.wall_time)
    kern = "kstep" if runner.kstep is not None else (
        "fused" if runner.fused is not None else "xla")
    if runner.kstep is not None and runner.kstep.shard is not None:
        kern = "kstep_sharded"
    return rate / 1e9, {
        "kernel_path": kern,
        "compile_s": round(getattr(runner, "compile_time", 0.0) or first_s,
                           1)}


def _vacuum_sim(n, dl=0.05):
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    freq0 = C_0 / 1.55
    size = (n * dl,) * 3
    return td.Simulation(
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


def case_headline(n, steps):
    rate, extra = _run_case(_vacuum_sim(n), steps, "fdtd_throughput",
                            repeats=3)
    _emit("fdtd_throughput", rate, extra)


def _dft_monitors(td, size, freqs):
    return [
        td.FieldMonitor(center=(0, 0, 0),
                        size=(size[0] * 0.6, size[1] * 0.6, 0),
                        freqs=freqs, name="field"),
        td.FluxMonitor(center=(0, 0, 0), size=(size[0] * 0.4,) * 3,
                       freqs=freqs, name="flux"),
    ]


def case_broadband_dft(n, steps):
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    freq0 = C_0 / 1.55
    dl = 0.05
    size = (n * dl,) * 3
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    freqs = np.linspace(freq0 * 0.95, freq0 * 1.05, 11).tolist()
    sim = td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, 0), source_time=gp,
                                polarization="Ez")],
        monitors=_dft_monitors(td, size, freqs),
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)
    rate, extra = _run_case(sim, steps, "fdtd_broadband_dft")
    _emit("fdtd_broadband_dft", rate, extra)


def _dispersive_sim(n, monitors_broadband, dl=0.05):
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    freq0 = C_0 / 1.55
    size = (n * dl,) * 3
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    medium = td.Lorentz(eps_inf=2.0,
                        coeffs=[(8.0, freq0 * 1.8, freq0 / 10)])
    if monitors_broadband:
        freqs = np.linspace(freq0 * 0.95, freq0 * 1.05, 11).tolist()
        monitors = _dft_monitors(td, size, freqs)
    else:
        monitors = [td.FluxMonitor(center=(0, 0, 0),
                                   size=(size[0] * 0.4, size[1] * 0.4, 0),
                                   freqs=[freq0], name="flux")]
    return td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, -size[2] / 4),
                                source_time=gp, polarization="Ez")],
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, size[2] / 4),
                            size=(size[0], size[1], size[2] / 2)),
            medium=medium)],
        monitors=monitors,
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def case_dispersive(n, steps):
    rate, extra = _run_case(_dispersive_sim(n, False), steps,
                            "fdtd_dispersive")
    _emit("fdtd_dispersive", rate, extra)


def case_combined(n, steps):
    rate, extra = _run_case(_dispersive_sim(n, True), steps,
                            "fdtd_combined")
    _emit("fdtd_combined", rate, extra)


def _metal_sim(n, dl=0.05):
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0
    from tidy3d_tpu.material_library import material_library

    freq0 = C_0 / 1.55
    size = (n * dl,) * 3
    gold = material_library["Au"]["RakicBrendelBormann1998"]
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    # half-space through the PML: coefficients vary along z only (ride
    # the kernel's broadcast-vector path) — scripts/metal_probe.py shape
    return td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0, 0, -size[2] / 4),
                                source_time=gp, polarization="Ez")],
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, size[2] / 2),
                            size=(td.inf, td.inf, size[2])),
            medium=gold)],
        monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def case_metal(n, steps):
    rate, extra = _run_case(_metal_sim(n), steps, "fdtd_metal")
    extra["grid"] = n + 24
    _emit("fdtd_metal" if n <= 240 else "fdtd_metal_384", rate, extra)


def case_bloch(n, steps):
    """Bandstructure-style complex run: Bloch x/y + PML z, dielectric
    slab — dual real copies packed on the kstep kernel's channel dim.

    Grid fixed at 256^3 (binary-exact dl, z incl. the 24 PML cells):
    a lane-UNALIGNED nz (e.g. 280) trips a Mosaic compiler bug on
    sliced-z-vector broadcasts into the padded lane tail (the crash in
    /tmp mosaic logs: vector.broadcast with vpad offset 264)."""
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    freq0 = C_0 / 1.55
    dl = 0.0625
    nz_int = 232  # + 24 PML = 256 lanes (aligned)
    size = (256 * dl, 256 * dl, nz_int * dl)
    gp = td.GaussianPulse(freq0=freq0, fwidth=freq0 / 8)
    sim = td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(center=(0.12, -0.08, -size[2] / 5),
                                source_time=gp, polarization="Ez")],
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, 0),
                            size=(td.inf, td.inf, size[2] / 4)),
            medium=td.Medium(permittivity=8.0))],
        monitors=[],
        boundary_spec=td.BoundarySpec(
            x=td.Boundary.bloch(bloch_vec=0.27),
            y=td.Boundary.bloch(bloch_vec=-0.13),
            z=td.Boundary.pml()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)
    rate, extra = _run_case(sim, steps, "fdtd_bloch")
    extra["grid"] = 256
    _emit("fdtd_bloch", rate, extra)


def case_sharded(n, steps):
    """kstep under shard_map on a 1-device mesh: bounds the shard_map +
    ring-halo-exchange overhead vs the unsharded kernel on real HW."""
    from tidy3d_tpu.solver.sharding import ShardingPlan, make_mesh

    def make_shard(plan):
        mesh, _ = make_mesh(1, decomp=(1, 1, 1))
        return ShardingPlan(mesh, plan.shape)

    rate, extra = _run_case(_vacuum_sim(n), steps, "fdtd_sharded",
                            make_shard=make_shard)
    _emit("fdtd_sharded", rate, extra)


def main():
    n = int(os.environ.get("BENCH_GRID", "360"))
    steps = int(os.environ.get("BENCH_STEPS", "1200"))
    skip = set(os.environ.get("BENCH_SKIP", "").split(","))
    headline_only = "--headline" in sys.argv

    cases = [("fdtd_throughput", lambda: case_headline(n, steps))]
    if not headline_only:
        metal_steps = int(os.environ.get("BENCH_METAL_STEPS", "600"))
        cases += [
            ("fdtd_broadband_dft", lambda: case_broadband_dft(n, steps)),
            ("fdtd_dispersive", lambda: case_dispersive(n, steps)),
            ("fdtd_combined", lambda: case_combined(n, steps)),
            ("fdtd_metal", lambda: case_metal(
                int(os.environ.get("BENCH_METAL_GRID", "232")),
                metal_steps)),
            ("fdtd_metal_384", lambda: case_metal(360, metal_steps)),
            ("fdtd_bloch", lambda: case_bloch(n, steps)),
            ("fdtd_sharded", lambda: case_sharded(n, steps)),
        ]
    for label, fn in cases:
        if label in skip:
            continue
        try:
            fn()
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            print(json.dumps({"metric": label, "error": str(exc)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
