"""Equivalence check: k-step kernel (interpret mode) vs the XLA path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TIDY3D_TPU_TILE_QUANTA", "8,8,8")

import jax

if os.environ.get("KCHECK_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def build_sim(case):
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    freq0 = C_0 / 1.55
    dl = 0.05
    n = 32
    structures = []
    bspec = td.BoundarySpec.all_sides(td.PML(num_layers=8))
    src = td.PointDipole(
        center=(0, 0, 0),
        source_time=td.GaussianPulse(freq0=freq0, fwidth=freq0 / 5),
        polarization="Ez")
    if case == "dielectric":
        structures = [td.Structure(
            geometry=td.Box(center=(0.2, 0, 0), size=(0.6, 0.5, 0.4)),
            medium=td.Medium(permittivity=4.0))]
    if case == "periodic":
        bspec = td.BoundarySpec(
            x=td.Boundary.periodic(),
            y=td.Boundary.periodic(),
            z=td.Boundary.pml(num_layers=8),
        )
        src = td.PlaneWave(
            center=(0, 0, -0.3), size=(td.inf, td.inf, 0),
            source_time=td.GaussianPulse(freq0=freq0, fwidth=freq0 / 5),
            direction="+")
    return td.Simulation(
        center=(0, 0, 0), size=(n * dl,) * 3, run_time=3e-14,
        sources=[src], monitors=[], structures=structures,
        boundary_spec=bspec,
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def run_steps(sim, kernel, nsteps):
    os.environ["TIDY3D_TPU_KERNEL"] = kernel
    if kernel.startswith("kstep"):
        os.environ["TIDY3D_TPU_KSTEP"] = os.environ.get("KCHECK_K", "2")
    else:
        os.environ["TIDY3D_TPU_KSTEP"] = "0"
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower

    plan = lower(sim)
    runner = FDTDRunner(plan)
    print(f"  kernel={kernel} kstep="
          f"{None if runner.kstep is None else runner.kstep.k} "
          f"shape={runner.shape} "
          f"cfg={(runner.kstep.bx, runner.kstep.by, runner.kstep.hwx, runner.kstep.hwy) if runner.kstep else None}",
          flush=True)
    runner._pad_time_tables(nsteps)
    consts = jax.device_put(runner.consts)
    state = jax.jit(runner.init_state)()
    state = jax.jit(lambda st: runner._run_chunk(0, nsteps, st, consts))(state)
    if isinstance(state["E"], dict):
        out = {c: np.asarray(state["E"][c]) for c in ("Ex", "Ey", "Ez")}
        out.update({c: np.asarray(state["H"][c]) for c in ("Hx", "Hy", "Hz")})
    else:  # kstep: component-packed arrays
        E, H = np.asarray(state["E"]), np.asarray(state["H"])
        out = {c: E[:, i] for i, c in enumerate(("Ex", "Ey", "Ez"))}
        out.update({c: H[:, i] for i, c in enumerate(("Hx", "Hy", "Hz"))})
    return out, runner


def main():
    for case in ("vacuum", "dielectric", "periodic"):
        print(f"case: {case}", flush=True)
        sim = build_sim(case)
        ref, _ = run_steps(sim, "xla", 40)
        got, runner = run_steps(sim, "kstep" if os.environ.get("KCHECK_TPU") == "1" else "kstep_interpret", 40)
        assert runner.kstep is not None, "kstep not selected"
        worst = 0.0
        gscale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
        for c in ref:
            nan = int(np.sum(~np.isfinite(got[c])))
            err = np.max(np.abs(ref[c] - got[c])) / gscale
            worst = max(worst, err) if np.isfinite(err) else np.inf
            print(f"  {c}: rel err {err:.2e} nans={nan}", flush=True)
        status = "OK" if worst < 1e-5 else "FAIL"
        print(f"  => {status} (worst {worst:.2e})", flush=True)


if __name__ == "__main__":
    main()
