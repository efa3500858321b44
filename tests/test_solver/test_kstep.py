"""Regression tests for the temporal-blocked k-step Pallas kernel.

Runs the kernel in interpret mode on the CPU backend and compares raw
field state and monitor outputs against the XLA reference path on the
same plan — the same equivalence contract as scripts/kstep_check.py but
small enough for CI. Guards the packed-psi layouts, the core-only psi
writes, the ping-pong buffer aliasing, and the Nyquist-strided monitor
DFT (reference stride behavior: tidy3d/components/simulation.py:4414).
"""

import os

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0

FREQ0 = C_0 / 1.55
TOL = 2e-5


def _build(case, monitors=()):
    dl = 0.05
    n = 32
    structures = []
    bspec = td.BoundarySpec.all_sides(td.PML(num_layers=8))
    src = td.PointDipole(
        center=(0, 0, 0),
        source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
        polarization="Ez")
    if case == "dielectric":
        structures = [td.Structure(
            geometry=td.Box(center=(0.2, 0, 0), size=(0.6, 0.5, 0.4)),
            medium=td.Medium(permittivity=4.0))]
    if case == "dispersive":
        # 1-pole Lorentz half-domain: the ADE pole currents advance
        # inside the k-step kernel (packed Q channels, mask-mode B)
        structures = [td.Structure(
            geometry=td.Box(center=(0, 0, 0.4), size=(1.6, 1.6, 0.8)),
            medium=td.Lorentz(eps_inf=2.0,
                              coeffs=[(8.0, FREQ0 * 1.8, FREQ0 / 10)]))]
    if case == "metal7":
        # 7-pole library metal (Au Rakic/Brendel-Bormann fit) half-domain:
        # the round-3 kernel rejected >4 pole slots; all poles must now
        # ride the packed Q channels sharing 3 indicator mask channels
        # (reference contract: material_library gold variants,
        # /root/reference/tidy3d/material_library/material_library.py)
        from tidy3d_tpu.material_library import material_library
        gold = material_library["Au"]["RakicBrendelBormann1998"]
        assert len(gold.poles) >= 5, "library Au fit lost its poles"
        structures = [td.Structure(
            geometry=td.Box(center=(0, 0, 0.4), size=(1.6, 1.6, 0.8)),
            medium=gold)]
    if case == "periodic":
        bspec = td.BoundarySpec(
            x=td.Boundary.periodic(),
            y=td.Boundary.periodic(),
            z=td.Boundary.pml(num_layers=8),
        )
        src = td.PlaneWave(
            center=(0, 0, -0.3), size=(td.inf, td.inf, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            direction="+")
    if case == "bloch":
        # complex dual-copy run: Bloch x/y + PML z (bandstructure shape);
        # a dielectric box makes the copies couple through real physics
        bspec = td.BoundarySpec(
            x=td.Boundary.bloch(bloch_vec=0.31),
            y=td.Boundary.bloch(bloch_vec=-0.17),
            z=td.Boundary.pml(num_layers=8),
        )
        structures = [td.Structure(
            geometry=td.Box(center=(0.2, -0.1, 0), size=(0.7, 0.6, 0.5)),
            medium=td.Medium(permittivity=4.0))]
    return td.Simulation(
        center=(0, 0, 0), size=(n * dl,) * 3,
        run_time=8e-14 if monitors else 2.2e-14,
        sources=[src], monitors=list(monitors), structures=structures,
        boundary_spec=bspec,
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def _run_fields(sim, kernel, nsteps=40, k="2"):
    """Raw E/H state after nsteps on the requested kernel path."""
    import jax

    os.environ["TIDY3D_TPU_KERNEL"] = kernel
    os.environ["TIDY3D_TPU_KSTEP"] = k if kernel.startswith("kstep") else "0"
    try:
        from tidy3d_tpu.solver.fdtd import FDTDRunner
        from tidy3d_tpu.solver.lowering import lower

        plan = lower(sim)
        runner = FDTDRunner(plan)
        if kernel.startswith("kstep"):
            assert runner.kstep is not None, "kstep kernel not selected"
        runner._pad_time_tables(nsteps)
        consts = jax.device_put(runner.consts)
        state = jax.jit(runner.init_state)()
        state = jax.jit(
            lambda st: runner._run_chunk(0, nsteps, st, consts))(state)
        if isinstance(state["E"], dict):
            out = {c: np.asarray(state["E"][c]) for c in ("Ex", "Ey", "Ez")}
            out.update(
                {c: np.asarray(state["H"][c]) for c in ("Hx", "Hy", "Hz")})
            if "E1" in state:  # complex (Bloch) imaginary copy
                out.update({c + "#": np.asarray(state["E1"][c])
                            for c in ("Ex", "Ey", "Ez")})
                out.update({c + "#": np.asarray(state["H1"][c])
                            for c in ("Hx", "Hy", "Hz")})
        else:  # kstep path: component-packed (nx, 3*ncop, ny, nz) arrays
            E, H = np.asarray(state["E"]), np.asarray(state["H"])
            out = {c: E[:, i] for i, c in enumerate(("Ex", "Ey", "Ez"))}
            out.update({c: H[:, i] for i, c in enumerate(("Hx", "Hy", "Hz"))})
            if E.shape[1] == 6:
                out.update({c + "#": E[:, 3 + i]
                            for i, c in enumerate(("Ex", "Ey", "Ez"))})
                out.update({c + "#": H[:, 3 + i]
                            for i, c in enumerate(("Hx", "Hy", "Hz"))})
        return out
    finally:
        os.environ.pop("TIDY3D_TPU_KERNEL", None)
        os.environ.pop("TIDY3D_TPU_KSTEP", None)


@pytest.fixture(autouse=True)
def _tile_quanta(monkeypatch):
    monkeypatch.setenv("TIDY3D_TPU_TILE_QUANTA", "8,8,8")


@pytest.mark.parametrize("case", ["vacuum", "dielectric", "periodic",
                                  "dispersive"])
def test_kstep_matches_xla(case):
    sim = _build(case)
    ref = _run_fields(sim, "xla")
    got = _run_fields(sim, "kstep_interpret")
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        assert np.all(np.isfinite(got[c])), f"{c} has non-finite values"
        err = np.max(np.abs(ref[c] - got[c])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"


@pytest.mark.parametrize("case", ["vacuum", "dispersive"])
def test_kstep_k4_matches_xla(case):
    sim = _build(case)
    ref = _run_fields(sim, "xla")
    got = _run_fields(sim, "kstep_interpret", k="4")
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        err = np.max(np.abs(ref[c] - got[c])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"


@pytest.mark.parametrize("k", ["2", "4"])
def test_kstep_metal7_matches_xla(k):
    """7-pole library Au rides the k-step kernel (round-3 gap: the kernel
    hard-capped at 4 pole slots so every library metal fell to the slow
    paths) and matches the XLA reference path."""
    sim = _build("metal7")
    ref = _run_fields(sim, "xla")
    got = _run_fields(sim, "kstep_interpret", k=k)
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        assert np.all(np.isfinite(got[c])), f"{c} has non-finite values"
        err = np.max(np.abs(ref[c] - got[c])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"


def test_kstep_metal7_mask_channels_shared():
    """All 7 poles of one gold structure share the same indicator masks:
    the packed B table carries at most 3 channels (one per E comp), not
    one per (pole, comp)."""
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.kernels.pallas_kstep import PallasKStepper
    from tidy3d_tpu.solver.lowering import lower

    os.environ["TIDY3D_TPU_KERNEL"] = "kstep_interpret"
    try:
        plan = lower(_build("metal7"))
        assert len(plan.pole_masks) <= 3
        runner = FDTDRunner(plan)
        assert runner.kstep is not None
        assert len(runner.kstep.pole_metas) == 7
        vec_specs, packed = PallasKStepper._poleB_layout(runner)
        assert len(vec_specs) + len(packed) <= 3
    finally:
        os.environ.pop("TIDY3D_TPU_KERNEL", None)


def test_kstep_dispersive_full_residue_maps():
    """Per-cell (non-two-valued) residue maps take the 'full' B packing:
    6 re/im channels per pole instead of 3 indicator channels. The
    lowering currently emits two-valued maps for every medium, so the
    full path is exercised by grading the lowered maps directly (the
    layout a CustomPoleResidue lowering would produce)."""
    import jax

    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.kernels.pallas_kstep import PallasKStepper
    from tidy3d_tpu.solver.lowering import lower

    sim = _build("dispersive")
    plan = lower(sim)
    # grade each residue map along x inside its support (materialize the
    # compressed mask+scalar poles to dense maps, then ramp them)
    nx = plan.shape[0]
    ramp = (1.0 + 0.5 * np.arange(nx) / nx).reshape(-1, 1, 1)
    for pp in plan.poles:
        dense = pp.dense_c_maps(plan.pole_masks, plan.shape)
        pp.c_maps = tuple(m * ramp for m in dense)

    def run(kernel, k="2"):
        os.environ["TIDY3D_TPU_KERNEL"] = kernel
        os.environ["TIDY3D_TPU_KSTEP"] = k if kernel.startswith("kstep") \
            else "0"
        try:
            runner = FDTDRunner(plan)
            if kernel.startswith("kstep"):
                assert runner.kstep is not None
                assert runner.kstep.pole_metas[0]["mode"] == "full"
            runner._pad_time_tables(40)
            consts = jax.device_put(runner.consts)
            state = jax.jit(runner.init_state)()
            state = jax.jit(
                lambda st: runner._run_chunk(0, 40, st, consts))(state)
            if isinstance(state["E"], dict):
                return {c: np.asarray(state["E"][c])
                        for c in ("Ex", "Ey", "Ez")}
            E = np.asarray(state["E"])
            return {c: E[:, i] for i, c in enumerate(("Ex", "Ey", "Ez"))}
        finally:
            os.environ.pop("TIDY3D_TPU_KERNEL", None)
            os.environ.pop("TIDY3D_TPU_KSTEP", None)

    ref = run("xla")
    got = run("kstep_interpret")
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        err = np.max(np.abs(ref[c] - got[c])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"


def test_kstep_monitor_dft_matches_xla():
    """Field + flux monitors through the full runner on both paths.

    Exercises the Nyquist-strided running DFT that the k-step kernel
    relies on (samples only at group-end steps with stride weighting).
    """
    monitors = [
        td.FieldMonitor(center=(0, 0, 0.35), size=(0.8, 0.8, 0),
                        freqs=[FREQ0], name="fld"),
        td.FluxMonitor(center=(0, 0, 0), size=(1.0, 1.0, 1.0),
                       freqs=[FREQ0], name="flux"),
    ]
    sim = _build("vacuum", monitors=monitors)

    def run_full(kernel):
        os.environ["TIDY3D_TPU_KERNEL"] = kernel
        os.environ["TIDY3D_TPU_KSTEP"] = \
            "2" if kernel.startswith("kstep") else "0"
        try:
            from tidy3d_tpu.solver.fdtd import FDTDRunner
            from tidy3d_tpu.solver.lowering import lower

            runner = FDTDRunner(lower(sim))
            if kernel.startswith("kstep"):
                assert runner.kstep is not None
            return runner.run()
        finally:
            os.environ.pop("TIDY3D_TPU_KERNEL", None)
            os.environ.pop("TIDY3D_TPU_KSTEP", None)

    ref = run_full("xla")
    got = run_full("kstep_interpret")
    for mi in range(2):
        scale = max(np.max(np.abs(np.asarray(ref[mi][key])))
                    for key in ref[mi]) + 1e-30
        for key in ref[mi]:
            a = np.asarray(ref[mi][key])
            b = np.asarray(got[mi][key])
            # the strided DFT is a different quadrature of the same
            # spectrum; agreement is limited by the stride approximation
            assert np.max(np.abs(a - b)) / scale < 2e-2, \
                f"monitor {mi} field {key}"


def test_kstep_split_regions_match_xla(monkeypatch):
    """The static grid partition (interior + strips + corners with
    piece-plumbed psi) against the XLA path. The default test grids are
    too small to split (the interior region collapses), so force small
    blocks on a rectangular grid that yields the full 9-region set."""
    monkeypatch.setenv("TIDY3D_TPU_KSTEP_CFG", "8,16,2,8")
    # the forced tiny blocks bypass the config validity checks, which the
    # alignment pad pass would break by widening the hi-side psi slab
    monkeypatch.setenv("TIDY3D_TPU_PAD_ALIGN", "0")
    dl = 0.05
    sim = td.Simulation(
        center=(0, 0, 0), size=(64 * dl, 48 * dl, 16 * dl),
        run_time=2.2e-14,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=8)),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)
    # sanity: the region set actually split
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower
    os.environ["TIDY3D_TPU_KERNEL"] = "kstep_interpret"
    os.environ["TIDY3D_TPU_KSTEP"] = "2"
    try:
        runner = FDTDRunner(lower(sim))
        assert runner.kstep is not None
        assert len(runner.kstep._regions()) >= 7, runner.kstep._regions()
    finally:
        os.environ.pop("TIDY3D_TPU_KERNEL", None)
        os.environ.pop("TIDY3D_TPU_KSTEP", None)
    ref = _run_fields(sim, "xla", nsteps=24)
    got = _run_fields(sim, "kstep_interpret", nsteps=24)
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        assert np.all(np.isfinite(got[c])), f"{c} non-finite"
        err = np.max(np.abs(ref[c] - got[c])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"


def test_kstep_pad_alignment_odd_grid():
    """Odd/PEC grid sizes ride the kernel path via frozen-cell padding
    (PARITY known-gap: they used to fall back to the ~6x-slower XLA path).
    The padded run must equal the unpadded XLA run on the true cells."""
    dl = 0.05
    n = 27  # odd: nz % 8 != 0, nx % 16 != 0
    sim = td.Simulation(
        center=(0, 0, 0), size=(n * dl,) * 3,
        run_time=2.2e-14,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=8)),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)

    ref = _run_fields(sim, "xla")
    got = _run_fields(sim, "kstep_interpret")
    nx, ny, nz = ref["Ex"].shape
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        g = got[c]
        assert g.shape[0] > nx and g.shape[2] > nz  # padded
        # pad cells stay frozen (zero up to interpret-mode roundoff)
        pmax = max(np.abs(g[nx:]).max(), np.abs(g[:, ny:]).max(),
                   np.abs(g[:, :, nz:]).max())
        # frozen up to interpret-mode f32 roundoff (a real leak would be
        # O(scale); the physics equivalence is asserted below at TOL)
        assert pmax < 1e-6 * scale, f"{c}: pad contamination {pmax:.2e}"
        err = np.max(np.abs(ref[c] - g[:nx, :ny, :nz])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"


def test_memory_budget_gate(monkeypatch):
    """An over-budget plan raises a clean SetupError naming the limit
    BEFORE dispatch (round-3 gap: Au 256^3 surfaced as a raw XLA OOM
    traceback from inside run(); reference gates scale client-side,
    simulation.py:3341 validate_pre_upload)."""
    from tidy3d_tpu.exceptions import SetupError
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower

    runner = FDTDRunner(lower(_build("dispersive")))
    est = runner.estimate_device_memory()
    assert est["total"] > 0
    # generous budget passes
    monkeypatch.setenv("TIDY3D_TPU_HBM_BYTES", str(est["total"] * 10))
    runner.check_memory_budget()
    # starved budget raises with the limit in the message
    monkeypatch.setenv("TIDY3D_TPU_HBM_BYTES", str(est["total"] // 2))
    with pytest.raises(SetupError, match="device limit"):
        runner.check_memory_budget()
    # explicit opt-out
    monkeypatch.setenv("TIDY3D_TPU_MEM_CHECK", "0")
    runner.check_memory_budget()


@pytest.mark.parametrize("k", ["2", "4"])
def test_kstep_bloch_matches_xla(k):
    """Bloch (complex dual-copy) runs on the k-step kernel: wrapped halo
    phase rotation at window assembly (x/y) + per-roll z mixing must
    reproduce the XLA dual-copy path (ref Bloch semantics:
    /root/reference/tidy3d/components/boundary.py:55-84)."""
    sim = _build("bloch")
    ref = _run_fields(sim, "xla")
    got = _run_fields(sim, "kstep_interpret", k=k)
    assert set(got) == set(ref)
    assert any(c.endswith("#") for c in got), "complex copy missing"
    scale = max(np.max(np.abs(ref[c])) for c in ref) + 1e-30
    for c in ref:
        assert np.all(np.isfinite(got[c])), f"{c} has non-finite values"
        err = np.max(np.abs(ref[c] - got[c])) / scale
        assert err < TOL, f"{c}: rel err {err:.2e}"
