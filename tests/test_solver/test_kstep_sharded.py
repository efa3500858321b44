"""Sharded k-step kernel equivalence (SURVEY.md §2.2 P1 on the fast path).

The round-1 GSPMD decomposition dropped sharded runs to the XLA kernels
(~6x slower per chip). This path runs the k-step Pallas kernel inside
shard_map with an x-axis decomposition: per-shard padded row spaces,
ring ppermute halo exchange of fields AND CPML psi state per group
(SURVEY.md §7 hard part 2), and SPMD-uniform psi strip calls with
per-shard zeroed tables off the global edges.

Runs in interpret mode on the virtual CPU mesh (conftest forces 8
devices). The equivalence contract: sharded == SINGLE-DEVICE K-STEP
(same k, same Nyquist-strided DFT quadrature) to ~float32 roundoff.
The XLA path is a different time quadrature of the same spectrum
(stride nyq vs k*(nyq//k)); kstep-vs-XLA closeness is covered with a
quadrature-limited tolerance by tests/test_solver/test_kstep.py.
"""

import os

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower
from tidy3d_tpu.solver.sharding import ShardingPlan, make_mesh

FREQ0 = C_0 / 1.55
TOL = 2e-5


def _build_sim(case="pml", dims=(208, 80, 24), run_time=6e-15):
    # totals incl. 8-layer PML (slabs lower to width 16 after staggered
    # extension + quanta padding): x = 208+16 = 224 (4 shards x 7 bx=8
    # blocks: 3+3 strip blocks + interior), y = 80+16 = 96 (by=32, nj=3:
    # psiy strips + interior), z = 24+16 = 40 (psiz lanes 2*32 <= 128).
    # `dims` permutes the roles so y/z-decomposed runs keep >= 224 cells
    # along the decomposed axis (the axis-rotation fast path).
    dl = 0.0625  # exact binary: n*dl/dl round-trips without ceil slop
    nx, ny, nz = dims
    boundary = td.BoundarySpec.all_sides(td.PML(num_layers=8))
    if case == "periodic":
        nx, ny = 192, 96
        boundary = td.BoundarySpec(
            x=td.Boundary(minus=td.Periodic(), plus=td.Periodic()),
            y=td.Boundary(minus=td.Periodic(), plus=td.Periodic()),
            z=td.Boundary(minus=td.PML(num_layers=8),
                          plus=td.PML(num_layers=8)))
    structures = []
    if case == "dielectric":
        structures = [td.Structure(
            geometry=td.Box(center=(0.4, 0, 0), size=(1.2, 0.5, 0.4)),
            medium=td.Medium(permittivity=4.0))]
    if case == "dispersive":
        # ADE pole currents: Q state is part of the ring halo exchange
        structures = [td.Structure(
            geometry=td.Box(center=(0.4, 0, 0), size=(3.0, 2.0, 0.6)),
            medium=td.Lorentz(eps_inf=2.0,
                              coeffs=[(8.0, FREQ0 * 1.8, FREQ0 / 10)]))]
    return td.Simulation(
        center=(0, 0, 0),
        size=(nx * dl, ny * dl, nz * dl),
        run_time=run_time,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        structures=structures,
        monitors=[
            td.FieldMonitor(center=(0, 0, 0), size=(td.inf, td.inf, 0),
                            freqs=[FREQ0], name="field"),
            td.FluxMonitor(center=(0, 0, 0), size=(1.0, 1.0, 1.0),
                           freqs=[FREQ0], name="flux"),
        ],
        boundary_spec=boundary,
        grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=0.0,
    )


def _run(sim, ndev=None, kernel=None, k=None, decomp=None):
    env = {}
    if kernel is not None:
        env["TIDY3D_TPU_KERNEL"] = kernel
    if k is not None:
        env["TIDY3D_TPU_KSTEP"] = str(k)
    old = {key: os.environ.get(key) for key in env}
    os.environ.update(env)
    try:
        plan = lower(sim)
        sp = None
        if ndev is not None:
            decomp = decomp or (ndev, 1, 1)
            mesh, _ = make_mesh(ndev, decomp=decomp)
            sp = ShardingPlan(mesh, plan.shape)
        runner = FDTDRunner(plan, sharding_plan=sp)
        if kernel == "kstep_interpret":
            assert runner.kstep is not None, "kstep kernel not selected"
            if ndev is not None:
                assert runner.kstep.shard is not None
                if k is not None:
                    assert runner.kstep.k == k
            else:
                assert runner.kstep.shard is None
        return runner.run()
    finally:
        for key, v in old.items():
            if v is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = v


@pytest.mark.parametrize("case,k", [("pml", 2), ("pml", 4),
                                    ("dielectric", 4), ("periodic", 4),
                                    ("dispersive", 4)])
def test_sharded_kstep_matches_single_device(case, k):
    sim = _build_sim(case)
    # single-device k-step with the same k as the sharded run ->
    # identical DFT quadrature; only halo-exchange float reassociation
    # separates the two runs
    ref = _run(sim, kernel="kstep_interpret", k=k)
    got = _run(sim, ndev=4, kernel="kstep_interpret", k=k)
    assert set(got) == set(ref)
    for idx in ref:
        # per-monitor scale: symmetry-zero components (e.g. Hz of a
        # z-dipole) have no intrinsic scale of their own
        scale = max(np.max(np.abs(r)) for r in ref[idx].values()) + 1e-30
        for comp, r in ref[idx].items():
            g = got[idx][comp]
            assert g.shape == r.shape, \
                f"monitor {idx} comp {comp}: {g.shape} vs {r.shape}"
            err = np.max(np.abs(g - r)) / scale
            assert err < TOL, f"monitor {idx} comp {comp}: rel err {err:.2e}"


@pytest.mark.parametrize("case,decomp,rot", [
    ("pml", (1, 2, 1), 1), ("pml", (1, 1, 2), 2),
    ("dispersive", (1, 2, 1), 1)])
def test_sharded_kstep_axis_rotation(case, decomp, rot):
    """Single-axis y/z decompositions ride the SAME x-ring fast path via
    a cyclic plan rotation (solver/plan_rotate.py); monitor data comes
    back in original coordinates and matches the unsharded k-step run.

    2-device mesh + the smallest decomposed-axis extent the SPMD-uniform
    strip layout admits (112 interior rows) to bound interpret runtime.
    The non-decomposed axes keep one roomy axis (80+16 rows) for the
    rotated psi-y slabs — a rotated y-extent of 40 cells cannot hold two
    16-wide CPML slabs in distinct block rows (real sims decompose their
    LONG axis, so the rotated cross-section is roomy)."""
    if rot == 1:
        # the dispersive y-case shrinks further (interpret-mode cost)
        dims = (32, 112, 48) if case == "dispersive" else (32, 112, 80)
    else:
        dims = (80, 32, 112)
    sim = _build_sim(case, dims=dims, run_time=4e-15)
    ref = _run(sim, kernel="kstep_interpret", k=4)
    os.environ["TIDY3D_TPU_KERNEL"] = "kstep_interpret"
    os.environ["TIDY3D_TPU_KSTEP"] = "4"
    try:
        plan = lower(sim)
        mesh, _ = make_mesh(2, decomp=decomp)
        runner = FDTDRunner(plan, sharding_plan=ShardingPlan(
            mesh, plan.shape))
        assert runner._plan_rot == rot
        assert runner.kstep is not None and runner.kstep.shard is not None
        got = runner.run()
    finally:
        os.environ.pop("TIDY3D_TPU_KERNEL", None)
        os.environ.pop("TIDY3D_TPU_KSTEP", None)
    assert set(got) == set(ref)
    for idx in ref:
        scale = max(np.max(np.abs(r)) for r in ref[idx].values()) + 1e-30
        for comp, r in ref[idx].items():
            g = got[idx][comp]
            assert g.shape == r.shape, \
                f"monitor {idx} comp {comp}: {g.shape} vs {r.shape}"
            err = np.max(np.abs(g - r)) / scale
            assert err < TOL, f"monitor {idx} comp {comp}: rel err {err:.2e}"


def test_sharded_kstep_gate_rejects_2d_decomp():
    """Mixed 2D decompositions still fall back to the GSPMD XLA path
    (only a single decomposed axis maps onto the x-ring kernel)."""
    sim = _build_sim("pml")
    plan = lower(sim)
    mesh, _ = make_mesh(4, decomp=(2, 2, 1))
    os.environ["TIDY3D_TPU_KERNEL"] = "kstep_interpret"
    try:
        runner = FDTDRunner(plan, sharding_plan=ShardingPlan(
            mesh, plan.shape))
        assert runner.kstep is None
        assert runner._plan_rot == 0
    finally:
        os.environ.pop("TIDY3D_TPU_KERNEL", None)
