"""Multi-device sharded-solver equivalence tests (SURVEY.md §2.2 P1).

Runs the full solver on the 8-device virtual CPU mesh (conftest forces
``--xla_force_host_platform_device_count=8``) and asserts field and
monitor outputs match the single-device run. The domain has 12-layer
CPML on all sides, so shard boundaries cut through psi slab regions on
every tested decomposition — the hard case called out in SURVEY.md §7
(halo must include the psi auxiliary fields; under GSPMD the psi slabs
shard with the bulk and XLA inserts the collective-permutes).
"""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower
from tidy3d_tpu.solver.sharding import ShardingPlan, make_mesh

FREQ0 = C_0 / 1.55


def _build_sim():
    """Dipole + dielectric box + CPML; field, flux and time monitors."""
    dl = 0.05
    n = 32
    return td.Simulation(
        center=(0, 0, 0),
        size=(n * dl,) * 3,
        run_time=6e-14,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        structures=[td.Structure(
            geometry=td.Box(center=(0.2, 0, 0), size=(0.6, 0.5, 0.4)),
            medium=td.Medium(permittivity=4.0))],
        monitors=[
            td.FieldMonitor(center=(0, 0, 0), size=(1.2, 1.2, 0),
                            freqs=[FREQ0], name="field"),
            td.FluxMonitor(center=(0, 0, 0), size=(1.0, 1.0, 1.0),
                           freqs=[FREQ0], name="flux"),
        ],
        boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=12)),
        grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=0.0,
    )


def _run(sim, decomp=None):
    plan = lower(sim)
    sp = None
    if decomp is not None:
        mesh, _ = make_mesh(int(np.prod(decomp)), decomp=decomp)
        sp = ShardingPlan(mesh, plan.shape)
    runner = FDTDRunner(plan, sharding_plan=sp)
    return runner.run()


@pytest.fixture(scope="module")
def reference_run():
    return _run(_build_sim())


@pytest.mark.parametrize("decomp", [(8, 1, 1), (2, 2, 2), (1, 4, 2)])
def test_sharded_matches_single_device(reference_run, decomp):
    out = _run(_build_sim(), decomp=decomp)
    assert set(out) == set(reference_run)
    for idx in reference_run:
        for comp, ref in reference_run[idx].items():
            got = out[idx][comp]
            scale = np.max(np.abs(ref)) or 1.0
            err = np.max(np.abs(got - ref)) / scale
            # f32 accumulation-order noise across decompositions measures
            # up to ~4.5e-6 on DFT accumulators (1200-step running sums
            # reduced in different orders); a real halo/psi bug shows at
            # 1e-3+. 1e-5 keeps the gate deterministic while proving
            # shard-boundary (incl. CPML psi) correctness
            assert err < 1e-5, f"monitor {idx} comp {comp}: rel err {err:.2e}"


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(8, decomp=(3, 1, 1))
