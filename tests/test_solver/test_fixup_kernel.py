"""Slab-fixup pallas pass (in-kernel x-axis CPML for the fused stepper):
equivalence vs the XLA path with default (8-aligned) tile quanta."""

import numpy as np

import tidy3d_tpu as td
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower

from tests.utils import FREQ0, FWIDTH

GP = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)
STRUCT = td.Structure(
    geometry=td.Box(center=(0.3, 0, 0), size=(1.0, 1.0, 0.6)),
    medium=td.Medium(permittivity=4.0))


def _run(sim, mode, monkeypatch, steps=100):
    monkeypatch.delenv("TIDY3D_TPU_TILE_QUANTA", raising=False)
    monkeypatch.setenv("TIDY3D_TPU_KERNEL", mode)
    # these tests assert path equivalence down to noise level (the pulse
    # tail), which alignment padding legitimately perturbs by reorganizing
    # slab arithmetic; the padded path is physics-tested in test_kstep
    monkeypatch.setenv("TIDY3D_TPU_PAD_ALIGN", "0")
    plan = lower(sim)
    plan.num_steps = min(plan.num_steps, steps)
    plan.tmesh = plan.tmesh[:plan.num_steps]
    runner = FDTDRunner(plan)
    if mode.startswith("fused"):
        assert runner.fused is not None and runner.fused.fixup_ok
    return runner.run()


def _compare(sim, monkeypatch, tol=1e-5):
    a = _run(sim, "xla", monkeypatch)
    b = _run(sim, "fused_interpret", monkeypatch)
    for mi in a:
        for comp in a[mi]:
            scale = max(np.max(np.abs(a[mi][comp])), 1e-30)
            np.testing.assert_allclose(a[mi][comp], b[mi][comp],
                                       atol=tol * scale, rtol=0)


def test_fixup_dipole_dielectric(monkeypatch):
    sim = td.Simulation(
        center=(0, 0, 0), size=(2.4, 2.0, 2.0), run_time=1e-14,
        sources=[td.PointDipole(center=(0.2, 0.1, 0), source_time=GP,
                                polarization="Ez")],
        monitors=[td.FieldMonitor(center=(0.4, 0, 0), size=(0, td.inf,
                                                            td.inf),
                                  freqs=[FREQ0], name="f")],
        structures=[STRUCT],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    _compare(sim, monkeypatch)


def test_fixup_sheet_through_x_pml(monkeypatch):
    """Sheet source spanning the x-PML: exercises source-delta grazing of
    the packed x-psi strips."""
    sim = td.Simulation(
        center=(0, 0, 0), size=(2.4, 2.4, 2.0), run_time=1e-14,
        sources=[td.PlaneWave(center=(0, -0.8, 0), size=(td.inf, 0, td.inf),
                              source_time=GP, direction="+", pol_angle=0.0)],
        monitors=[td.FieldMonitor(center=(0, 0.6, 0),
                                  size=(td.inf, 0, td.inf),
                                  freqs=[FREQ0], name="f")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    _compare(sim, monkeypatch)
