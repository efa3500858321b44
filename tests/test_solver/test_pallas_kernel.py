"""Equivalence of the fused Pallas family-update kernels vs the XLA path.

Runs the Pallas kernels in interpreter mode on CPU (the real Mosaic lowering
is exercised on TPU hardware by bench.py); physics parity is asserted against
the XLA region-concat path on mixed boundary conditions, inhomogeneous and
dispersive media. Reference behavior: the engine the reference keeps
server-side (SURVEY.md §2.3 items 1-3)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower

from tests.utils import FREQ0, FWIDTH, make_sim_2d, make_sim_3d

STRUCT = td.Structure(
    geometry=td.Box(center=(0.3, 0, 0), size=(1.0, 1.0, 0.6)),
    medium=td.Medium(permittivity=4.0))
DISP = td.Structure(
    geometry=td.Box(center=(-0.5, 0.2, 0), size=(0.7, 0.7, 0.5)),
    medium=td.Lorentz(eps_inf=2.0, coeffs=[(1.0, 3e14, 1e13)]))
MNT = td.FieldMonitor(center=(0, 0, 0.4), size=(td.inf, td.inf, 0),
                      freqs=[FREQ0], name="f")
TMNT = td.FieldTimeMonitor(center=(0, 0, 0.4), size=(td.inf, td.inf, 0),
                           interval=5, name="t")


def _run(sim, mode, monkeypatch, steps=100, expect=None):
    monkeypatch.setenv("TIDY3D_TPU_TILE_QUANTA", "1,1,1")
    monkeypatch.setenv("TIDY3D_TPU_KERNEL", mode)
    plan = lower(sim)
    plan.num_steps = min(plan.num_steps, steps)
    plan.tmesh = plan.tmesh[:plan.num_steps]
    runner = FDTDRunner(plan)
    if mode != "xla":
        assert runner.pallas is not None or runner.fused is not None
        if mode.startswith("fused"):
            assert runner.fused is not None
    return runner.run()


def _compare(sim, monkeypatch, tol=1e-5, modes=("pallas_interpret",
                                                "pallas2_interpret"),
             expect=None):
    a = _run(sim, "xla", monkeypatch)
    for mode in modes:
        b = _run(sim, mode, monkeypatch, expect=expect)
        for mi in a:
            for comp in a[mi]:
                scale = max(np.max(np.abs(a[mi][comp])), 1e-30)
                np.testing.assert_allclose(a[mi][comp], b[mi][comp],
                                           atol=tol * scale, rtol=0)


def test_pallas_3d_pml_dispersive(monkeypatch):
    sim = make_sim_3d(size=1.6, run_time=1e-14, monitors=[MNT, TMNT],
                      structures=[STRUCT, DISP], min_steps_per_wvl=6)
    _compare(sim, monkeypatch)


def test_pallas_2d_periodic(monkeypatch):
    sim = make_sim_2d(size=4.0, dl=0.2, monitors=[
        td.FieldMonitor(center=(0, 1.0, 0), size=(td.inf, 0, td.inf),
                        freqs=[FREQ0], name="f")])
    _compare(sim, monkeypatch)


def test_pallas_mixed_pec_pmc(monkeypatch):
    sim = td.Simulation(
        center=(0, 0, 0), size=(1.6, 1.6, 1.6), run_time=1e-14,
        sources=[td.PointDipole(
            center=(0, 0.1, 0.1),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH),
            polarization="Ey")],
        monitors=[td.FieldMonitor(center=(0, 0, 0.3),
                                  size=(td.inf, td.inf, 0),
                                  freqs=[FREQ0], name="f")],
        structures=[STRUCT],
        boundary_spec=td.BoundarySpec(
            x=td.Boundary.pml(), y=td.Boundary.pec(), z=td.Boundary.pmc()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    _compare(sim, monkeypatch)


def test_fused_sheet_source_through_pml(monkeypatch):
    """Plane-wave J/M sheets span the transverse PML: exercises the fused
    kernel's delta-propagation of sources into newH and the psi-H slabs."""
    gp = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)
    sim = td.Simulation(
        center=(0, 0, 0), size=(2.4, 2.0, 2.0), run_time=1e-14,
        sources=[td.PlaneWave(center=(-0.8, 0, 0), size=(0, td.inf, td.inf),
                              source_time=gp, direction="+", pol_angle=0.0)],
        monitors=[td.FieldMonitor(center=(0.4, 0, 0), size=(0, td.inf,
                                                            td.inf),
                                  freqs=[FREQ0], name="f")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    _compare(sim, monkeypatch, modes=("fused_interpret", "pallas_interpret"), expect=None)


def test_fused_periodic_x_sheet(monkeypatch):
    gp = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)
    sim = td.Simulation(
        center=(0, 0, 0), size=(2.0, 2.4, 2.0), run_time=1e-14,
        sources=[td.PlaneWave(center=(0, -0.8, 0), size=(td.inf, 0, td.inf),
                              source_time=gp, direction="+", pol_angle=0.0)],
        monitors=[td.FieldMonitor(center=(0, 0.6, 0),
                                  size=(td.inf, 0, td.inf),
                                  freqs=[FREQ0], name="f")],
        boundary_spec=td.BoundarySpec(x=td.Boundary.periodic(),
                                      y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    _compare(sim, monkeypatch, modes=("fused_interpret", "pallas_interpret"), expect=None)


def test_fused_tfsf_box(monkeypatch):
    """TFSF: 24 paired J/M sheets incl. PML-grazing corners."""
    gp = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)
    sim = td.Simulation(
        center=(0, 0, 0), size=(3.0, 3.0, 3.0), run_time=1e-14,
        sources=[td.TFSF(center=(0, 0, 0), size=(1.2, 1.2, 1.2),
                         source_time=gp, direction="+", injection_axis=2,
                         pol_angle=0.0)],
        monitors=[td.FieldMonitor(center=(0, 0, 0), size=(td.inf, td.inf, 0),
                                  freqs=[FREQ0], name="f")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    _compare(sim, monkeypatch, modes=("fused_interpret", "pallas_interpret"), expect=None)
