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


def _run(sim, mode, monkeypatch, steps=100):
    monkeypatch.setenv("TIDY3D_TPU_TILE_QUANTA", "1,1,1")
    monkeypatch.setenv("TIDY3D_TPU_KERNEL", mode)
    plan = lower(sim)
    plan.num_steps = min(plan.num_steps, steps)
    plan.tmesh = plan.tmesh[:plan.num_steps]
    runner = FDTDRunner(plan)
    if mode == "pallas_interpret":
        assert runner.pallas is not None
    return runner.run()


def _compare(sim, monkeypatch, tol=1e-5):
    a = _run(sim, "xla", monkeypatch)
    b = _run(sim, "pallas_interpret", monkeypatch)
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
