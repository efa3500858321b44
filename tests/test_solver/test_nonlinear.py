"""Nonlinear media tests: Kerr self-phase-modulation and two-photon
absorption, validated against analytic CW propagation."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0, EPSILON_0

WL = 1.5
FREQ0 = C_0 / WL
N0 = 2.0
L_SLAB = 2.0
# incident intensity at |E| = 1 V/um inside the index-matched medium
I0 = 0.5 * C_0 * EPSILON_0 * N0


def _run_cw(nonlinear_spec, amp):
    """CW plane wave through an index-matched nonlinear slab; returns the
    steady-state phasor at the output point, normalized by the amplitude."""
    cw = td.ContinuousWave(freq0=FREQ0, fwidth=FREQ0 / 10, amplitude=amp)
    slab = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(L_SLAB, td.inf, td.inf)),
        medium=td.Medium(permittivity=N0**2, nonlinear_spec=nonlinear_spec))
    pw = td.PlaneWave(center=(-2, 0, 0), size=(0, td.inf, td.inf),
                      direction="+", source_time=cw, pol_angle=np.pi / 2)
    mon = td.FieldTimeMonitor(center=(2, 0, 0), size=(0, 0, 0), name="out",
                              start=2.2e-13)
    sim = td.Simulation(
        center=(0, 0, 0), size=(5.5, 0.4, 0), run_time=2.7e-13,
        medium=td.Medium(permittivity=N0**2),
        sources=[pw], monitors=[mon], structures=[slab], shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(),
                                      y=td.Boundary.periodic(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.03))
    data = td.web.run(sim, verbose=False)
    ez = np.asarray(data["out"].Ez.values)[0, 0, 0, :]
    ts = np.asarray(data["out"].Ez.coords["t"])
    c = np.sum(ez * np.cos(2 * np.pi * FREQ0 * ts))
    s = np.sum(ez * np.sin(2 * np.pi * FREQ0 * ts))
    return (c + 1j * s) / amp


def test_kerr_phase_shift():
    """Self-phase modulation: dphi = k0 n2 I L."""
    n2 = 10.0  # um^2/W
    spec = td.NonlinearSpec(models=[td.KerrNonlinearity(n2=n2, n0=N0)],
                            num_iters=10)
    lo = _run_cw(spec, 0.02)
    hi = _run_cw(spec, 1.0)
    dphi = np.angle(hi / lo)
    dphi_theory = 2 * np.pi / WL * n2 * I0 * L_SLAB
    assert abs(dphi / dphi_theory - 1.0) < 0.12
    # weak amplitude change only
    assert abs(abs(hi / lo) - 1.0) < 0.05


def test_two_photon_absorption():
    """TPA: 1/I_out = 1/I_in + beta L -> T = 1/(1 + beta I L)."""
    beta = 56.0  # um/W, beta*I0*L ~ 0.3
    spec = td.NonlinearSpec(models=[td.TwoPhotonAbsorption(beta=beta, n0=N0)],
                            num_iters=10)
    lo = _run_cw(spec, 0.02)
    hi = _run_cw(spec, 1.0)
    t_meas = abs(hi / lo)
    t_theory = 1.0 / np.sqrt(1.0 + beta * I0 * L_SLAB)
    assert abs(t_meas / t_theory - 1.0) < 0.05
    # negligible nonlinear phase from pure absorption
    assert abs(np.angle(hi / lo)) < 0.05


def test_chi3_equals_kerr():
    """NonlinearSusceptibility with the converted chi3 matches Kerr n2."""
    n2 = 10.0
    chi3 = (4.0 / 3.0) * N0**2 * EPSILON_0 * C_0 * n2
    spec_chi3 = td.NonlinearSpec(
        models=[td.NonlinearSusceptibility(chi3=chi3)], num_iters=10)
    spec_kerr = td.NonlinearSpec(models=[td.KerrNonlinearity(n2=n2, n0=N0)],
                                 num_iters=10)
    a = _run_cw(spec_chi3, 1.0)
    b = _run_cw(spec_kerr, 1.0)
    assert abs(a / b - 1.0) < 1e-3
