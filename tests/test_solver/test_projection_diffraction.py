"""Far-field projection and diffraction monitor tests."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0

WL = 1.5
FREQ0 = C_0 / WL
PULSE = td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5)


def test_projection_dipole_pattern():
    """2D Ez line dipole: the far-field |Etheta| is isotropic in angle."""
    src = td.PointDipole(center=(0, 0, 0), source_time=PULSE, polarization="Ez")
    n_theta = 7
    mon = td.FieldProjectionAngleMonitor(
        center=(0, 0, 0), size=(3, 3, td.inf), freqs=[FREQ0], name="far",
        theta=np.linspace(np.pi / 2, np.pi / 2, 1),
        phi=np.linspace(0, 2 * np.pi, n_theta, endpoint=False),
        proj_distance=1e6)
    sim = td.Simulation(
        center=(0, 0, 0), size=(4.4, 4.4, 0), run_time=1.4e-13,
        sources=[src], monitors=[mon], shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.05))
    data = td.web.run(sim, verbose=False)
    e_far = np.abs(np.asarray(data["far"].Etheta.values)).squeeze()
    assert e_far.min() > 0
    # isotropic to within discretization error
    assert e_far.max() / e_far.min() < 1.2


def test_diffraction_vacuum_zero_order():
    """Plane wave through vacuum: all power in the (0, 0) order."""
    pw = td.PlaneWave(center=(-1.2, 0, 0), size=(0, td.inf, td.inf),
                      direction="+", source_time=PULSE, pol_angle=np.pi / 2)
    mon = td.DiffractionMonitor(center=(1.2, 0, 0), size=(0, td.inf, td.inf),
                                freqs=[FREQ0], name="diff", normal_dir="+")
    sim = td.Simulation(
        center=(0, 0, 0), size=(4, 3.0, 0), run_time=1.2e-13,
        sources=[pw], monitors=[mon], shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(),
                                      y=td.Boundary.periodic(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.05))
    data = td.web.run(sim, verbose=False)
    dd = data["diff"]
    amps = np.asarray(dd.amps.values)
    orders_y = dd.orders_x if len(dd.orders_x) > 1 else dd.orders_y
    # find the zero order along whichever axis is resolved
    power = np.abs(amps) ** 2
    total = power.sum()
    o_x = list(np.atleast_1d(dd.orders_x))
    o_y = list(np.atleast_1d(dd.orders_y))
    p0 = power[o_x.index(0), o_y.index(0)].sum()
    assert p0 / total > 0.98
    assert abs(total - 1.0) < 0.1


def test_diffraction_grating_orders():
    """Dielectric grating with period 2*wl: propagating orders appear at
    m = -2..2 and energy is conserved below unity."""
    period = 2 * WL
    # one tooth per period (50% duty cycle)
    teeth = [td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(0.5, period / 2, td.inf)),
        medium=td.Medium(permittivity=6.25))]
    pw = td.PlaneWave(center=(-1.5, 0, 0), size=(0, td.inf, td.inf),
                      direction="+", source_time=PULSE, pol_angle=np.pi / 2)
    mon_t = td.DiffractionMonitor(center=(1.5, 0, 0), size=(0, td.inf, td.inf),
                                  freqs=[FREQ0], name="t", normal_dir="+")
    mon_r = td.DiffractionMonitor(center=(-2.0, 0, 0), size=(0, td.inf, td.inf),
                                  freqs=[FREQ0], name="r", normal_dir="-")
    sim = td.Simulation(
        center=(0, 0, 0), size=(5, period, 0), run_time=2e-13,
        sources=[pw], monitors=[mon_t, mon_r], structures=teeth, shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(),
                                      y=td.Boundary.periodic(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.05))
    data = td.web.run(sim, verbose=False)
    p_t = np.abs(np.asarray(data["t"].amps.values)) ** 2
    p_r = np.abs(np.asarray(data["r"].amps.values)) ** 2
    total = p_t.sum() + p_r.sum()
    # energy conservation: all propagating orders sum to ~1
    assert 0.9 < total < 1.05
    # with period 2*wl, orders m = -2..2 propagate: monitor reports 5 orders
    n_orders = max(len(data["t"].orders_x), len(data["t"].orders_y))
    assert n_orders == 5
    # grating actually diffracts: nonzero higher orders
    p_t_flat = p_t.reshape(-1, p_t.shape[-1]).sum(axis=-1).ravel()
    assert np.sort(p_t_flat)[-2] > 1e-3
