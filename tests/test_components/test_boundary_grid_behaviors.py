"""Boundary-condition and grid-spec behaviors — behavioral intent of the
reference's boundary/grid tests
(/root/reference/tests/test_components/test_boundaries.py and
test_grid_spec.py: Bloch phase/from_source consistency, PML layer
counts, auto-grid wavelength scaling, override structures, custom
grids)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tests.utils import FREQ0, FWIDTH

GP = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)


# --------------------------------------------------------------------- #
# Bloch boundaries
# --------------------------------------------------------------------- #

def test_bloch_phase_value():
    b = td.BlochBoundary(bloch_vec=0.25)
    assert b.bloch_phase == pytest.approx(np.exp(1j * np.pi / 2))
    assert td.BlochBoundary(bloch_vec=0.0).bloch_phase == pytest.approx(1.0)


def test_bloch_from_source_matches_angle():
    src = td.PlaneWave(center=(0, 0, -0.5), size=(td.inf, td.inf, 0),
                       source_time=GP, direction="+",
                       angle_theta=0.3, angle_phi=0.0)
    L = 2.0
    b = td.BlochBoundary.from_source(source=src, domain_size=L, axis=0)
    # bloch_vec = kx * L / (2 pi) with kx = k0 sin(theta) cos(phi)
    k0 = 2 * np.pi * FREQ0 / C_0
    expected = k0 * np.sin(0.3) * L / (2 * np.pi)
    assert b.bloch_vec == pytest.approx(expected, rel=1e-6)


def test_bloch_from_source_normal_incidence_zero():
    src = td.PlaneWave(center=(0, 0, -0.5), size=(td.inf, td.inf, 0),
                       source_time=GP, direction="+")
    b = td.BlochBoundary.from_source(source=src, domain_size=2.0, axis=1)
    assert b.bloch_vec == 0.0


# --------------------------------------------------------------------- #
# absorbing boundaries
# --------------------------------------------------------------------- #

def test_pml_layer_counts():
    assert td.PML().num_layers == 12
    assert td.PML(num_layers=20).num_layers == 20
    assert td.StablePML().num_layers >= td.PML().num_layers
    assert td.Absorber().num_layers >= 1


def test_boundary_spec_all_sides():
    spec = td.BoundarySpec.all_sides(td.PML())
    for minus, plus in spec.to_list:
        assert isinstance(minus, td.PML) and isinstance(plus, td.PML)


def test_boundary_factory_methods():
    b = td.Boundary.pml(num_layers=6)
    assert b.minus.num_layers == 6 and b.plus.num_layers == 6
    per = td.Boundary.periodic()
    assert isinstance(per.minus, td.Periodic)
    bb = td.Boundary.bloch(bloch_vec=0.4)
    assert bb.minus.bloch_vec == 0.4 and bb.plus.bloch_vec == 0.4


def test_pec_pmc_boundaries():
    spec = td.BoundarySpec(
        x=td.Boundary(minus=td.PECBoundary(), plus=td.PECBoundary()),
        y=td.Boundary(minus=td.PMCBoundary(), plus=td.PMCBoundary()),
        z=td.Boundary.pml())
    (xm, _), (ym, _), _ = spec.to_list
    assert isinstance(xm, td.PECBoundary)
    assert isinstance(ym, td.PMCBoundary)


# --------------------------------------------------------------------- #
# grid specs
# --------------------------------------------------------------------- #

def _sim(grid_spec, structures=(), size=2.0):
    return td.Simulation(
        center=(0, 0, 0), size=(size, size, size), run_time=1e-13,
        sources=[td.PointDipole(center=(0, 0, 0), source_time=GP,
                                polarization="Ez")],
        structures=list(structures),
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=grid_spec)


def test_uniform_grid_cell_size():
    sim = _sim(td.GridSpec.uniform(dl=0.1))
    for sizes in sim.grid.sizes.to_list:
        np.testing.assert_allclose(np.asarray(sizes), 0.1, rtol=1e-8)


def test_auto_grid_refines_in_high_index():
    hi = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(1, 1, 1)),
                      medium=td.Medium(permittivity=16.0))
    sim_vac = _sim(td.GridSpec.auto(min_steps_per_wvl=10))
    sim_hi = _sim(td.GridSpec.auto(min_steps_per_wvl=10), structures=[hi])
    # n=4 inside the box demands ~4x finer steps there
    dx_vac = np.min(np.asarray(sim_vac.grid.sizes.to_list[0]))
    dx_hi = np.min(np.asarray(sim_hi.grid.sizes.to_list[0]))
    assert dx_hi < dx_vac / 2.5


def test_auto_grid_steps_per_wavelength():
    sim = _sim(td.GridSpec.auto(min_steps_per_wvl=15))
    wvl = C_0 / FREQ0
    dl_max = np.max(np.asarray(sim.grid.sizes.to_list[0]))
    assert dl_max <= wvl / 15 * 1.0001


def test_auto_grid_override_structures():
    fake = td.Structure(geometry=td.Box(center=(0, 0, 0),
                                        size=(0.5, 0.5, 0.5)),
                        medium=td.Medium(permittivity=25.0))
    gs = td.GridSpec.auto(min_steps_per_wvl=10,
                          override_structures=[fake])
    sim = _sim(gs)
    sim_plain = _sim(td.GridSpec.auto(min_steps_per_wvl=10))
    assert np.min(np.asarray(sim.grid.sizes.to_list[0])) < \
        np.min(np.asarray(sim_plain.grid.sizes.to_list[0]))


def test_custom_grid_sizes():
    dls = [0.2] * 5 + [0.05] * 8 + [0.2] * 3
    gs = td.GridSpec(grid_x=td.CustomGrid(dl=dls),
                     grid_y=td.UniformGrid(dl=0.1),
                     grid_z=td.UniformGrid(dl=0.1))
    sim = _sim(gs, size=2.0)
    got = np.asarray(sim.grid.sizes.to_list[0])
    # the custom chunk sizes appear in the grid (PML extension aside)
    assert np.isclose(got, 0.05).sum() >= 8
    assert np.isclose(got, 0.2).sum() >= 8


def test_grid_num_cells_consistency():
    sim = _sim(td.GridSpec.uniform(dl=0.1))
    nx, ny, nz = sim.grid.num_cells
    bx = np.asarray(sim.grid.boundaries.to_list[0])
    assert len(bx) == nx + 1
    # centers are midway between boundaries
    cx = np.asarray(sim.grid.centers.to_list[0])
    np.testing.assert_allclose(cx, 0.5 * (bx[1:] + bx[:-1]), rtol=1e-12)
