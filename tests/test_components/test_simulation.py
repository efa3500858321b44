"""Simulation construction, derived quantities, validators, IO."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tests.utils import FREQ0, FWIDTH, make_sim_2d, make_sim_3d
from tidy3d_tpu.constants import C_0


def test_grid_and_dt():
    sim = make_sim_3d()
    nx, ny, nz = sim.grid.num_cells
    assert nx > 10 and ny > 10 and nz > 10
    # dt below the CFL limit
    dl_min = min(np.min(np.asarray(s)) for s in sim.grid.sizes.to_list)
    dt_max = dl_min / np.sqrt(3) / C_0
    assert sim.dt <= dt_max
    assert sim.num_time_steps == len(sim.tmesh)


def test_monitor_names_unique():
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[FREQ0], name="m")
    with pytest.raises(Exception):
        make_sim_2d(monitors=[mon, mon])


def test_source_outside_bounds():
    src = td.PointDipole(center=(100, 0, 0),
                         source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH),
                         polarization="Ez")
    with pytest.raises(Exception):
        make_sim_2d(sources=[src])


def test_zero_dim_requires_periodic():
    with pytest.raises(Exception):
        td.Simulation(
            center=(0, 0, 0), size=(2, 2, 0), run_time=1e-14,
            sources=[td.PointDipole(center=(0, 0, 0),
                                    source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH),
                                    polarization="Ez")],
            boundary_spec=td.BoundarySpec.all_sides(td.PML()),
            grid_spec=td.GridSpec.uniform(dl=0.1),
        )


def test_epsilon_rasterization():
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(0.5, 10, 0.25)),
                      medium=td.Medium(permittivity=12.25))
    sim = make_sim_3d(structures=[wg])
    eps = sim.epsilon(freq=FREQ0)
    assert np.isclose(eps.values.real.max(), 12.25)
    assert np.isclose(eps.values.real.min(), 1.0)
    # value at center is the waveguide
    center_val = eps.interp(x=0.0, y=0.0, z=0.0, method="nearest").values
    assert np.isclose(np.real(center_val), 12.25)


def test_pec_rasterization():
    from tidy3d_tpu.constants import pec_val

    pec_box = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.5, 0.5)),
                           medium=td.PEC)
    sim = make_sim_3d(structures=[pec_box])
    eps = sim.epsilon(freq=FREQ0)
    assert eps.values.real.min() <= pec_val / 2


def test_validate_pre_upload():
    sim = make_sim_2d()
    sim.validate_pre_upload()
    with pytest.raises(Exception):
        make_sim_2d(sources=[]).validate_pre_upload()


def test_nyquist_step():
    sim = make_sim_2d()
    assert sim.nyquist_step([FREQ0]) >= 1


def test_sim_io_roundtrip(tmp_path):
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[FREQ0], name="m")
    sim = make_sim_2d(monitors=[mon])
    for ext in (".json", ".hdf5"):
        fname = str(tmp_path / f"sim{ext}")
        sim.to_file(fname)
        sim2 = td.Simulation.from_file(fname)
        assert sim2 == sim


def test_subsection():
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(0.5, 10, 0.25)),
                      medium=td.Medium(permittivity=12.25))
    sim = make_sim_3d(structures=[wg])
    sub = sim.subsection(td.Box(center=(0, 0, 0), size=(1, 0, 1)))
    assert sub.size[1] == 0.0
    assert len(sub.structures) == 1
    # grid preserved within the region (PML extension outside is re-derived)
    parent_x = np.asarray(sim.grid.boundaries.x)
    sub_x = np.asarray(sub.grid.boundaries.x)
    interior = sub_x[(sub_x >= -0.5) & (sub_x <= 0.5)]
    assert len(interior) >= 2
    assert np.all(np.isin(np.round(interior, 9), np.round(parent_x, 9)))


def test_symmetry_grid():
    sim = make_sim_3d(symmetry=(1, 0, 0))
    bx = np.asarray(sim.grid.boundaries.x)
    assert np.allclose(bx + bx[::-1], 0.0, atol=1e-9)


def test_2d_material():
    sheet = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(1, 1, 0)),
        medium=td.Medium2D(ss=td.Medium(permittivity=2), tt=td.Medium(permittivity=2)),
    )
    sim = make_sim_3d(structures=[sheet])
    vols = sim.volumetric_structures
    assert all(not isinstance(s.medium, td.Medium2D) for s in vols)
