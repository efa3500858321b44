"""Reference-file serialization compatibility (SURVEY §7 hard part 7).

``tests/sims/simulation_sample.{json,h5}`` are byte-for-byte copies of the
reference's own serialized fixtures (/root/reference/tests/sims/, written by
tidy3d v2.7.5 ``tests/utils.py:400`` SIM_FULL). Loading them exercises the
whole spec layer at the serialization level:

* HDF5 group layout decode incl. DataArrays with omitted default-range
  coords (reference data_array.py:260-269), nested unstructured datasets
  (points/cells/values groups), TriangleMeshDataArray.
* JSON placeholder degradation: custom media -> vacuum with a warning,
  TriangleMesh/mesh_dataset -> data-less mesh (reference medium.py
  ``_warn_if_none``, mesh.py:50-57).
* Schema-version handling (2.7.5 -> 2.7.x passes through without a
  migration warning).
"""

import os

import h5py
import numpy as np
import pytest

import tidy3d_tpu as td

SIMS_DIR = os.path.join(os.path.dirname(__file__), "..", "sims")
JSON_PATH = os.path.join(SIMS_DIR, "simulation_sample.json")
H5_PATH = os.path.join(SIMS_DIR, "simulation_sample.h5")


@pytest.fixture(scope="module")
def sim_h5():
    return td.Simulation.from_hdf5(H5_PATH)


@pytest.fixture(scope="module")
def sim_json():
    return td.Simulation.from_file(JSON_PATH)


def test_h5_loads_and_derives(sim_h5):
    sim = sim_h5
    assert tuple(sim.size) == (8.0, 8.0, 8.0)
    assert len(sim.structures) >= 30
    assert len(sim.sources) >= 9
    assert len(sim.monitors) >= 10
    # derived quantities computable (VERDICT r2 item 3 acceptance)
    assert sim.dt > 0
    g = sim.grid
    assert len(g.boundaries.x) > 100
    assert np.isfinite(sim.tmesh).all()


def test_json_loads_and_derives(sim_json):
    sim = sim_json
    assert tuple(sim.size) == (8.0, 8.0, 8.0)
    assert sim.dt > 0
    assert len(sim.grid.boundaries.y) > 100


def test_h5_unstructured_custom_media_data(sim_h5):
    """Field-by-field spot check against the raw file contents: the
    tetrahedral-grid CustomMedium at structure 22 must carry the exact
    point/cell/value arrays stored in the HDF5 groups."""
    med = sim_h5.structures[22].medium
    assert type(med).__name__ == "CustomMedium"
    perm = med.permittivity
    assert type(perm).__name__ == "TetrahedralGridDataset"
    with h5py.File(H5_PATH, "r") as f:
        grp = f["structures/22/medium/permittivity"]
        pts = np.array(grp["points/__xarray_dataarray_variable__"])
        vals = np.array(grp["values/__xarray_dataarray_variable__"])
        cells = np.array(grp["cells/__xarray_dataarray_variable__"])
    np.testing.assert_allclose(np.asarray(perm.points.values), pts)
    np.testing.assert_allclose(np.asarray(perm.values.values), vals)
    np.testing.assert_array_equal(np.asarray(perm.cells.values), cells)


def test_h5_field_spot_checks(sim_h5):
    """Spot-check scalar fields against the values serialized in the file."""
    sim = sim_h5
    assert sim.run_time == 1e-12
    assert sim.courant == 0.8
    # structure 1: Box of Medium at (-1, 0, 0), size (1, 1, 1)
    s1 = sim.structures[1]
    assert tuple(s1.geometry.center) == (-1.0, 0.0, 0.0)
    assert tuple(s1.geometry.size) == (1.0, 1.0, 1.0)
    # dispersive media survive with their poles intact
    lorentz = [s.medium for s in sim.structures
               if type(s.medium).__name__ == "Lorentz"]
    assert lorentz and lorentz[0].coeffs
    # TFSF source angle
    tfsf = [s for s in sim.sources if type(s).__name__ == "TFSF"]
    assert tfsf and abs(tfsf[0].angle_theta - np.pi / 6) < 1e-12
    # monitor names unique and present
    names = [m.name for m in sim.monitors]
    assert len(set(names)) == len(names)


def test_json_placeholders_degrade_with_warning(sim_json):
    """JSON files carry no DataArray payloads; custom media become vacuum
    (reference ``_warn_if_none``) and TriangleMesh loads data-less."""
    sim = sim_json
    med16 = sim.structures[16].medium  # CustomMedium in the file
    assert type(med16).__name__ == "CustomMedium"
    np.testing.assert_allclose(np.asarray(med16.permittivity.values),
                               np.ones((1, 1, 1)))
    mesh = sim.structures[8].geometry
    assert type(mesh).__name__ == "TriangleMesh"
    assert mesh.triangles is None
    # data-less mesh: unbounded (reference mesh.py:324), empty sections
    assert mesh.intersections_plane(z=0.0) == []
    assert not mesh.inside(0.0, 0.0, 0.0)


def test_h5_triangle_mesh_real_data(sim_h5):
    """The h5 carries the actual surface mesh; geometry ops must work."""
    mesh = sim_h5.structures[8].geometry
    assert type(mesh).__name__ == "TriangleMesh"
    tris = np.asarray(mesh.triangles)
    assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
    b = mesh.bounds
    assert np.isfinite(b).all()
    assert mesh.volume() > 0


def test_no_version_mislabel(caplog):
    """2.7.5-written files share the 2.7.x schema: no migration warning,
    and never the round-1 '-> 0.1.0' mislabel."""
    from tidy3d_tpu.log import log as td_log

    records = []
    orig = td_log.warning

    def capture(msg, *args, **kwargs):
        records.append(str(msg))
        return orig(msg, *args, **kwargs)

    td_log.warning = capture
    try:
        td.Simulation.from_hdf5(H5_PATH)
    finally:
        td_log.warning = orig
    assert not any("0.1.0" in r for r in records)
    assert not any("updating to" in r for r in records)
