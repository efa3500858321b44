"""Unstructured dataset and GDS export tests."""

import numpy as np
import pytest

import tidy3d_tpu as td


def _tri_dataset():
    xs, ys = np.meshgrid(np.linspace(0, 1, 6), np.linspace(0, 1, 6),
                         indexing="ij")
    pts = np.column_stack([xs.ravel(), ys.ravel()])
    tris = []
    for i in range(5):
        for j in range(5):
            a = i * 6 + j
            b = (i + 1) * 6 + j
            c = a + 1
            d = b + 1
            tris += [[a, b, c], [b, d, c]]
    vals = 2 * pts[:, 0] + 3 * pts[:, 1]
    return td.TriangularGridDataset(
        normal_axis=2, normal_pos=0.0,
        points=td.PointDataArray(pts, coords=dict(
            index=np.arange(len(pts)), axis=np.arange(2))),
        values=td.IndexedDataArray(vals, coords=dict(index=np.arange(len(vals)))),
        cells=td.CellDataArray(np.array(tris), coords=dict(
            cell_index=np.arange(len(tris)), vertex_index=np.arange(3))))


def _tet_dataset():
    g = np.linspace(0, 1, 4)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.column_stack([X.ravel(), Y.ravel(), Z.ravel()])

    def idx(i, j, k):
        return (i * 4 + j) * 4 + k

    tets = []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                v = [idx(i, j, k), idx(i + 1, j, k), idx(i, j + 1, k),
                     idx(i, j, k + 1), idx(i + 1, j + 1, k),
                     idx(i + 1, j, k + 1), idx(i, j + 1, k + 1),
                     idx(i + 1, j + 1, k + 1)]
                tets += [[v[0], v[1], v[4], v[7]], [v[0], v[4], v[2], v[7]],
                         [v[0], v[2], v[6], v[7]], [v[0], v[6], v[3], v[7]],
                         [v[0], v[3], v[5], v[7]], [v[0], v[5], v[1], v[7]]]
    vals = pts[:, 0] + 2 * pts[:, 1] + 4 * pts[:, 2]
    return td.TetrahedralGridDataset(
        points=td.PointDataArray(pts, coords=dict(
            index=np.arange(len(pts)), axis=np.arange(3))),
        values=td.IndexedDataArray(vals, coords=dict(index=np.arange(len(vals)))),
        cells=td.CellDataArray(np.array(tets), coords=dict(
            cell_index=np.arange(len(tets)), vertex_index=np.arange(4))))


def test_triangular_interp_linear_exact():
    tri = _tri_dataset()
    out = tri.interp(x=[0.25, 0.7], y=[0.3, 0.9], z=[0.0])
    expect = (2 * np.array([0.25, 0.7])[:, None]
              + 3 * np.array([0.3, 0.9])[None, :])
    assert np.abs(np.asarray(out.values).squeeze() - expect).max() < 1e-12


def test_tetrahedral_interp_and_slice():
    tet = _tet_dataset()
    out = tet.interp(x=[0.3, 0.6], y=[0.2, 0.8], z=[0.5])
    exp = (np.array([0.3, 0.6])[:, None, None]
           + 2 * np.array([0.2, 0.8])[None, :, None] + 2.0)
    assert np.abs(np.asarray(out.values) - exp).max() < 1e-12
    # slicing produces a triangular dataset that interpolates the same values
    sl = tet.plane_slice(2, 0.5)
    assert isinstance(sl, td.TriangularGridDataset)
    v = float(np.asarray(sl.interp(x=[0.4], y=[0.6], z=[0.5]).values).squeeze())
    assert abs(v - (0.4 + 1.2 + 2.0)) < 1e-12
    # sel with a scalar coordinate slices
    sl2 = tet.sel(z=0.5)
    assert isinstance(sl2, td.TriangularGridDataset)


def test_unstructured_arithmetic():
    tri = _tri_dataset()
    doubled = 2 * tri
    assert np.allclose(np.asarray(doubled.values.values),
                       2 * np.asarray(tri.values.values))
    diff = doubled - tri
    assert np.allclose(np.asarray(diff.values.values),
                       np.asarray(tri.values.values))


def test_gds_roundtrip(tmp_path):
    import struct

    sim = td.Simulation(
        center=(0, 0, 0), size=(4, 4, 1), run_time=1e-14,
        structures=[
            td.Structure(geometry=td.Box(center=(0, 0, 0), size=(1, 0.5, 1)),
                         medium=td.Medium(permittivity=4)),
            td.Structure(geometry=td.Cylinder(center=(1, 1, 0), radius=0.4,
                                              length=1),
                         medium=td.Medium(permittivity=2)),
        ],
        boundary_spec=td.BoundarySpec.all_sides(td.Periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.1))
    fname = str(tmp_path / "out.gds")
    sim.to_gds_file(fname, z=0.0)
    raw = open(fname, "rb").read()
    # HEADER record and at least 2 BOUNDARY records
    assert raw[:4] == struct.pack(">HH", 6, 0x0002)
    assert raw.count(struct.pack(">HH", 4, 0x0800)) >= 2
    # parse first XY record: vertices near the 1 x 0.5 box in nm units
    i = raw.find(struct.pack(">HH", 4, 0x0800))
    pos = i
    verts = None
    while verts is None:
        ln, rt = struct.unpack(">HH", raw[pos:pos + 4])
        if rt == 0x1003:
            n = (ln - 4) // 8
            arr = np.frombuffer(raw[pos + 4:pos + ln], dtype=">i4").reshape(n, 2)
            verts = arr / 1000.0  # nm -> um
        pos += ln
    assert abs(np.abs(verts[:, 0]).max() - 0.5) < 0.02
    assert abs(np.abs(verts[:, 1]).max() - 0.25) < 0.02
