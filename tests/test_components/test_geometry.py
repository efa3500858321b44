"""Geometry predicates, SDFs, measures, serialization.

Mirrors the reference's tests/test_components/test_geometry.py strategy:
physics-sanity assertions rather than golden files."""

import numpy as np
import pytest

import tidy3d_tpu as td


GEOMETRIES = [
    td.Box(center=(0, 0, 0), size=(1, 1, 1)),
    td.Sphere(center=(0.1, 0, 0), radius=0.8),
    td.Cylinder(center=(0, 0, 0), radius=0.6, length=1.2, axis=2),
    td.Cylinder(center=(0, 0, 0), radius=0.6, length=1.2, axis=0,
                sidewall_angle=0.2),
    td.PolySlab(vertices=[[-0.5, -0.5], [0.5, -0.4], [0.6, 0.6], [-0.4, 0.5]],
                axis=2, slab_bounds=(-0.4, 0.6)),
]


@pytest.mark.parametrize("geo", GEOMETRIES)
def test_inside_matches_sdf_sign(geo):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.2, 1.2, size=(500, 3))
    inside = geo.inside(pts[:, 0], pts[:, 1], pts[:, 2])
    sdf = geo.sdf(pts[:, 0], pts[:, 1], pts[:, 2])
    # away from the surface the signs must agree
    away = np.abs(sdf) > 1e-3
    assert np.all(inside[away] == (sdf[away] < 0))


@pytest.mark.parametrize("geo", GEOMETRIES)
def test_bounds_contain_inside_points(geo):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.5, 1.5, size=(800, 3))
    inside = geo.inside(pts[:, 0], pts[:, 1], pts[:, 2])
    rmin, rmax = geo.bounds
    for axis in range(3):
        assert np.all(pts[inside, axis] >= rmin[axis] - 1e-9)
        assert np.all(pts[inside, axis] <= rmax[axis] + 1e-9)


@pytest.mark.parametrize("geo", GEOMETRIES)
def test_serialization_roundtrip(geo):
    geo2 = type(geo).model_validate(type(geo)._parse_json_string(geo._json_string))
    assert geo2 == geo


def test_volumes():
    assert np.isclose(td.Box(size=(1, 2, 3)).volume(), 6.0)
    assert np.isclose(td.Sphere(radius=1).volume(), 4 / 3 * np.pi)
    assert np.isclose(td.Cylinder(radius=1, length=2).volume(), 2 * np.pi)
    ps = td.PolySlab(vertices=[[0, 0], [1, 0], [1, 1], [0, 1]], axis=2,
                     slab_bounds=(0, 2))
    assert np.isclose(ps.volume(), 2.0)


def test_clip_operations():
    box = td.Box(size=(2, 2, 2))
    sph = td.Sphere(radius=1)
    diff = box - sph
    assert not diff.inside(0.0, 0.0, 0.0)
    assert diff.inside(0.95, 0.95, 0.95)
    union = box | sph
    assert union.inside(0.0, 0.0, 0.0)
    inter = box & sph
    assert inter.inside(0.0, 0.0, 0.0)
    assert not inter.inside(0.95, 0.95, 0.95)


def test_group_and_add():
    g = td.Box(size=(1, 1, 1)) + td.Sphere(center=(2, 0, 0), radius=0.5)
    assert isinstance(g, td.GeometryGroup)
    assert g.inside(2.0, 0.0, 0.0)
    assert g.inside(0.0, 0.0, 0.0)
    rmin, rmax = g.bounds
    assert rmax[0] >= 2.5


def test_transformed():
    box = td.Box(size=(2, 1, 1))
    rot = box.rotated(np.pi / 2, axis=2)
    # after 90 deg rotation about z, long axis is y
    assert rot.inside(0.0, 0.9, 0.0)
    assert not rot.inside(0.9, 0.0, 0.0)
    scaled = box.scaled(x=2.0)
    assert scaled.inside(1.9, 0.0, 0.0)
    trans = box.translated(x=5.0)
    assert trans.inside(5.0, 0.0, 0.0)


def test_box_surfaces():
    surfaces = td.Box.surfaces(size=(1, 1, 1), center=(0, 0, 0))
    assert len(surfaces) == 6
    for s in surfaces:
        assert tuple(s.size).count(0.0) == 1


def test_polyslab_sidewall():
    # positive sidewall angle: base bigger than top
    ps = td.PolySlab(vertices=[[-1, -1], [1, -1], [1, 1], [-1, 1]], axis=2,
                     slab_bounds=(0, 1), sidewall_angle=np.pi / 6,
                     reference_plane="bottom")
    assert ps.inside(0.99, 0.0, 0.01)
    assert not ps.inside(0.99, 0.0, 0.99)


def test_sphere_cross_section():
    sections = td.Sphere(radius=1.0).intersections_plane(z=0.5)
    assert len(sections) == 1
    r_expected = np.sqrt(1 - 0.25)
    assert np.isclose(sections[0].area, np.pi * r_expected**2, rtol=1e-2)


def test_triangle_mesh_box():
    # a cube as a triangle mesh
    verts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                     dtype=float)
    faces = [
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x faces? (winding loose)
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ]
    mesh = td.TriangleMesh.from_vertices_faces(verts, faces)
    assert mesh.inside(0.5, 0.5, 0.5)
    assert not mesh.inside(1.5, 0.5, 0.5)
    assert np.isclose(mesh.volume(), 1.0, rtol=1e-6)
