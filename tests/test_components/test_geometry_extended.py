"""Extended geometry coverage: transforms, boolean semantics, surfaces
factories, plane intersections, meshes.

Mirrors the breadth of the reference's tests/test_components/test_geometry.py
(959 LoC: predicate/transform/boolean/intersection behaviors asserted by
geometric identities, not golden files)."""

import numpy as np
import pytest

import tidy3d_tpu as td

RNG = np.random.default_rng(7)
PTS = RNG.uniform(-1.6, 1.6, size=(1200, 3))
X, Y, Z = PTS[:, 0], PTS[:, 1], PTS[:, 2]


def _inside(geo):
    return np.asarray(geo.inside(X, Y, Z), bool)


# --------------------------------------------------------------------- #
# affine transforms
# --------------------------------------------------------------------- #


def test_translated_moves_inside_set():
    box = td.Box(center=(0, 0, 0), size=(1, 1, 1))
    moved = box.translated(0.3, -0.2, 0.1)
    ref = td.Box(center=(0.3, -0.2, 0.1), size=(1, 1, 1))
    assert np.array_equal(_inside(moved), _inside(ref))
    assert np.allclose(moved.bounds, ref.bounds)


def test_rotated_box_quarter_turn_is_identity_on_square_section():
    box = td.Box(center=(0, 0, 0), size=(1, 1, 0.4))
    rot = box.rotated(np.pi / 2, 2)
    assert np.array_equal(_inside(rot), _inside(box))


def test_rotated_against_manual_rotation_of_points():
    geo = td.Cylinder(center=(0.2, 0, 0), radius=0.5, length=1.0, axis=2)
    ang = 0.7
    rot = geo.rotated(ang, 2)
    # point p is inside rotated(geo) iff R^-1 p is inside geo
    c, s = np.cos(-ang), np.sin(-ang)
    xb, yb = c * X - s * Y, s * X + c * Y
    expect = np.asarray(geo.inside(xb, yb, Z), bool)
    assert np.array_equal(_inside(rot), expect)


def test_scaled_sphere_is_ellipsoid():
    sph = td.Sphere(center=(0, 0, 0), radius=0.5)
    ell = sph.scaled(2.0, 1.0, 0.5)
    expect = (X / 2) ** 2 + Y**2 + (Z / 0.5) ** 2 < 0.25
    got = _inside(ell)
    # allow disagreement only in a thin shell around the surface
    lvl = np.sqrt((X / 2) ** 2 + Y**2 + (Z / 0.5) ** 2) - 0.5
    away = np.abs(lvl) > 5e-3
    assert np.array_equal(got[away], expect[away])


def test_chained_transforms_compose():
    box = td.Box(size=(1, 0.5, 0.5))
    g1 = box.rotated(0.3, 2).translated(0.2, 0.0, 0.0)
    # manual: p inside iff R^-1 (p - t) inside box
    c, s = np.cos(-0.3), np.sin(-0.3)
    xs, ys = X - 0.2, Y
    xb, yb = c * xs - s * ys, s * xs + c * ys
    expect = np.asarray(box.inside(xb, yb, Z), bool)
    assert np.array_equal(_inside(g1), expect)


# --------------------------------------------------------------------- #
# boolean semantics
# --------------------------------------------------------------------- #


def test_boolean_union_intersection_difference_xor():
    a = td.Box(center=(-0.2, 0, 0), size=(1, 1, 1))
    b = td.Sphere(center=(0.3, 0, 0), radius=0.55)
    ia, ib = _inside(a), _inside(b)
    assert np.array_equal(_inside(a | b), ia | ib)
    assert np.array_equal(_inside(a & b), ia & ib)
    assert np.array_equal(_inside(a - b), ia & ~ib)
    assert np.array_equal(_inside(a ^ b), ia ^ ib)


def test_invert_complements():
    a = td.Sphere(radius=0.7)
    assert np.array_equal(_inside(~a), ~_inside(a))


def test_group_inside_is_union():
    a = td.Box(center=(-0.5, 0, 0), size=(0.6, 0.6, 0.6))
    b = td.Box(center=(0.5, 0, 0), size=(0.6, 0.6, 0.6))
    grp = a + b
    assert np.array_equal(_inside(grp), _inside(a) | _inside(b))
    rmin, rmax = grp.bounds
    assert rmin[0] == pytest.approx(-0.8) and rmax[0] == pytest.approx(0.8)


def test_boolean_volume_additivity():
    a = td.Box(center=(-0.4, 0, 0), size=(0.8, 0.8, 0.8))
    b = td.Box(center=(0.4, 0, 0), size=(0.8, 0.8, 0.8))
    union = a | b
    inter = a & b
    va, vb = a.volume(), b.volume()
    assert union.volume(bounds=((-1, -1, -1), (1, 1, 1))) == pytest.approx(
        va + vb - inter.volume(bounds=((-1, -1, -1), (1, 1, 1))), rel=0.05)


# --------------------------------------------------------------------- #
# surfaces factories (reference geometry/base.py Box.surfaces)
# --------------------------------------------------------------------- #


def test_box_surfaces_cover_all_faces():
    faces = td.Box.surfaces(size=(1, 2, 3), center=(0.5, 0, 0))
    assert len(faces) == 6
    # each face is zero-thickness along exactly one axis and lies on the
    # parent box boundary
    parent = td.Box(size=(1, 2, 3), center=(0.5, 0, 0))
    rmin, rmax = parent.bounds
    seen = set()
    for f in faces:
        zd = f.zero_dims
        assert len(zd) == 1
        ax = zd[0]
        lo_or_hi = "-" if f.center[ax] == pytest.approx(rmin[ax]) else "+"
        assert f.center[ax] == pytest.approx(
            rmin[ax] if lo_or_hi == "-" else rmax[ax])
        seen.add((ax, lo_or_hi))
    assert len(seen) == 6


def test_box_surfaces_with_exclusion():
    faces = td.FieldMonitor.surfaces_with_exclusion(
        size=(1, 1, 1), center=(0, 0, 0), exclude_surfaces=["x-"],
        name="m", freqs=[2e14])
    assert len(faces) == 5
    assert all(not f.name.endswith("x-") for f in faces)


def test_surfaces_of_infinite_box_skips_inf_faces():
    """Reference geometry/base.py:1894: faces normal to an infinite axis
    are 'infinitely far away' and skipped."""
    faces = td.Box.surfaces(size=(td.inf, 1, 1), center=(0, 0, 0))
    assert len(faces) == 4
    assert all(0 not in f.zero_dims for f in faces)


# --------------------------------------------------------------------- #
# plane intersections
# --------------------------------------------------------------------- #


def test_intersections_plane_box_polygon_area():
    box = td.Box(center=(0, 0, 0), size=(1, 2, 1))
    polys = box.intersections_plane(z=0.2)
    assert len(polys) == 1
    assert polys[0].area == pytest.approx(2.0, rel=1e-6)


def test_intersections_plane_sphere_circle_radius():
    sph = td.Sphere(center=(0, 0, 0.3), radius=0.5)
    polys = sph.intersections_plane(z=0.3)
    verts = np.concatenate([np.asarray(p.exterior) for p in polys])
    r = np.hypot(verts[:, 0], verts[:, 1])
    assert np.allclose(r, 0.5, atol=5e-3)


def test_intersections_plane_missing_plane_is_empty():
    box = td.Box(center=(0, 0, 0), size=(1, 1, 1))
    assert box.intersections_plane(z=2.0) == []
    assert not box.intersects_axis_position(2, 2.0)
    assert box.intersects_plane(z=0.0)


def test_intersects_pairs():
    a = td.Box(center=(0, 0, 0), size=(1, 1, 1))
    assert a.intersects(td.Sphere(center=(0.7, 0, 0), radius=0.3))
    assert not a.intersects(td.Sphere(center=(3, 0, 0), radius=0.3))


# --------------------------------------------------------------------- #
# PolySlab details
# --------------------------------------------------------------------- #


def test_polyslab_sidewall_shrinks_top():
    ps = td.PolySlab(vertices=[[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5],
                               [-0.5, 0.5]],
                     axis=2, slab_bounds=(0, 0.5), sidewall_angle=0.3,
                     reference_plane="bottom")
    # at the base the vertices apply exactly; at the top the boundary has
    # pulled in by h*tan(angle) = 0.155
    assert ps.inside(np.array([0.48]), np.array([0.0]),
                     np.array([0.01]))[0]
    inset = 0.5 * np.tan(0.3)
    assert not ps.inside(np.array([0.5 - inset / 2]), np.array([0.0]),
                         np.array([0.49]))[0]
    assert ps.inside(np.array([0.5 - 1.5 * inset]), np.array([0.0]),
                     np.array([0.49]))[0]


def test_polyslab_dilation():
    base = td.PolySlab(vertices=[[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5],
                                 [-0.5, 0.5]],
                       axis=2, slab_bounds=(0, 1))
    fat = base.updated_copy(dilation=0.1)
    assert fat.volume() > base.volume()
    thin = base.updated_copy(dilation=-0.1)
    assert thin.volume() < base.volume()


def test_polyslab_axis_permutations_consistent():
    verts = [[-0.5, -0.4], [0.5, -0.5], [0.4, 0.5], [-0.5, 0.4]]
    vol = None
    for axis in range(3):
        ps = td.PolySlab(vertices=verts, axis=axis, slab_bounds=(-0.3, 0.4))
        v = ps.volume()
        if vol is None:
            vol = v
        assert v == pytest.approx(vol, rel=1e-6)


# --------------------------------------------------------------------- #
# TriangleMesh
# --------------------------------------------------------------------- #


def _tetra_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return td.TriangleMesh.from_vertices_faces(verts, faces)


def test_trianglemesh_inside_and_bounds():
    mesh = _tetra_mesh()
    rmin, rmax = mesh.bounds
    assert np.allclose(rmin, (0, 0, 0)) and np.allclose(rmax, (1, 1, 1))
    assert mesh.inside(np.array([0.1]), np.array([0.1]), np.array([0.1]))[0]
    assert not mesh.inside(np.array([0.9]), np.array([0.9]),
                           np.array([0.9]))[0]


def test_trianglemesh_volume():
    mesh = _tetra_mesh()
    assert mesh.volume() == pytest.approx(1 / 6, rel=0.05)


def test_trianglemesh_plane_intersection():
    mesh = _tetra_mesh()
    polys = mesh.intersections_plane(z=0.25)
    assert len(polys) >= 1
    verts = np.concatenate([np.asarray(p.exterior) for p in polys])
    # the z=0.25 section of the unit tetra is the triangle
    # x+y <= 0.75, x,y >= 0
    assert verts[:, 0].min() == pytest.approx(0, abs=1e-6)
    assert (verts[:, 0] + verts[:, 1]).max() == pytest.approx(0.75,
                                                              abs=1e-6)


# --------------------------------------------------------------------- #
# zero-dim / validation behaviors
# --------------------------------------------------------------------- #


def test_zero_dims_property():
    assert td.Box(size=(1, 0, 1)).zero_dims == [1]
    assert td.Box(size=(0, 0, 1)).zero_dims == [0, 1]


def test_negative_size_rejected():
    with pytest.raises(Exception):
        td.Box(size=(-1, 1, 1))


def test_sphere_negative_radius_rejected():
    with pytest.raises(Exception):
        td.Sphere(radius=-0.5)


def test_bounding_box_of_group():
    grp = td.Sphere(center=(1, 0, 0), radius=0.2) + td.Box(
        center=(-1, 0, 0), size=(0.2, 0.2, 0.2))
    bb = grp.bounding_box
    assert bb.bounds[0][0] == pytest.approx(-1.1)
    assert bb.bounds[1][0] == pytest.approx(1.2)
