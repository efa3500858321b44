"""Geometry predicate/metric behaviors across the zoo — behavioral
intent of the reference's geometry tests
(/root/reference/tests/test_components/test_geometry.py: inside/volume/
surface_area/bounds consistency, transforms, plane intersections)."""

import numpy as np
import pytest

import tidy3d_tpu as td

RNG = np.random.default_rng(3)


def _mc_volume(geo, n=20000):
    """Monte-Carlo volume inside the geometry's bounding box."""
    (x0, y0, z0), (x1, y1, z1) = geo.bounds
    pts = RNG.uniform((x0, y0, z0), (x1, y1, z1), size=(n, 3))
    frac = np.mean(geo.inside(pts[:, 0], pts[:, 1], pts[:, 2]))
    return frac * (x1 - x0) * (y1 - y0) * (z1 - z0)


GEOMETRIES = [
    td.Box(center=(0.2, -0.1, 0.3), size=(1.0, 2.0, 0.5)),
    td.Sphere(center=(0, 0.5, 0), radius=0.7),
    td.Cylinder(center=(0, 0, 0), radius=0.6, length=1.2, axis=2),
    td.PolySlab(vertices=[(-1, -1), (1, -1), (1, 1), (-1, 1)],
                slab_bounds=(-0.3, 0.3), axis=2),
]
IDS = ["box", "sphere", "cylinder", "polyslab"]


@pytest.mark.parametrize("geo", GEOMETRIES, ids=IDS)
def test_volume_matches_monte_carlo(geo):
    assert geo.volume() == pytest.approx(_mc_volume(geo), rel=0.06)


@pytest.mark.parametrize("geo", GEOMETRIES, ids=IDS)
def test_inside_consistent_with_bounds(geo):
    (x0, y0, z0), (x1, y1, z1) = geo.bounds
    # points clearly outside the bounding box are never inside
    out = np.array([[x1 + 1, 0, 0], [0, y0 - 1, 0], [0, 0, z1 + 1]])
    assert not np.any(geo.inside(out[:, 0], out[:, 1], out[:, 2]))
    # the geometry center is inside for these convex shapes
    cx, cy, cz = [(a + b) / 2 for a, b in zip(*geo.bounds)]
    assert geo.inside(np.array([cx]), np.array([cy]), np.array([cz]))[0]


def test_box_analytics():
    box = td.Box(center=(0, 0, 0), size=(2.0, 3.0, 4.0))
    assert box.volume() == pytest.approx(24.0)
    assert box.surface_area() == pytest.approx(2 * (6 + 8 + 12))
    assert box.bounds == ((-1, -1.5, -2), (1, 1.5, 2))


def test_sphere_analytics():
    s = td.Sphere(center=(0, 0, 0), radius=0.5)
    assert s.volume() == pytest.approx(4 / 3 * np.pi * 0.125, rel=1e-6)
    assert s.surface_area() == pytest.approx(4 * np.pi * 0.25, rel=1e-6)


def test_cylinder_analytics():
    c = td.Cylinder(center=(0, 0, 0), radius=0.5, length=2.0, axis=1)
    assert c.volume() == pytest.approx(np.pi * 0.25 * 2.0, rel=1e-6)


def test_translated_shifts_bounds():
    box = td.Box(center=(0, 0, 0), size=(1, 1, 1))
    moved = box.translated(x=0.5, y=-0.25, z=0.0)
    (x0, y0, _), (x1, y1, _) = moved.bounds
    assert x0 == pytest.approx(0.0) and x1 == pytest.approx(1.0)
    assert y0 == pytest.approx(-0.75)


def test_rotated_preserves_volume():
    box = td.Box(center=(0, 0, 0), size=(1.0, 2.0, 0.5))
    rot = box.rotated(np.pi / 5, axis=2)
    assert _mc_volume(rot) == pytest.approx(1.0, rel=0.08)


def test_scaled_volume():
    box = td.Box(center=(0, 0, 0), size=(1, 1, 1))
    big = box.scaled(x=2.0, y=3.0, z=1.0)
    assert _mc_volume(big) == pytest.approx(6.0, rel=0.06)


def test_polyslab_sidewall_tapers():
    ps_bot = td.PolySlab(vertices=[(-1, -1), (1, -1), (1, 1), (-1, 1)],
                         slab_bounds=(0.0, 0.5), axis=2,
                         sidewall_angle=np.pi / 6,
                         reference_plane="bottom")
    straight = td.PolySlab(vertices=[(-1, -1), (1, -1), (1, 1), (-1, 1)],
                           slab_bounds=(0.0, 0.5), axis=2)
    # anchored at the bottom, a positive angle tapers inward going up
    assert _mc_volume(ps_bot) < 0.95 * _mc_volume(straight)
    # anchored at the middle: top shrinks, bottom grows
    ps_mid = ps_bot.updated_copy(reference_plane="middle")
    assert ps_mid.inside(np.array([0.95]), np.zeros(1),
                         np.array([0.01]))[0]
    assert not ps_mid.inside(np.array([0.95]), np.zeros(1),
                             np.array([0.49]))[0]


def test_polyslab_slab_bounds_validator():
    with pytest.raises(Exception):
        td.PolySlab(vertices=[(-1, -1), (1, -1), (0, 1)],
                    slab_bounds=(0.5, -0.5), axis=2)


def test_zero_dims():
    assert td.Box(center=(0, 0, 0), size=(1, 0, 1)).zero_dims == [1]
    assert td.Box(center=(0, 0, 0), size=(1, 1, 1)).zero_dims == []


def test_intersections_plane_shapes():
    s = td.Sphere(center=(0, 0, 0), radius=1.0)
    shapes = s.intersections_plane(z=0.0)
    assert len(shapes) == 1
    assert shapes[0].area == pytest.approx(np.pi, rel=1e-2)
    assert s.intersections_plane(z=2.0) == []


def test_intersects_pairs():
    a = td.Box(center=(0, 0, 0), size=(1, 1, 1))
    b = td.Box(center=(0.75, 0, 0), size=(1, 1, 1))
    c = td.Box(center=(3, 0, 0), size=(1, 1, 1))
    assert a.intersects(b)
    assert not a.intersects(c)


def test_geometry_group_union():
    a = td.Box(center=(-0.5, 0, 0), size=(1, 1, 1))
    b = td.Box(center=(0.5, 0, 0), size=(1, 1, 1))
    grp = td.GeometryGroup(geometries=[a, b])
    assert _mc_volume(grp) == pytest.approx(2.0, rel=0.06)
    (x0, _, _), (x1, _, _) = grp.bounds
    assert (x0, x1) == pytest.approx((-1.0, 1.0))


def test_clip_operation_difference():
    outer = td.Box(center=(0, 0, 0), size=(2, 2, 2))
    inner = td.Sphere(center=(0, 0, 0), radius=0.5)
    clip = td.ClipOperation(operation="difference", geometry_a=outer,
                            geometry_b=inner)
    expected = 8.0 - 4 / 3 * np.pi * 0.125
    assert _mc_volume(clip) == pytest.approx(expected, rel=0.06)
    # center is hollowed out
    assert not clip.inside(np.zeros(1), np.zeros(1), np.zeros(1))[0]
