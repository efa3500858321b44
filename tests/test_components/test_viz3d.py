"""Interactive 3D viewer: tessellation correctness + scene/HTML assembly."""

import json
import re

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.components import viz3d
from tidy3d_tpu.constants import C_0

FREQ0 = C_0 / 1.55
CLIP = ([-10, -10, -10], [10, 10, 10])


def _mesh_volume(tris):
    """Signed volume via the divergence theorem (exact for closed meshes)."""
    tris = np.asarray(tris, float)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    return float(np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0)


def test_box_mesh_closed_and_volume():
    geo = td.Box(center=(0.5, -0.2, 0.1), size=(1.0, 2.0, 0.5))
    tris = viz3d.viz_triangles(geo, CLIP)
    assert tris.shape == (12, 3, 3)
    assert _mesh_volume(tris) == pytest.approx(1.0, rel=1e-12)


def test_sphere_mesh_volume_converges():
    geo = td.Sphere(center=(0, 0, 0), radius=0.7)
    tris = viz3d.viz_triangles(geo, CLIP)
    vol = 4 / 3 * np.pi * 0.7**3
    assert _mesh_volume(tris) == pytest.approx(vol, rel=0.05)


def test_cylinder_mesh_volume():
    geo = td.Cylinder(center=(0.2, 0, 0), radius=0.5, length=1.2, axis=1)
    tris = viz3d.viz_triangles(geo, CLIP)
    vol = np.pi * 0.5**2 * 1.2
    # winding may flip with the axis permutation; shading is two-sided
    assert abs(_mesh_volume(tris)) == pytest.approx(vol, rel=0.05)


def test_polyslab_concave_mesh_volume():
    # concave L-shape: ear clipping must handle the reflex vertex
    verts = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    geo = td.PolySlab(vertices=verts, slab_bounds=(-0.25, 0.25), axis=2)
    tris = viz3d.viz_triangles(geo, CLIP)
    assert abs(_mesh_volume(tris)) == pytest.approx(3.0 * 0.5, rel=1e-6)


def test_transformed_mesh_follows_matrix():
    geo = td.Box(center=(0, 0, 0), size=(1, 1, 1)).rotated(0.4, 2)
    tris = viz3d.viz_triangles(geo, CLIP)
    # rotation preserves volume
    assert abs(_mesh_volume(tris)) == pytest.approx(1.0, rel=1e-9)


def test_csg_voxel_fallback_approximates_volume():
    geo = td.Box(center=(0, 0, 0), size=(1, 1, 1)) - td.Sphere(
        center=(0, 0, 0.5), radius=0.4)
    tris = viz3d.viz_triangles(geo, CLIP)
    assert len(tris) > 100
    vol_exact = 1.0 - 0.5 * 4 / 3 * np.pi * 0.4**3
    assert abs(_mesh_volume(tris)) == pytest.approx(vol_exact, rel=0.12)


def _tiny_sim():
    return td.Simulation(
        center=(0, 0, 0), size=(2, 2, 2), run_time=1e-14,
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.5, 0.5)),
            medium=td.Medium(permittivity=4.0), name="core")],
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        monitors=[td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 1),
                                 freqs=[FREQ0], name="flux")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1))


def test_sim_scene_contents():
    scene = viz3d.sim_scene(_tiny_sim())
    kinds = {m["kind"] for m in scene["meshes"]}
    assert kinds == {"structure", "source", "monitor"}
    names = {m["name"] for m in scene["meshes"]}
    assert {"core", "flux"} <= names
    assert np.allclose(scene["bounds"], [[-1, -1, -1], [1, 1, 1]])


def test_html_selfcontained_and_valid(tmp_path):
    sim = _tiny_sim()
    path = str(tmp_path / "sim.html")
    out = sim.plot_3d(path=path)
    assert out == path
    html = open(path).read()
    # no external resources: self-contained document
    assert "http://" not in html and "https://" not in html
    assert "<canvas" in html
    # embedded scene JSON parses back
    m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
    scene = json.loads(m.group(1))
    assert len(scene["meshes"]) == 3
    # format escaping left no stray placeholders
    assert "{scene_json}" not in html and "{{" not in html
