"""Mode-plane eps upgrades: full 9-component tensor (FullyAnisotropicMedium
cross-sections route to the 4Nx4N tensorial solver) and SDF polarized
subpixel averaging on the plane (reference applies subpixel server-side:
mode_solver.py:587-653 + SURVEY §2.3 item 7)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.plugins.mode import ModeSolver

WL = 1.55
FREQ0 = C_0 / WL


def _make_sim(medium, dl=0.04, size=2.4, subpixel=True):
    wg = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.5, 0.22)),
        medium=medium)
    return td.Simulation(
        center=(0, 0, 0), size=(1.0, size, size), run_time=1e-12,
        structures=[wg], subpixel=subpixel,
        sources=[td.PointDipole(
            center=(0, 0, 0), polarization="Ey",
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5))],
        boundary_spec=td.BoundarySpec.all_sides(td.Periodic()),
        grid_spec=td.GridSpec.uniform(dl=dl), shutoff=0.0)


def _solve(sim, num_modes=1, **spec_kwargs):
    ms = ModeSolver(
        simulation=sim,
        plane=td.Box(center=(0, 0, 0), size=(0, td.inf, td.inf)),
        mode_spec=td.ModeSpec(num_modes=num_modes, **spec_kwargs),
        freqs=[FREQ0])
    return ms.data_raw


def test_fully_anisotropic_diagonal_matches_isotropic():
    """A FullyAnisotropicMedium with an isotropic tensor must reproduce
    the plain-Medium solve (same eps everywhere -> same modes)."""
    n2 = 3.48**2
    # staircase both: anisotropic media are staircased (no smooth SDF
    # blend for tensors), so the isotropic reference must be too
    iso = _solve(_make_sim(td.Medium(permittivity=n2), subpixel=False))
    aniso = _solve(_make_sim(td.FullyAnisotropicMedium(
        permittivity=(np.eye(3) * n2).tolist()), subpixel=False))
    n_iso = complex(iso.n_complex.values[0, 0])
    n_ani = complex(aniso.n_complex.values[0, 0])
    assert abs(n_ani - n_iso) / abs(n_iso) < 1e-3


def test_fully_anisotropic_rotated_tensor_solves():
    """In-plane rotated principal axes: off-diagonal eps is exercised for
    real (the 3-diagonal staircase path could not represent this at all).
    The mode index must land between the principal indices and shift away
    from both pure-axis solves."""
    e1, e2, e3 = 12.0, 6.0, 12.0
    ang = np.pi / 6
    rot = np.array([[1, 0, 0],
                    [0, np.cos(ang), -np.sin(ang)],
                    [0, np.sin(ang), np.cos(ang)]])
    eps_rot = rot @ np.diag([e1, e2, e3]) @ rot.T
    data = _solve(_make_sim(td.FullyAnisotropicMedium(
        permittivity=eps_rot.tolist())))
    n_eff = float(np.real(data.n_complex.values[0, 0]))
    assert 1.0 < n_eff < np.sqrt(max(e1, e2, e3))
    # fields finite and non-degenerate
    ey = np.asarray(data.field_components["Ey"].values)
    assert np.all(np.isfinite(ey)) and np.max(np.abs(ey)) > 0
    # differs from both principal-axis diagonal solves
    for diag in ((e1, e2, e3), (e1, e3, e2)):
        ref = _solve(_make_sim(td.AnisotropicMedium(
            xx=td.Medium(permittivity=diag[0]),
            yy=td.Medium(permittivity=diag[1]),
            zz=td.Medium(permittivity=diag[2]))))
        n_ref = float(np.real(ref.n_complex.values[0, 0]))
        assert abs(n_eff - n_ref) > 1e-4


def test_neff_subpixel_convergence_order():
    """n_eff convergence vs resolution beats the staircase order (~1).

    Richardson estimate on dl, dl/2, dl/4: with polarized subpixel on the
    mode plane the observed order must exceed 1.2 (VERDICT r2 item 5;
    staircased point sampling converges at ~1 with oscillations)."""
    n_effs = []
    dls = [0.08, 0.04, 0.02]
    for dl in dls:
        sim = _make_sim(td.Medium(permittivity=3.48**2), dl=dl)
        data = _solve(sim)
        n_effs.append(float(np.real(data.n_complex.values[0, 0])))
    d1 = abs(n_effs[0] - n_effs[1])
    d2 = abs(n_effs[1] - n_effs[2])
    order = np.log2(d1 / d2)
    assert order > 1.2, f"convergence order {order:.2f} (n_effs={n_effs})"
