"""Extended mode-solver coverage, mirroring the breadth of the reference's
tests/test_plugins/mode/test_mode_solver.py (validation, custom media,
2D cross sections, PML on the mode plane, polarization filtering,
colocation, data sanity)."""

import numpy as np
import pydantic
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.plugins.mode import ModeSolver

WAV = 1.55
FREQ0 = C_0 / WAV


def _strip_sim(dl=0.04, eps_core=12.0, size=(4, 4, 0)):
    return td.Simulation(
        center=(0, 0, 0), size=(4, 4, 2), run_time=1e-13,
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.22, td.inf)),
            medium=td.Medium(permittivity=eps_core))],
        sources=[], monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.Periodic()),
        grid_spec=td.GridSpec.uniform(dl=dl))


def _solver(sim=None, **spec_kwargs):
    sim = sim or _strip_sim()
    spec = td.ModeSpec(num_modes=3, **spec_kwargs)
    return ModeSolver(simulation=sim, plane=td.Box(center=(0, 0, 0),
                                                   size=(3, 3, 0)),
                      mode_spec=spec, freqs=[FREQ0])


# --------------------------------------------------------------------- #
# validation
# --------------------------------------------------------------------- #


def test_volumetric_plane_rejected():
    sim = _strip_sim()
    with pytest.raises((pydantic.ValidationError, td.exceptions.ValidationError)):
        ModeSolver(simulation=sim,
                   plane=td.Box(center=(0, 0, 0), size=(3, 3, 1)),
                   mode_spec=td.ModeSpec(num_modes=1), freqs=[FREQ0])


def test_filter_pol_te_fundamental():
    data = _solver(filter_pol="te").data
    # TE-filtered first mode is TE-polarized (Ex dominates Ey on this strip)
    frac = data.pol_fraction
    assert float(frac["te"].isel(mode_index=0).values.ravel()[0]) > 0.7


def test_num_pml_modes_decay_at_edges():
    data_pml = _solver(num_pml=(8, 8)).data
    ex = np.abs(data_pml.Ex.values)[..., 0, 0]  # (Nx, Ny) fundamental
    interior = ex.max()
    edge = max(ex[0, :].max(), ex[-1, :].max(),
               ex[:, 0].max(), ex[:, -1].max())
    assert edge < 1e-2 * interior


# --------------------------------------------------------------------- #
# media handling on the plane
# --------------------------------------------------------------------- #


def test_custom_medium_matches_uniform():
    """A CustomMedium with spatially-uniform values must reproduce the
    uniform-medium n_eff (reference test_mode_solver_custom_medium).
    Custom media are staircased on the mode plane (no SDF averaging for
    data-defined eps), so pin the uniform run to staircasing too."""
    stair = td.SubpixelSpec.staircasing()
    sim_uni = _strip_sim().updated_copy(subpixel=stair)
    n_eff_uniform = _solver(sim=sim_uni).data.n_eff.values.ravel()

    xs = np.linspace(-2, 2, 401)
    ys = np.linspace(-2, 2, 401)
    zs = np.array([0.0])
    eps_arr = td.SpatialDataArray(
        12.0 * np.ones((401, 401, 1)),
        coords={"x": xs, "y": ys, "z": zs})
    custom = td.CustomMedium(permittivity=eps_arr)
    sim = sim_uni.updated_copy(structures=[td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.22, td.inf)),
        medium=custom)])
    n_eff_custom = _solver(sim=sim).data.n_eff.values.ravel()
    np.testing.assert_allclose(n_eff_custom, n_eff_uniform, rtol=2e-3)


def test_lossy_medium_gives_k_eff():
    sim = _strip_sim().updated_copy(structures=[td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.22, td.inf)),
        medium=td.Medium(permittivity=12.0, conductivity=1e-3))])
    data = _solver(sim=sim).data
    k0 = float(data.k_eff.isel(mode_index=0).values.ravel()[0])
    assert k0 > 1e-5  # loss shows up in the imaginary index
    n0 = float(data.n_eff.isel(mode_index=0).values.ravel()[0])
    assert 1.0 < n0 < np.sqrt(12.0)


def test_dispersive_medium_on_plane():
    """PoleResidue media evaluate eps(freq) on the mode plane."""
    mat = td.material_library["cSi"].medium
    sim = _strip_sim().updated_copy(structures=[td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.22, td.inf)),
        medium=mat)])
    data = _solver(sim=sim).data
    n0 = float(data.n_eff.isel(mode_index=0).values.ravel()[0])
    n_si = np.sqrt(mat.eps_model(FREQ0)).real
    assert 1.0 < n0 < n_si


# --------------------------------------------------------------------- #
# 2D simulation cross-sections
# --------------------------------------------------------------------- #


def test_mode_solver_2d_simulation():
    """Mode plane inside a 2D (zero-thickness) simulation: slab waveguide
    analytic check (reference test_mode_solver_2D — the plane stays
    planar, the simulation collapses one in-plane axis to a single cell)."""
    eps = 4.0
    d = 0.3
    sim = td.Simulation(
        center=(0, 0, 0), size=(0, 3, 2), run_time=1e-13,
        structures=[td.Structure(
            geometry=td.Box(center=(0, 0, 0), size=(td.inf, d, td.inf)),
            medium=td.Medium(permittivity=eps))],
        boundary_spec=td.BoundarySpec(
            x=td.Boundary.periodic(), y=td.Boundary.periodic(),
            z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.02))
    ms = ModeSolver(simulation=sim,
                    plane=td.Box(center=(0, 0, 0), size=(0.5, 3, 0)),
                    mode_spec=td.ModeSpec(num_modes=2), freqs=[FREQ0])
    data = ms.data
    n0 = float(data.n_eff.isel(mode_index=0).values.ravel()[0])
    # symmetric slab TE0 dispersion: tan(kappa d/2) = gamma/kappa
    k0 = 2 * np.pi / WAV

    def resid(n):
        kap = k0 * np.sqrt(eps - n**2)
        gam = k0 * np.sqrt(n**2 - 1.0)
        return np.tan(kap * d / 2) - gam / kap

    from scipy.optimize import brentq
    n_exact = brentq(resid, 1.0001, np.sqrt(eps) - 1e-4)
    assert n0 == pytest.approx(n_exact, abs=0.02)


# --------------------------------------------------------------------- #
# data sanity
# --------------------------------------------------------------------- #


def test_modes_are_power_normalized_and_sorted():
    data = _solver().data
    n_effs = data.n_eff.values.ravel()
    assert np.all(np.diff(n_effs) <= 1e-9)  # descending n_eff
    # flux normalization: self-overlap == 1
    amps = data.outer_dot(data)
    diag = np.array([amps.isel(mode_index_0=i, mode_index_1=i).values
                     for i in range(3)], dtype=complex).ravel()
    np.testing.assert_allclose(np.abs(diag), 1.0, atol=5e-2)


def test_modes_orthogonal():
    data = _solver().data
    amps = data.outer_dot(data)
    off = complex(amps.isel(mode_index_0=0, mode_index_1=1).values.ravel()[0])
    assert abs(off) < 5e-2


def test_colocation_grids():
    ms = _solver()
    prim = ms.data_raw  # raw Yee positions
    col = ms.data       # colocated to boundaries
    assert prim.Ex.coords["x"].shape != prim.Ey.coords["x"].shape \
        or not np.array_equal(prim.Ex.coords["x"], prim.Ey.coords["x"])
    assert np.array_equal(col.Ex.coords["x"], col.Ey.coords["x"])


def test_reduced_simulation_copy_matches_full():
    ms = _solver()
    red = ms.reduced_simulation_copy
    n_full = ms.data.n_eff.values.ravel()
    n_red = red.data.n_eff.values.ravel()
    # fundamental is insensitive to the crop; higher-order modes live closer
    # to the removed outer region so only agree loosely
    np.testing.assert_allclose(n_red[0], n_full[0], rtol=1e-4)
    np.testing.assert_allclose(n_red, n_full, rtol=5e-3)
    assert len(red.simulation.structures) <= len(ms.simulation.structures)
