"""Mode solver physics tests (cf. reference tests/test_plugins/test_mode_solver.py:
n_eff ordering/bounds, analytic slab dispersion, mode injection round trip)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.components.mode import ModeSpec
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.plugins.mode import ModeSolver, compute_modes

WL = 1.55
FREQ0 = C_0 / WL


def analytic_slab_te0(n1, n2, d, wl):
    """Analytic TE0 effective index of a symmetric slab."""
    from scipy.optimize import brentq

    k0 = 2 * np.pi / wl

    def disp(neff):
        kap = k0 * np.sqrt(n1**2 - neff**2)
        gam = k0 * np.sqrt(neff**2 - n2**2)
        return np.tan(kap * d / 2) - gam / kap

    lo, hi = n2 + 1e-6, n1 - 1e-6
    grid = np.linspace(lo, hi, 4000)
    vals = np.array([disp(g) for g in grid])
    roots = []
    for i in range(len(grid) - 1):
        if vals[i] * vals[i + 1] < 0 and abs(vals[i]) < 50:
            roots.append(brentq(disp, grid[i], grid[i + 1]))
    return max(roots)


def test_slab_te0_vs_analytic():
    n1, n2, d = 2.0, 1.0, 0.5
    neff_exact = analytic_slab_te0(n1, n2, d, WL)
    dl = 0.02
    x_b = np.arange(-2, 2 + dl / 2, dl)
    y_b = np.array([0.0, 0.3, 0.6])
    ny = len(y_b) - 1
    x_c = 0.5 * (x_b[1:] + x_b[:-1])
    prof = lambda xs: np.where(np.abs(xs) < d / 2, n1**2, n2**2)  # noqa: E731
    eps_xx = np.tile(prof(x_c)[:, None], (1, ny))
    eps_yy = np.tile(prof(x_b[:-1])[:, None], (1, ny))
    eps_zz = np.tile(prof(x_b[:-1])[:, None], (1, ny))
    fields, n_c = compute_modes(
        (eps_xx, eps_yy, eps_zz), (x_b, y_b), FREQ0,
        ModeSpec(num_modes=1, target_neff=n1))
    assert abs(np.real(n_c[0]) - neff_exact) < 3e-3
    # TE mode: Ez (propagation direction) vanishes, Ex = 0 by symmetry
    assert np.abs(fields["Ez"][:, :, 0]).max() < 1e-8
    assert np.abs(fields["Ex"][:, :, 0]).max() < 1e-8


@pytest.fixture
def soi_sim():
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.5, 0.22)),
                      medium=td.Medium(permittivity=3.48**2))
    return td.Simulation(
        center=(0, 0, 0), size=(3, 3, 2), run_time=1e-13,
        structures=[wg], medium=td.Medium(permittivity=1.44**2),
        sources=[td.PointDipole(center=(0, 0, 0.7),
                                source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 10),
                                polarization="Ey")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.auto(min_steps_per_wvl=12),
    )


def test_soi_strip_modes(soi_sim):
    ms = ModeSolver(simulation=soi_sim,
                    plane=td.Box(center=(0, 0, 0), size=(0, 2.0, 1.4)),
                    freqs=[FREQ0], mode_spec=ModeSpec(num_modes=3, target_neff=3.0))
    data = ms.data
    neff = np.real(data.n_complex.values[0])
    # TE0 of the 500x220 strip is between the cladding and core indices,
    # around 2.3-2.5 at this resolution
    assert 2.2 < neff[0] < 2.7
    # modes sorted by decreasing n_eff
    assert np.all(np.diff(neff) <= 1e-9)
    # fields normalized to ~unit power
    from tidy3d_tpu.components.data.monitor_data import _mode_overlaps

    self_dot = _mode_overlaps(data, data, axis=0, conjugate=True)
    diag = np.real(np.asarray(self_dot.values))
    # dims (f, mode_index, ...) -> self overlap of mode 0 ~ 1
    assert abs(np.max(diag) - 1.0) < 0.15


def test_mode_solver_reduced(soi_sim):
    ms = ModeSolver(simulation=soi_sim,
                    plane=td.Box(center=(0, 0, 0), size=(0, 2.0, 1.4)),
                    freqs=[FREQ0], mode_spec=ModeSpec(num_modes=1, target_neff=3.0))
    n_full = ms.data_raw.n_complex.values[0, 0]
    n_red = ms.reduced_simulation_copy.data_raw.n_complex.values[0, 0]
    assert abs(n_full - n_red) < 1e-6


def test_group_index(soi_sim):
    ms = ModeSolver(simulation=soi_sim,
                    plane=td.Box(center=(0, 0, 0), size=(0, 2.0, 1.4)),
                    freqs=[FREQ0],
                    mode_spec=ModeSpec(num_modes=1, target_neff=3.0,
                                       group_index_step=True))
    data = ms.data_raw
    ng = float(data.n_group.values[0, 0])
    neff = float(np.real(data.n_complex.values[0, 0]))
    # group index of guided SOI mode exceeds phase index
    assert ng > neff
    assert ng < 6


def test_to_source_monitor(soi_sim):
    ms = ModeSolver(simulation=soi_sim,
                    plane=td.Box(center=(0, 0, 0), size=(0, 2.0, 1.4)),
                    freqs=[FREQ0], mode_spec=ModeSpec(num_modes=1))
    src = ms.to_source(source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 10))
    assert isinstance(src, td.ModeSource)
    mon = ms.to_monitor(name="m")
    assert isinstance(mon, td.ModeMonitor)


def test_mode_transmission_2d():
    """End-to-end: mode source -> waveguide -> mode monitor, T ~ 1."""
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.4, td.inf)),
                      medium=td.Medium(permittivity=4.0))
    src = td.ModeSource(center=(-1.5, 0, 0), size=(0, 3.0, td.inf), direction="+",
                        source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 8),
                        mode_spec=ModeSpec(num_modes=1, target_neff=2.0))
    mon = td.ModeMonitor(center=(1.2, 0, 0), size=(0, 3.0, td.inf), freqs=[FREQ0],
                         name="T", mode_spec=ModeSpec(num_modes=1, target_neff=2.0))
    sim = td.Simulation(
        center=(0, 0, 0), size=(6, 4.5, 0), run_time=2e-13,
        structures=[wg], sources=[src], monitors=[mon],
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.auto(min_steps_per_wvl=12),
    )
    data = td.web.run(sim, verbose=False)
    amp_fwd = np.abs(data["T"].amps.sel(direction="+").values[0, 0])
    amp_bwd = np.abs(data["T"].amps.sel(direction="-").values[0, 0])
    assert abs(amp_fwd - 1.0) < 0.08
    assert amp_bwd < 0.1


def test_bend_radius_modes():
    """Bend via radial transform: R->inf recovers the straight guide; finite
    R pushes the mode outward and raises n_eff."""
    from tidy3d_tpu.plugins.mode.mode_solver import ModeSolver
    import tidy3d_tpu as td
    from tidy3d_tpu.constants import C_0

    wl = 1.55
    f0 = C_0 / wl
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.5, td.inf)),
                      medium=td.Medium(permittivity=12.25))
    sim = td.Simulation(
        center=(0, 0, 0), size=(4, 4, 0), run_time=1e-13,
        boundary_spec=td.BoundarySpec.all_sides(td.Periodic()),
        structures=[wg], grid_spec=td.GridSpec.uniform(dl=0.02))

    def solve(bend_radius):
        ms = ModeSolver(
            simulation=sim, plane=td.Box(center=(0, 0, 0), size=(0, 4, td.inf)),
            mode_spec=td.ModeSpec(num_modes=1, target_neff=3.4,
                                  bend_radius=bend_radius,
                                  bend_axis=1 if bend_radius else None),
            freqs=[f0], colocate=False)
        d = ms.data_raw
        ne = complex(np.asarray(d.n_complex.values)[0, 0])
        ez = np.asarray(d.Ez.isel(f=0, mode_index=0).values).squeeze()
        ys = np.asarray(d.Ez.coords["y"])
        cen = np.sum(ys * np.abs(ez) ** 2) / np.sum(np.abs(ez) ** 2)
        return ne, cen

    n_straight, _ = solve(None)
    n_huge, _ = solve(1e6)
    n_bend, cen_bend = solve(5.0)
    assert abs(n_huge.real - n_straight.real) < 1e-4
    assert n_bend.real > n_straight.real + 1e-3
    assert cen_bend > 0.01  # pushed outward (toward larger radius)
