"""Device (matrix-free Chebyshev filter) mode eigensolver vs the ARPACK path.

The filter path (plugins/mode/tpu_solver.py) must reproduce the sparse
shift-invert solution: same n_eff to ~1e-5 and same mode fields up to an
overall phase. Runs on the CPU jax backend here (forced via the env knob);
the same code is the TPU hot path.
"""

import numpy as np
import pytest

from tidy3d_tpu.components.mode import ModeSpec
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.plugins.mode import compute_modes

WL = 1.55
FREQ0 = C_0 / WL


def strip_eps(nx=72, ny=48, dl=0.025, n_core=3.0, n_clad=1.444,
              w=0.5, h=0.25):
    """Rectangular strip waveguide cross-section on a uniform grid."""
    x_b = (np.arange(nx + 1) - nx / 2) * dl
    y_b = (np.arange(ny + 1) - ny / 2) * dl
    x_c = 0.5 * (x_b[1:] + x_b[:-1])
    y_c = 0.5 * (y_b[1:] + y_b[:-1])

    def eps_at(xs, ys):
        xx, yy = np.meshgrid(xs, ys, indexing="ij")
        core = (np.abs(xx) < w / 2) & (np.abs(yy) < h / 2)
        return np.where(core, n_core**2, n_clad**2).astype(complex)

    # Yee positions: Ex at (x_c, y_b[:-1]); Ey at (x_b[:-1], y_c); Ez at (x_b, y_b)
    eps_xx = eps_at(x_c, y_b[:-1])
    eps_yy = eps_at(x_b[:-1], y_c)
    eps_zz = eps_at(x_b[:-1], y_b[:-1])
    return (eps_xx, eps_yy, eps_zz), (x_b, y_b)


def overlap(a, b):
    num = np.abs(np.vdot(a.ravel(), b.ravel()))
    den = np.linalg.norm(a) * np.linalg.norm(b)
    return num / den


@pytest.mark.parametrize("num_pml", [(0, 0), (8, 8)])
def test_filter_matches_arpack(monkeypatch, num_pml):
    eps, coords = strip_eps()
    spec = ModeSpec(num_modes=3, target_neff=2.2, num_pml=num_pml)

    monkeypatch.setenv("TIDY3D_TPU_MODE_SOLVER", "arpack")
    fields_a, n_a = compute_modes(eps, coords, FREQ0, spec)

    monkeypatch.setenv("TIDY3D_TPU_MODE_SOLVER", "filter")
    fields_f, n_f = compute_modes(eps, coords, FREQ0, spec)

    assert np.allclose(n_f.real, n_a.real, atol=2e-5), (n_f, n_a)
    for mi in range(2):  # the two clearly-guided modes
        for comp in ("Ex", "Ey"):
            ov = overlap(fields_a[comp][..., mi], fields_f[comp][..., mi])
            assert ov > 0.999, (comp, mi, ov)


def test_filter_bend(monkeypatch):
    eps, coords = strip_eps()
    spec = ModeSpec(num_modes=2, target_neff=2.2, bend_radius=8.0, bend_axis=1)

    monkeypatch.setenv("TIDY3D_TPU_MODE_SOLVER", "arpack")
    _, n_a = compute_modes(eps, coords, FREQ0, spec)
    monkeypatch.setenv("TIDY3D_TPU_MODE_SOLVER", "filter")
    _, n_f = compute_modes(eps, coords, FREQ0, spec)
    assert np.allclose(n_f.real, n_a.real, atol=5e-5)


def test_auto_routing_cpu_stays_arpack(monkeypatch):
    """auto on a CPU backend must not pick the filter (ARPACK wins there)."""
    from tidy3d_tpu.plugins.mode.tpu_solver import use_filter_path

    monkeypatch.setenv("TIDY3D_TPU_MODE_SOLVER", "auto")
    assert not use_filter_path(200000, has_offaxis=False)
    monkeypatch.setenv("TIDY3D_TPU_MODE_SOLVER", "filter")
    assert use_filter_path(1000, has_offaxis=False)
    assert not use_filter_path(1000, has_offaxis=True)
