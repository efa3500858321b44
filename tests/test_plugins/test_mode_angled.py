"""Tensorial + angled-propagation mode solver tests (VERDICT item 5:
reference solver.py solver_tensorial:594 and transforms.py:74).

The angled path applies the shear transform (scalar eps -> eps * A A^T)
and solves the 4N x 4N first-order eigenproblem; n_eff is reported along
the tilted propagation direction (beta' cos(theta) / k0).
"""

import numpy as np
import pytest

from tidy3d_tpu.components.mode import ModeSpec
from tidy3d_tpu.plugins.mode.solver import compute_modes

FREQ = 2.998e14 / 1.55


def _slab(n=60, dl=0.04, ny=8, eps_core=6.0):
    xb = np.arange(n + 1) * dl
    yb = np.arange(ny + 1) * dl
    eps = np.ones((n, ny), dtype=complex)
    xc = 0.5 * (xb[1:] + xb[:-1])
    eps[np.abs(xc - xb[n // 2]) < 0.2, :] = eps_core
    return eps, xb, yb


def test_tensorial_matches_diagonal_at_zero_angle():
    eps, xb, yb = _slab()
    ms0 = ModeSpec(num_modes=2, target_neff=2.2, num_pml=(0, 0))
    _, nc0 = compute_modes((eps, eps, eps), (xb, yb), FREQ, ms0)
    ms1 = ModeSpec(num_modes=2, target_neff=2.2, angle_theta=1e-9,
                   num_pml=(0, 0))
    _, nc1 = compute_modes((eps, eps, eps), (xb, yb), FREQ, ms1)
    np.testing.assert_allclose(np.real(nc1), np.real(nc0), rtol=1e-6)


def test_angled_slab_inplane_invariance():
    """A slab guide tilted within its own plane (phi = 90 deg) keeps its
    effective index along the propagation direction (reference behavior:
    tests/test_plugins/test_mode_solver.py:530 straight-vs-angled;
    residual error is the numerical grid)."""
    eps, xb, yb = _slab()
    ms0 = ModeSpec(num_modes=1, target_neff=2.2, num_pml=(0, 0))
    _, nc0 = compute_modes((eps, eps, eps), (xb, yb), FREQ, ms0)
    n0 = float(np.real(nc0)[0])
    for theta in (0.2, 0.4):
        ms = ModeSpec(num_modes=1, target_neff=2.2, angle_theta=theta,
                      angle_phi=np.pi / 2, num_pml=(0, 0))
        _, nc = compute_modes((eps, eps, eps), (xb, yb), FREQ, ms)
        assert abs(float(np.real(nc)[0]) - n0) / n0 < 0.01, (theta, nc, n0)


def test_angled_mode_fields_normalizable():
    eps, xb, yb = _slab(n=40, ny=6)
    ms = ModeSpec(num_modes=1, target_neff=2.2, angle_theta=0.3,
                  num_pml=(0, 0))
    fields, nc = compute_modes((eps, eps, eps), (xb, yb), FREQ, ms)
    assert all(np.all(np.isfinite(fields[c])) for c in fields)
    # tangential fields non-trivial
    assert np.max(np.abs(fields["Ex"])) > 0
    assert np.max(np.abs(fields["Hy"])) > 0
