"""Medium physics behaviors: analytic dispersion models, cross-class
equivalences, conversions, and gain validators — the behavioral intent
of the reference's medium tests
(/root/reference/tests/test_components/test_medium.py: eps_model
consistency, pole-residue conversions, nk round trips, gain gating)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0, EPSILON_0
from tests.utils import FREQ0

FREQS = np.array([0.8, 1.0, 1.25]) * FREQ0


# --------------------------------------------------------------------- #
# non-dispersive Medium
# --------------------------------------------------------------------- #

def test_medium_eps_model_analytic():
    med = td.Medium(permittivity=4.0, conductivity=0.1)
    for f in FREQS:
        eps = med.eps_model(f)
        assert eps.real == pytest.approx(4.0)
        # eps'' = sigma / (omega eps0)
        assert eps.imag == pytest.approx(0.1 / (2 * np.pi * f * EPSILON_0),
                                         rel=1e-12)


def test_medium_from_nk_round_trip():
    n, k = 2.5, 0.02
    med = td.Medium.from_nk(n=n, k=k, freq=FREQ0)
    n2, k2 = td.Medium.eps_complex_to_nk(med.eps_model(FREQ0))
    assert n2 == pytest.approx(n, rel=1e-10)
    assert k2 == pytest.approx(k, rel=1e-10)


def test_nk_eps_sigma_round_trip():
    n, k = 1.7, 0.3
    eps, sigma = td.Medium.nk_to_eps_sigma(n, k, FREQ0)
    eps_c = td.Medium.eps_sigma_to_eps_complex(eps, sigma, FREQ0)
    assert eps_c == pytest.approx(td.Medium.nk_to_eps_complex(n, k),
                                  rel=1e-12)


def test_medium_n_cfl():
    assert td.Medium(permittivity=4.0).n_cfl == pytest.approx(2.0)


def test_medium_gain_validators():
    with pytest.raises(Exception):
        td.Medium(permittivity=4.0, conductivity=-0.1)
    med = td.Medium(permittivity=4.0, conductivity=-0.1, allow_gain=True)
    assert med.conductivity == -0.1


def test_eps_diagonal_isotropic():
    med = td.Medium(permittivity=9.0)
    d = med.eps_diagonal(FREQ0)
    assert len(d) == 3 and all(v == d[0] for v in d)


# --------------------------------------------------------------------- #
# PoleResidue
# --------------------------------------------------------------------- #

def _pole_pair():
    a = -0.1 * 2 * np.pi * FREQ0 + 1j * 2 * np.pi * FREQ0 * 1.4
    c = 2 * np.pi * FREQ0 * (0.5 + 0.3j)
    return a, c


def test_pole_residue_eps_model_analytic():
    a, c = _pole_pair()
    med = td.PoleResidue(eps_inf=2.0, poles=[(a, c)])
    for f in FREQS:
        w = 2 * np.pi * f
        expected = 2.0 - c / (1j * w + a) - np.conj(c) / (1j * w + np.conj(a))
        assert med.eps_model(f) == pytest.approx(expected, rel=1e-12)


def test_pole_residue_causality_validator():
    with pytest.raises(Exception):
        td.PoleResidue(eps_inf=2.0, poles=[(0.1 + 1j, 1.0 + 0j)])
    td.PoleResidue(eps_inf=2.0, poles=[(-0.1 + 1j, 1.0 + 0j)])


def test_pole_residue_from_medium_equivalence():
    med = td.Medium(permittivity=3.0, conductivity=0.05)
    pr = td.PoleResidue.from_medium(med)
    for f in FREQS:
        assert pr.eps_model(f) == pytest.approx(med.eps_model(f), rel=1e-10)


def test_pole_residue_to_medium_at_freq():
    # a LOSSY model at FREQ0 (so the converted conductivity is passive)
    pr = td.Lorentz(eps_inf=2.0,
                    coeffs=[(3.0, FREQ0 * 1.5, FREQ0 / 10)]).pole_residue
    med = pr.to_medium(FREQ0)
    assert med.eps_model(FREQ0) == pytest.approx(pr.eps_model(FREQ0),
                                                 rel=1e-10)


def test_pole_residue_to_medium_requires_freq():
    a, c = _pole_pair()
    pr = td.PoleResidue(eps_inf=2.0, poles=[(a, c)])
    with pytest.raises(Exception):
        pr.to_medium()
    # pole-free PoleResidue converts without a frequency
    assert td.PoleResidue(eps_inf=2.5).to_medium().permittivity == 2.5


# --------------------------------------------------------------------- #
# Lorentz / Sellmeier / Drude / Debye: analytic + pole-residue parity
# --------------------------------------------------------------------- #

def test_lorentz_eps_model_analytic():
    de, f0, delta = 3.0, FREQ0 * 1.5, FREQ0 / 10
    med = td.Lorentz(eps_inf=2.0, coeffs=[(de, f0, delta)])
    for f in FREQS:
        w = 2 * np.pi * f
        w0 = 2 * np.pi * f0
        d = 2 * np.pi * delta
        expected = 2.0 + de * w0**2 / (w0**2 - 2j * w * d - w**2)
        assert med.eps_model(f) == pytest.approx(expected, rel=1e-9)


@pytest.mark.parametrize("med", [
    td.Lorentz(eps_inf=2.0, coeffs=[(3.0, FREQ0 * 1.5, FREQ0 / 10)]),
    td.Sellmeier(coeffs=[(1.03961212, 0.00600069867),
                         (0.231792344, 0.0200179144)]),
    td.Drude(eps_inf=1.5, coeffs=[(FREQ0 * 2.0, FREQ0 / 20)]),
    td.Debye(eps_inf=2.0, coeffs=[(1.5, 1.0 / (2 * np.pi * FREQ0))]),
], ids=["lorentz", "sellmeier", "drude", "debye"])
def test_pole_residue_conversion_preserves_eps(med):
    pr = med.pole_residue
    assert isinstance(pr, td.PoleResidue)
    for f in FREQS:
        assert pr.eps_model(f) == pytest.approx(med.eps_model(f),
                                                rel=1e-8, abs=1e-8)


def test_sellmeier_fused_silica_index():
    # standard fused-silica Sellmeier fit: n(1.55 um) ~ 1.444
    fs = td.Sellmeier(coeffs=[(0.6961663, 0.0684043**2),
                              (0.4079426, 0.1162414**2),
                              (0.8974794, 9.896161**2)])
    n, k = fs.nk_model(C_0 / 1.55)
    assert n == pytest.approx(1.444, abs=2e-3)
    assert k == pytest.approx(0.0, abs=1e-12)


def test_drude_low_freq_metallic():
    med = td.Drude(eps_inf=1.0, coeffs=[(FREQ0 * 2.0, FREQ0 / 20)])
    # below the plasma frequency the real part is strongly negative
    assert med.eps_model(FREQ0).real < -1.0


def test_lorentz_from_nk():
    med = td.Lorentz.from_nk(n=2.0, k=0.0, freq=FREQ0)
    n, k = med.nk_model(FREQ0)
    assert n == pytest.approx(2.0, rel=1e-6)


def test_library_gold_is_metallic_in_band():
    from tidy3d_tpu.material_library import material_library

    gold = material_library["Au"]["RakicBrendelBormann1998"]
    eps = gold.eps_model(C_0 / 1.55)
    assert eps.real < -50  # Au at 1550 nm: large negative permittivity
    assert eps.imag > 0


# --------------------------------------------------------------------- #
# anisotropic / custom
# --------------------------------------------------------------------- #

def test_anisotropic_eps_diagonal_and_cfl():
    med = td.AnisotropicMedium(xx=td.Medium(permittivity=2.0),
                               yy=td.Medium(permittivity=3.0),
                               zz=td.Medium(permittivity=4.0))
    d = med.eps_diagonal(FREQ0)
    assert [v.real for v in d] == pytest.approx([2.0, 3.0, 4.0])
    assert med.n_cfl == pytest.approx(np.sqrt(2.0))


def test_custom_medium_interpolation():
    from tidy3d_tpu.components.data.data_array import SpatialDataArray

    x = np.linspace(-1, 1, 5)
    y = np.linspace(-1, 1, 4)
    z = np.array([0.0])
    vals = 2.0 + np.add.outer(np.add.outer(x**2, y * 0), z * 0)
    arr = SpatialDataArray(vals, coords=dict(x=x, y=y, z=z))
    med = td.CustomMedium(permittivity=arr)
    eps = med.eps_dataarray_freq(FREQ0)
    # center value ~ 2.0 + x^2 at x=0
    assert float(np.asarray(np.real(
        eps[0].isel(x=2, y=1, z=0)))) == pytest.approx(2.0, rel=1e-6)


def test_medium2d_requires_plane_use():
    med2d = td.Medium2D(ss=td.Medium(conductivity=1e-4),
                        tt=td.Medium(conductivity=1e-4))
    vol = med2d.volumetric_equivalent(
        axis=2, adjacent_media=(td.Medium(), td.Medium()),
        adjacent_dls=(0.02, 0.02))
    assert vol is not None


def test_pec_medium():
    from tidy3d_tpu.components.medium import PECMedium

    assert isinstance(td.PEC, PECMedium)
