"""Tests for resonance finder, dispersion fitters, material library, microwave."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.material_library import material_library
from tidy3d_tpu.plugins.dispersion import DispersionFitter, FastDispersionFitter
from tidy3d_tpu.plugins.resonance import ResonanceFinder


def test_resonance_finder_synthetic():
    dt = 1e-16
    t = np.arange(5000) * dt
    f1, d1 = 2.0e14, 2e11
    f2, d2 = 2.5e14, 8e11
    sig = (np.cos(2 * np.pi * f1 * t) * np.exp(-d1 * t)
           + 0.4 * np.cos(2 * np.pi * f2 * t + 0.7) * np.exp(-d2 * t))
    out = ResonanceFinder(freq_window=(1.5e14, 3e14)).run_raw_signal(sig, dt)
    freqs = np.asarray(out.coords["freq"])
    decays = out.values[:, 0]
    for f_true, d_true in ((f1, d1), (f2, d2)):
        i = np.argmin(np.abs(freqs - f_true))
        assert abs(freqs[i] - f_true) / f_true < 1e-4
        assert abs(decays[i] - d_true) / d_true < 0.05


def test_fast_dispersion_fitter_silica():
    si = td.Sellmeier(coeffs=((0.6961663, 0.0684043**2),
                              (0.4079426, 0.1162414**2),
                              (0.8974794, 9.896161**2)))
    wvl = np.linspace(0.5, 1.8, 30)
    n, _ = si.nk_model(C_0 / wvl)
    fitter = FastDispersionFitter(wvl_um=wvl, n_data=np.real(n))
    medium, rms = fitter.fit(max_num_poles=4, tolerance_rms=1e-4)
    assert rms < 1e-4
    # causality respected
    for a, _ in medium.poles:
        assert np.real(a) <= 0


def test_fast_fitter_lossy():
    drude = td.Drude(eps_inf=1.0, coeffs=((2.18e15, 6.5e12),))
    wvl = np.linspace(0.6, 1.8, 30)
    n, k = drude.nk_model(C_0 / wvl)
    fitter = FastDispersionFitter(wvl_um=wvl, n_data=np.real(n), k_data=np.real(k))
    medium, rms = fitter.fit(max_num_poles=4, tolerance_rms=1e-2)
    assert rms < 1e-2


def test_material_library():
    assert len(material_library) >= 40
    f1550 = C_0 / 1.55
    checks = [("SiO2", 1.444, 0.01), ("cSi", 3.48, 0.05),
              ("Si3N4", 1.996, 0.02), ("GaAs", 3.374, 0.05)]
    for name, n_expect, tol in checks:
        n, _ = material_library[name].medium.nk_model(f1550)
        assert abs(float(np.real(n)) - n_expect) < tol, name
    # metals are metallic in the near IR
    for metal in ("Au", "Ag", "Al", "Cu"):
        eps = material_library[metal].medium.eps_model(f1550)
        assert np.real(eps) < -10, metal
    # all media serialize
    med = material_library["Au"].medium
    med2 = type(med).model_validate(type(med)._parse_json_string(med._json_string))
    assert med2 == med


def test_dispersion_fitter_basic():
    si = td.Sellmeier(coeffs=((0.6961663, 0.0684043**2),))
    wvl = np.linspace(1.0, 1.8, 12)
    n, _ = si.nk_model(C_0 / wvl)
    fitter = DispersionFitter(wvl_um=wvl, n_data=np.real(n))
    medium, rms = fitter.fit(num_poles=1, num_tries=20)
    assert rms < 0.05
