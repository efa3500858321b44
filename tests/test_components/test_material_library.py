"""Material library depth + published-index spot checks (VERDICT item 8:
>= 90 variants, each with a literature reference, n spot-checked against
published values)."""

import numpy as np

from tidy3d_tpu.constants import C_0
from tidy3d_tpu.material_library import material_library

SPOT_CHECKS = [
    # (material, variant, wavelength_um, published n, tol)
    ("SiO2", "Malitson1965", 0.589, 1.4585, 0.002),
    ("SiO2", "Malitson1965", 1.55, 1.444, 0.002),
    ("cSi", "SalzbergVilla1957", 1.55, 3.4777, 0.005),
    ("Si3N4", "Luke2015", 1.55, 1.9963, 0.005),
    ("Diamond", "Peter1923", 0.589, 2.417, 0.005),
    ("GeO2", "Fleming1984", 1.0, 1.60, 0.01),
    ("BaF2", "Li1980", 0.589, 1.475, 0.005),
    ("Y2O3", "Nigara1968", 0.589, 1.93, 0.01),
    ("AlAs", "FernOnton1971", 1.0, 2.95, 0.01),
    ("MgF2", "Dodge1984", 0.589, 1.378, 0.002),
    ("MgF2", "Dodge1984_extraordinary", 0.589, 1.390, 0.002),
    ("Al2O3", "Malitson1972", 0.589, 1.768, 0.002),
    ("Al2O3", "Malitson1972_extraordinary", 0.589, 1.760, 0.002),
    ("CrystalQuartz", "Ghosh1999_ordinary", 0.589, 1.5442, 0.002),
    ("CrystalQuartz", "Ghosh1999_extraordinary", 0.589, 1.5533, 0.002),
    ("MgO", "StephensMalitson1952", 0.589, 1.737, 0.005),
    ("ZnTe", "Marple1964", 1.0, 2.79, 0.01),
    ("LiNbO3", "Zelmon1997", 1.0, 2.238, 0.01),
    ("LiNbO3", "Zelmon1997_extraordinary", 1.0, 2.159, 0.01),
    ("H2O", "Daimon2007", 0.589, 1.333, 0.002),
    ("BK7", "SCHOTT", 0.5876, 1.5168, 0.001),
    ("CaF2", "Malitson1963", 0.589, 1.4338, 0.002),
]


def test_library_depth():
    n_variants = sum(len(m.variants) for m in material_library.values())
    assert len(material_library) >= 75
    assert n_variants >= 90, n_variants


def test_references_present():
    for mat in material_library.values():
        for vname, variant in mat.variants.items():
            assert variant.reference, f"{mat.name}/{vname} missing reference"


def test_spot_checks_vs_published():
    for name, variant, lam, n_pub, tol in SPOT_CHECKS:
        medium = material_library[name][variant]
        n = float(np.sqrt(np.real(medium.eps_model(C_0 / lam))))
        assert abs(n - n_pub) < max(tol, 0.002), (
            f"{name}/{variant}: n({lam}) = {n:.4f} vs published {n_pub}")


def test_default_variants_resolve():
    for mat in material_library.values():
        med = mat.medium
        eps = med.eps_model(C_0 / 1.0)
        assert np.isfinite(eps)


def test_metal_bb_variants():
    """Brendel-Bormann variants of the workhorse metals (VERDICT r2 item
    10): each fitted PoleResidue is spot-checked against a direct
    evaluation of the published BB model (Rakic 1998, Faddeeva-function
    form) at three wavelengths."""
    from scipy.special import wofz

    from tidy3d_tpu.constants import C_0

    BB = {
        "Au": (9.03, 0.770, 0.050, [(0.054, 0.074, 0.218, 0.742),
                                    (0.050, 0.035, 2.885, 0.349),
                                    (0.312, 0.083, 4.069, 0.830),
                                    (0.719, 0.125, 6.137, 1.246),
                                    (1.648, 0.179, 27.97, 1.795)]),
        "Ag": (9.01, 0.821, 0.049, [(0.050, 0.189, 2.025, 1.894),
                                    (0.133, 0.067, 5.185, 0.665),
                                    (0.051, 0.019, 4.343, 0.189),
                                    (0.467, 0.117, 9.809, 1.170),
                                    (4.000, 0.052, 18.56, 0.516)]),
        "Al": (14.98, 0.526, 0.047, [(0.213, 0.312, 0.163, 0.013),
                                     (0.060, 0.315, 1.561, 0.042),
                                     (0.182, 1.587, 1.827, 0.256),
                                     (0.014, 2.145, 4.495, 1.735)]),
        "Cu": (10.83, 0.562, 0.030, [(0.076, 0.056, 0.416, 0.562),
                                     (0.081, 0.047, 2.849, 0.469),
                                     (0.324, 0.113, 4.819, 1.131),
                                     (0.726, 0.172, 8.136, 1.719)]),
        "W": (13.22, 0.197, 0.057, [(0.006, 3.689, 0.481, 3.754),
                                    (0.022, 0.277, 0.985, 0.059),
                                    (0.136, 1.433, 1.962, 0.273),
                                    (2.648, 4.555, 5.442, 1.912)]),
    }

    def eps_bb(w_ev, wp, f0, g0, osc):
        w = complex(w_ev)
        eps = 1.0 - f0 * wp**2 / (w * (w + 1j * g0))
        for f_j, g_j, w_j, s_j in osc:
            a = np.sqrt(w * (w + 1j * g_j))
            pref = 1j * np.sqrt(np.pi) * f_j * wp**2 \
                / (2 * np.sqrt(2) * a * s_j)
            eps += pref * (wofz((a - w_j) / (np.sqrt(2) * s_j))
                           + wofz((a + w_j) / (np.sqrt(2) * s_j)))
        return eps

    for metal, params in BB.items():
        med = material_library[metal]["RakicBrendelBormann1998"]
        for wl in (0.7, 1.55, 5.0):
            w_ev = 1.2398419843320026 / wl
            nk_bb = np.sqrt(eps_bb(w_ev, *params))
            nk_fit = np.sqrt(med.eps_model(C_0 / wl))
            # n/k within 5% of the published model (Cu/W carry the
            # largest interband fit residue)
            err = abs(nk_fit - nk_bb) / abs(nk_bb)
            assert err < 0.05, (metal, wl, nk_bb, nk_fit)


def test_variant_tally_excludes_aliases():
    """Alias keys (same medium object under two reference names) are not
    double-counted in the distinct-variant tally."""
    total = sum(len(m.variants) for m in material_library.values())
    seen = set()
    for m in material_library.values():
        for v in m.variants.values():
            seen.add(id(v.medium))
    distinct = len(seen)
    assert total >= 100
    assert distinct >= 90
    assert total - distinct <= 9  # the documented alias keys
    # the workhorse metals all carry multiple fitted variants
    for metal in ("Au", "Ag", "Al", "Cu", "W"):
        assert len(material_library[metal].variants) >= 2


def test_every_variant_has_validity_range():
    """Reference parity: each library variant carries the frequency-validity
    window of its cited fit (ref material_library.py frequency_range per
    VariantItem), evaluation inside the window is finite and physical, and
    alias keys share one medium object so the range is stamped once."""
    for name, mat in material_library.items():
        for vname, variant in mat.variants.items():
            fr = variant.medium.frequency_range
            assert fr is not None, f"{name}/{vname} missing frequency_range"
            fmin, fmax = fr
            assert 0 < fmin < fmax, (name, vname, fr)
            fmid = 0.5 * (fmin + fmax)
            eps = variant.medium.eps_model(fmid)
            assert np.all(np.isfinite(eps)), (name, vname, eps)
            # passivity inside the declared window
            assert np.imag(eps) >= -1e-6, (name, vname, eps)
    # alias identity survived the range stamping
    assert (material_library["Si3N4"]["Luke2015"]
            is material_library["SiN"]["Luke2015"])
