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
