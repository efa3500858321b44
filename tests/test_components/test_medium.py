"""Medium models: eps evaluation, pole-residue conversions, validators."""

import numpy as np
import pytest

import tidy3d_tpu as td

F0 = 2e14


def test_medium_eps():
    med = td.Medium(permittivity=4.0, conductivity=1e-4)
    eps = med.eps_model(F0)
    assert np.isclose(eps.real, 4.0)
    assert eps.imag > 0


def test_medium_from_nk():
    med = td.Medium.from_nk(n=2.0, k=0.1, freq=F0)
    n, k = med.nk_model(F0)
    assert np.isclose(n, 2.0, rtol=1e-6)
    assert np.isclose(k, 0.1, rtol=1e-6)


def test_gain_validation():
    with pytest.raises(Exception):
        td.Medium(conductivity=-1e-4)
    td.Medium(conductivity=-1e-4, allow_gain=True)


@pytest.mark.parametrize("med", [
    td.Sellmeier(coeffs=((0.6961663, 0.0684043**2), (0.4079426, 0.1162414**2))),
    td.Lorentz(eps_inf=2.0, coeffs=((1.5, 3e14, 1e13),)),
    td.Lorentz(eps_inf=2.0, coeffs=((1.5, 3e14, 5e14),)),  # overdamped
    td.Drude(eps_inf=1.0, coeffs=((2e15, 1e13),)),
    td.Debye(eps_inf=2.0, coeffs=((1.5, 1e-15),)),
])
def test_pole_residue_equivalence(med):
    freqs = np.array([1e14, 2e14, 4e14])
    direct = med.eps_model(freqs)
    via_pr = med.pole_residue.eps_model(freqs)
    assert np.allclose(direct, via_pr, rtol=1e-8)


def test_pole_residue_causality():
    with pytest.raises(Exception):
        td.PoleResidue(eps_inf=1.0, poles=(((1e13 + 1e15j), (1e15 + 0j)),))


def test_pec():
    assert td.PEC.is_pec
    assert td.Medium().is_pec is False


def test_anisotropic():
    med = td.AnisotropicMedium(xx=td.Medium(permittivity=2),
                               yy=td.Medium(permittivity=3),
                               zz=td.Medium(permittivity=4))
    eps = med.eps_diagonal(F0)
    assert np.isclose(eps[0].real, 2)
    assert np.isclose(eps[2].real, 4)
    assert np.isclose(med.n_cfl, np.sqrt(2))


def test_fully_anisotropic():
    med = td.FullyAnisotropicMedium(
        permittivity=[[2, 0.1, 0], [0.1, 2.5, 0], [0, 0, 3]])
    assert np.isclose(med.eps_comp(0, 1, F0).real, 0.1)
    with pytest.raises(Exception):
        td.FullyAnisotropicMedium(permittivity=[[2, 0.5, 0], [0, 2, 0], [0, 0, 3]])


def test_custom_medium():
    coords = dict(x=np.linspace(-1, 1, 5), y=np.linspace(-1, 1, 5),
                  z=np.linspace(-1, 1, 5))
    eps_data = td.SpatialDataArray(np.full((5, 5, 5), 4.0), coords=coords)
    med = td.CustomMedium(permittivity=eps_data)
    arrs = med.eps_dataarray_freq(F0)
    assert np.allclose(arrs[0].values.real, 4.0)
    assert med.n_cfl == 2.0
    cropped = med.sel_inside(((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5)))
    assert cropped.permittivity.values.shape[0] <= 5


def test_medium2d():
    sheet = td.Medium2D(ss=td.Medium(permittivity=2),
                        tt=td.Medium(permittivity=2, conductivity=1e-4))
    vol = sheet.volumetric_equivalent(axis=2, adjacent_media=(td.Medium(), td.Medium()),
                                      adjacent_dls=(0.01, 0.01))
    assert isinstance(vol, td.AnisotropicMedium)


def test_serialization_roundtrip():
    for med in [td.Medium(permittivity=2.3),
                td.PoleResidue(eps_inf=1.5, poles=(((-1e13 + 2e15j), (1e15 + 0j)),)),
                td.PEC]:
        med2 = type(med).model_validate(type(med)._parse_json_string(med._json_string))
        assert med2 == med


def test_drude_debye_reference_convention():
    """Drude/Debye eps formulas match the reference's exact conventions and
    their pole-residue conversions reproduce eps_model."""
    f1, d1 = 2.0e12, 1.0e11
    dr = td.Drude(coeffs=[(f1, d1)])
    f = 3e12
    assert np.allclose(dr.eps_model(f), 1 - f1**2 / (f**2 + 1j * f * d1))
    assert np.allclose(dr.pole_residue.eps_model(f), dr.eps_model(f))
    de, tau = 2.0, 1e-13
    db = td.Debye(coeffs=[(de, tau)])
    assert np.allclose(db.eps_model(f), 1 + de / (1 - 1j * f * tau))
    assert np.allclose(db.pole_residue.eps_model(f), db.eps_model(f))


def test_graphene_conductivity():
    """Graphene: universal conductivity plateau above the interband edge and
    the exact intraband DC limit."""
    from tidy3d_tpu.constants import HBAR, K_B, Q_e

    g = td.Graphene(mu_c=0.2, include_interband=True)
    sigma0 = Q_e**2 / (4 * HBAR * Q_e)  # e^2/(4 hbar_SI)
    f_1ev = 1.0 / (2 * np.pi * HBAR)
    s = g.numerical_conductivity([f_1ev])[0]
    assert abs(s.real / sigma0 - 1.0) < 0.01
    # intraband DC limit
    intra = g.intraband_drude.pole_residue
    sdc = intra.sigma_model(1e9)
    kt = K_B * 300.0
    fermi_factor = 0.2 / kt + 2 * np.log(np.exp(-0.2 / kt) + 1)
    sdc_theory = Q_e * kt * fermi_factor / (2 * np.pi * HBAR * g.gamma)
    assert abs(abs(sdc) / sdc_theory - 1.0) < 1e-4
    # the fitted sheet medium reproduces the numerical conductivity
    m = g.medium
    fs = np.linspace(0.4, 1.5, 6) / (2 * np.pi * HBAR)
    target = g.numerical_conductivity(fs)
    fit = np.asarray(m.ss.sigma_model(fs))
    assert np.max(np.abs(fit - target) / np.abs(target)) < 0.2


def test_perturbation_media_workflow():
    """Thermo-optic bridge: heat solution -> perturbed optical media."""
    pm = td.PerturbationMedium(
        permittivity=4.0,
        permittivity_perturbation=td.ParameterPerturbation(
            heat=td.LinearHeatPerturbation(temperature_ref=300, coeff=0.01)))
    xs = np.linspace(-1, 1, 5)
    temp = td.SpatialDataArray(300 + 50 * np.ones((5, 5, 5)),
                               coords=dict(x=xs, y=xs, z=xs))
    new = pm.perturbed_copy(temperature=temp)
    assert np.allclose(np.asarray(new.permittivity.values), 4.5)
    sim = td.Simulation(
        center=(0, 0, 0), size=(2, 2, 2), run_time=1e-14,
        structures=[td.Structure(geometry=td.Box(center=(0, 0, 0),
                                                 size=(1, 1, 1)), medium=pm)],
        boundary_spec=td.BoundarySpec.all_sides(td.Periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.2))
    sim2 = sim.perturbed_mediums_copy(temperature=temp)
    assert type(sim2.structures[0].medium).__name__ == "CustomMedium"
    ppr = td.PerturbationPoleResidue(
        eps_inf=2.0, poles=[(-1e14 + 1e15j, 1e14 + 0j)],
        eps_inf_perturbation=td.ParameterPerturbation(
            heat=td.LinearHeatPerturbation(temperature_ref=300, coeff=0.005)))
    new2 = ppr.perturbed_copy(temperature=temp)
    assert np.allclose(np.asarray(new2.eps_inf.values), 2.25)
