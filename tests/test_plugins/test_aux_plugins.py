"""Physics-meaningful tests for the previously untested plugins (VERDICT r2
item 9): waveguide helper, microwave path integrals, terminal S-matrix,
expressions, design sweeps, pytorch bridge."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0, ETA_0

from tests.utils import run_emulated

WL = 1.55
FREQ0 = C_0 / WL


# --------------------------------------------------------------------------- #
# waveguide helper
# --------------------------------------------------------------------------- #


def test_waveguide_strip_neff():
    """Standard SOI strip waveguide (500 x 220 nm, oxide cladding):
    published fundamental TE n_eff at 1.55 um is ~2.4 (e.g. Chrostowski &
    Hochberg, 'Silicon Photonics Design', Table 3.1 gives 2.44)."""
    from tidy3d_tpu.plugins.waveguide import RectangularDielectric

    wg = RectangularDielectric(
        wavelength=WL,
        core_width=0.5,
        core_thickness=0.22,
        core_medium=td.Medium(permittivity=3.476**2),
        clad_medium=td.Medium(permittivity=1.444**2),
        mode_spec=td.ModeSpec(num_modes=1, target_neff=2.5),
    )
    n_eff = float(np.real(np.asarray(wg.mode_data.n_complex.values)[0, 0]))
    assert 2.3 < n_eff < 2.6, n_eff
    # physical bounds: between cladding and core indices
    assert 1.444 < n_eff < 3.476


# --------------------------------------------------------------------------- #
# microwave path integrals: analytic coax TEM line
# --------------------------------------------------------------------------- #


def _coax_field_data(a=0.2, b=0.8, n=161, freqs=(FREQ0,)):
    """Analytic coax TEM fields on a Cartesian grid (z-propagating):
    E_r = V0 / (r ln(b/a)), H_phi = E_r / eta, V0 = 1."""
    from tidy3d_tpu.components.data.data_array import ScalarFieldDataArray
    from tidy3d_tpu.components.data.monitor_data import FieldData

    lin = np.linspace(-1.0, 1.0, n)
    x, y = np.meshgrid(lin, lin, indexing="ij")
    r = np.sqrt(x**2 + y**2)
    r_safe = np.where(r < a / 2, a / 2, r)
    ln_ba = np.log(b / a)
    e_full = 1.0 / (r_safe * ln_ba)
    # E exists only in the annulus; H_phi = I_enc/(2 pi r) continues for
    # all r >= a (the square Ampere loop passes its corners beyond b)
    er = np.where((r >= a) & (r <= b), e_full, 0.0)
    hmag = np.where(r >= a, e_full / ETA_0, 0.0)
    ex = er * x / r_safe
    ey = er * y / r_safe
    hx = -hmag * y / r_safe
    hy = hmag * x / r_safe
    coords = dict(x=lin, y=lin, z=np.array([0.0]), f=np.asarray(freqs))
    comps = {}
    for name, vals in (("Ex", ex), ("Ey", ey), ("Ez", np.zeros_like(ex)),
                       ("Hx", hx), ("Hy", hy), ("Hz", np.zeros_like(ex))):
        comps[name] = ScalarFieldDataArray(
            vals[:, :, None, None].astype(complex) * np.ones((1, 1, 1, len(freqs))),
            coords=coords)
    mon = td.FieldMonitor(center=(0, 0, 0), size=(2, 2, 0),
                          freqs=list(freqs), name="coax")
    return FieldData(monitor=mon, **comps)


def test_microwave_coax_impedance():
    """V / I integrals on the analytic coax reproduce the textbook
    impedance Z = eta ln(b/a) / (2 pi) to ~1%."""
    from tidy3d_tpu.plugins.microwave import (
        CurrentIntegralAxisAligned,
        ImpedanceCalculator,
        VoltageIntegralAxisAligned,
    )

    a, b = 0.2, 0.8
    field = _coax_field_data(a=a, b=b)
    v_int = VoltageIntegralAxisAligned(
        center=((a + b) / 2, 0, 0), size=(b - a, 0, 0), sign="-")
    i_int = CurrentIntegralAxisAligned(
        center=(0, 0, 0), size=(1.2, 1.2, 0), sign="+")
    z_calc = ImpedanceCalculator(voltage_integral=v_int,
                                 current_integral=i_int)
    z = complex(np.asarray(z_calc.compute_impedance(field).values)[0])
    z_theory = ETA_0 * np.log(b / a) / (2 * np.pi)
    assert abs(z - z_theory) / z_theory < 0.02, (z, z_theory)


# --------------------------------------------------------------------------- #
# terminal component modeler
# --------------------------------------------------------------------------- #


def test_terminal_modeler_symmetry():
    """Two identical lumped ports in a mirror-symmetric setup: the
    S-matrix must satisfy S11 = S22 and S12 = S21 (reciprocity +
    geometric symmetry), with finite bounded entries."""
    from tidy3d_tpu.plugins.smatrix.component_modelers.terminal import (
        LumpedPort,
        TerminalComponentModeler,
    )

    sim = td.Simulation(
        center=(0, 0, 0), size=(3.0, 2.0, 2.0), run_time=4e-13,
        boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=8)),
        grid_spec=td.GridSpec.uniform(dl=0.1), shutoff=1e-4,
    )
    ports = (
        LumpedPort(center=(-0.6, 0, 0), size=(0, 0.4, 0.4),
                   voltage_axis=2, name="p1"),
        LumpedPort(center=(0.6, 0, 0), size=(0, 0.4, 0.4),
                   voltage_axis=2, name="p2"),
    )
    modeler = TerminalComponentModeler(
        simulation=sim, ports=ports, freqs=[FREQ0])
    s = modeler.run()
    vals = np.asarray(s.values)
    assert vals.shape == (2, 2, 1)
    assert np.all(np.isfinite(vals))
    assert abs(vals[0, 0, 0] - vals[1, 1, 0]) < 5e-2 * max(
        abs(vals[0, 0, 0]), 1e-6)
    assert abs(vals[0, 1, 0] - vals[1, 0, 0]) < 5e-2 * max(
        abs(vals[0, 1, 0]), 1e-6)


# --------------------------------------------------------------------------- #
# expressions
# --------------------------------------------------------------------------- #


def test_expressions_roundtrip_and_eval(tmp_path):
    """Objective ASTs are data: serialize -> reload -> identical value."""
    from tidy3d_tpu.plugins.expressions import ModeAmp, ModePower

    mon = td.ModeMonitor(center=(0, 0, 0.5), size=(2, 2, 0), freqs=[FREQ0],
                         mode_spec=td.ModeSpec(num_modes=2), name="mode")
    sim = td.Simulation(
        center=(0, 0, 0), size=(3, 3, 3), run_time=1e-13,
        sources=[td.PointDipole(
            center=(0, 0, 0), polarization="Ex",
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5))],
        monitors=[mon],
        boundary_spec=td.BoundarySpec.all_sides(td.Periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.1), shutoff=0.0)
    sim_data = run_emulated(sim)

    expr = 2.0 * ModePower(monitor_name="mode", mode_index=0, f=FREQ0) + 0.5
    val = expr(sim_data)
    assert np.isfinite(val) and val > 0.5

    fname = str(tmp_path / "objective.json")
    expr.to_file(fname)
    expr2 = type(expr).from_file(fname)
    assert expr2(sim_data) == pytest.approx(val)

    # the metric agrees with direct data access
    amps = sim_data["mode"].amps.sel(direction="+")
    expected = 2.0 * np.abs(np.asarray(amps.values)[0, 0]) ** 2 + 0.5
    assert val == pytest.approx(expected)

    amp = ModeAmp(monitor_name="mode", mode_index=1, f=FREQ0)(sim_data)
    assert np.iscomplexobj(amp)


# --------------------------------------------------------------------------- #
# design sweeps
# --------------------------------------------------------------------------- #


def test_design_space_grid_and_mc():
    """Grid sampling hits the exact outer-product points; Monte-Carlo
    respects bounds and count; results map back per-sample."""
    from tidy3d_tpu.plugins.design import (
        DesignSpace,
        MethodGrid,
        MethodMonteCarlo,
        ParameterFloat,
    )

    params = (
        ParameterFloat(name="a", span=(0.0, 1.0), num_points=3),
        ParameterFloat(name="b", span=(2.0, 4.0), num_points=2),
    )
    space = DesignSpace(parameters=params, method=MethodGrid())
    result = space.run(lambda a, b: a * 10 + b)
    assert len(result.values) == 6
    for coords, val in zip(result.coords, result.values):
        assert val == pytest.approx(coords[0] * 10 + coords[1])

    space_mc = DesignSpace(parameters=params,
                           method=MethodMonteCarlo(num_points=7))
    res_mc = space_mc.run(lambda a, b: a + b)
    assert len(res_mc.values) == 7
    for coords in res_mc.coords:
        assert 0.0 <= coords[0] <= 1.0 and 2.0 <= coords[1] <= 4.0


# --------------------------------------------------------------------------- #
# pytorch bridge
# --------------------------------------------------------------------------- #


def test_pytorch_bridge_grad_equivalence():
    """to_torch-wrapped function: value and gradient equal the jax ones."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from tidy3d_tpu.plugins.pytorch import to_torch

    def objective(x):
        return jnp.sum(jnp.sin(x) ** 2 + 0.5 * x)

    x_np = np.linspace(-1.0, 2.0, 5)
    val_jax = float(objective(jnp.asarray(x_np)))
    grad_jax = np.asarray(jax.grad(objective)(jnp.asarray(x_np)))

    fn_t = to_torch(objective)
    x_t = torch.tensor(x_np, requires_grad=True, dtype=torch.float32)
    val_t = fn_t(x_t)
    val_t.backward()
    assert float(val_t) == pytest.approx(val_jax, rel=1e-5)
    np.testing.assert_allclose(x_t.grad.numpy(), grad_jax, rtol=1e-4,
                               atol=1e-6)
