"""Adjoint (exact AD through the solver) and inverse-design tests."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.plugins.adjoint import TopologyObjective
from tidy3d_tpu.plugins.invdes import (
    AdamOptimizer,
    InverseDesign,
    TopologyDesignRegion,
)

WL = 1.5
FREQ0 = C_0 / WL


@pytest.fixture(scope="module")
def coupling_sim():
    src = td.PointDipole(center=(-1.4, 0, 0),
                         source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 6),
                         polarization="Ez")
    wg = td.Structure(geometry=td.Box(center=(1.55, 0, 0), size=(1.7, 0.4, td.inf)),
                      medium=td.Medium(permittivity=4.0))
    mon = td.ModeMonitor(center=(1.8, 0, 0), size=(0, 2.6, td.inf), freqs=[FREQ0],
                         name="out", mode_spec=td.ModeSpec(num_modes=1,
                                                           target_neff=2.0))
    return td.Simulation(
        center=(0, 0, 0), size=(5, 3.6, 0), run_time=1e-13,
        sources=[src], monitors=[mon], structures=[wg], shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.06),
    )


def test_gradient_matches_finite_difference(coupling_sim):
    region = td.Box(center=(-0.1, 0, 0), size=(1.2, 1.8, td.inf))
    topo = TopologyObjective(coupling_sim, region, eps_min=1.0, eps_max=6.0,
                             mode_monitor_name="out")
    rho = 0.5 * np.ones(topo.density_shape)
    v0, g = topo.value_and_grad(rho)
    assert v0 > 0
    assert np.abs(g).max() > 0
    # check the largest-gradient pixel against central finite differences
    idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    h = 5e-3
    rho_p = rho.copy()
    rho_p[idx] += h
    rho_m = rho.copy()
    rho_m[idx] -= h
    fd = (topo.value(rho_p) - topo.value(rho_m)) / (2 * h)
    assert abs(fd - g[idx]) / abs(fd) < 0.02


def test_adjoint_method_matches_fd(coupling_sim):
    """FD-validates the production gradient method ('adjoint': two forward
    solves on the fast kernel path, CustomMedium per-cell VJPs, the
    monitor pipeline's power-normalized mode amp as objective) — per-pixel
    AND along a uniform density direction. NOTE the autodiff
    (TopologyObjective) route optimizes a DIFFERENT surrogate amp
    (raw-accumulator overlap, which carries radiation-leakage
    contamination from its raw-Yee quadrature), so the two methods'
    gradients are each FD-consistent but are not comparable pixel-wise;
    its own FD test is test_gradient_matches_finite_difference."""
    region = TopologyDesignRegion(center=(-0.1, 0, 0), size=(1.2, 1.8, td.inf),
                                  eps_bounds=(1.0, 6.0))
    des = InverseDesign(simulation=coupling_sim, design_region=region,
                        output_monitor_name="out", method="adjoint")
    rho = 0.5 * np.ones(region.params_shape(coupling_sim))
    v0, g = des._density_value_and_grad_adjoint(rho)
    assert v0 > 0

    def val(r):
        return des._density_value_and_grad_adjoint(r)[0]

    h = 5e-3
    idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    rp, rm = rho.copy(), rho.copy()
    rp[idx] += h
    rm[idx] -= h
    fd = (val(rp) - val(rm)) / (2 * h)
    assert abs(g[idx] / fd - 1.0) < 0.1, (g[idx], fd)
    # uniform directional derivative
    fd_u = (val(rho + h / 2) - val(rho - h / 2)) / h
    assert abs(float(np.sum(g)) / fd_u - 1.0) < 0.2, (np.sum(g), fd_u)


def test_invdes_improves_objective(coupling_sim):
    region = TopologyDesignRegion(center=(-0.1, 0, 0), size=(1.2, 1.8, td.inf),
                                  eps_bounds=(1.0, 6.0))
    design = InverseDesign(simulation=coupling_sim, design_region=region,
                           output_monitor_name="out")
    opt = AdamOptimizer(design=design, num_steps=3, learning_rate=0.1)
    result = opt.run()
    assert result.objective_history[-1] > result.objective_history[0]
    # realized simulation contains the design structure
    sim_final = design.to_simulation(result.params)
    assert len(sim_final.structures) == len(coupling_sim.structures) + 1


def test_design_region_transform():
    region = TopologyDesignRegion(center=(0, 0, 0), size=(1, 1, 0.2),
                                  eps_bounds=(1.0, 4.0), radius=0.2, beta=5)
    params = np.random.default_rng(0).uniform(0, 1, (10, 10, 2))
    density = np.asarray(region.transform(params, dl=0.1))
    assert density.shape == params.shape
    assert density.min() >= -1e-6 and density.max() <= 1 + 1e-6
