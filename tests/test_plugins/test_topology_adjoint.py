"""FD-vs-adjoint validation of per-cell CustomMedium (topology) gradients.

VERDICT r1 weak-point 6 closure: the production inverse-design route runs
TWO forward solves on the fast kernel path (run_structure_gradients with a
CustomMedium density structure + CustomMedium.compute_derivatives scatter),
instead of jax.grad through the XLA-path scan
(plugins/adjoint/topology.py). Reference behavior model: CustomMedium
``_derivative_field_cmp`` (/root/reference/tidy3d/components/medium.py:2043)
sampled E_fwd*E_adj scattered onto the data grid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import tidy3d_tpu as td
from tidy3d_tpu.components.data.data_array import SpatialDataArray
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.web.autograd import _monitor_fields, run_structure_gradients
from tidy3d_tpu.web.run import run as web_run

FREQ0 = C_0 / 1.55
DL = 0.05
# design region: 4 x 4 x 3 data points, deliberately off-grid-center
BOUNDS = ((-0.31, -0.29, -0.22), (0.33, 0.35, 0.26))
NPTS = (4, 4, 3)


def _coords():
    return {
        d: np.linspace(BOUNDS[0][a], BOUNDS[1][a], NPTS[a])
        for a, d in enumerate("xyz")
    }


def make_sim(density):
    """density in [0, 1] with shape NPTS -> eps in [1, 4]."""
    eps = 1.0 + 3.0 * np.clip(np.asarray(density, float), 0.0, 1.0)
    medium = td.CustomMedium(
        permittivity=SpatialDataArray(eps, coords=_coords()))
    lo, hi = np.array(BOUNDS[0]), np.array(BOUNDS[1])
    geo = td.Box(center=tuple((lo + hi) / 2), size=tuple(hi - lo + DL))
    return td.Simulation(
        center=(0, 0, 0), size=(32 * DL,) * 3, run_time=8e-14,
        sources=[td.PointDipole(
            center=(-0.45, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        structures=[td.Structure(geometry=geo, medium=medium)],
        monitors=[td.FieldMonitor(center=(0.65, 0, 0), size=(0, 0, 0),
                                  freqs=[FREQ0], colocate=False,
                                  name="point")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=8)),
        grid_spec=td.GridSpec.uniform(dl=DL), shutoff=0.0)


def objective(fields):
    return jnp.sum(jnp.abs(fields["point"]["Ez"]) ** 2)


def J_of(sim):
    data = web_run(sim, verbose=False)
    f = _monitor_fields(data, ["point"])
    return float(np.sum(np.abs(f["point"]["Ez"]) ** 2))


def test_custom_medium_density_gradient():
    rng = np.random.default_rng(3)
    density = 0.3 + 0.4 * rng.random(NPTS)

    _, grads, _ = run_structure_gradients(
        make_sim(density), objective, {0: [("medium", "permittivity")]})
    g_eps = grads[0][("medium", "permittivity")]
    assert g_eps.shape == NPTS
    # chain rule d eps / d density = 3.0
    g_density = 3.0 * g_eps

    # FD at the 3 largest-|g| data points (the informative ones)
    flat = np.argsort(-np.abs(g_density).ravel())[:3]
    h = 0.02
    for fi in flat:
        idx = np.unravel_index(fi, NPTS)
        dp = density.copy()
        dp[idx] += h
        dm = density.copy()
        dm[idx] -= h
        g_fd = (J_of(make_sim(dp)) - J_of(make_sim(dm))) / (2 * h)
        assert abs(g_density[idx] / g_fd - 1.0) < 0.05, \
            (idx, g_density[idx], g_fd)


def test_custom_medium_conductivity_gradient():
    rng = np.random.default_rng(5)
    density = 0.3 + 0.4 * rng.random(NPTS)
    sigma0 = 0.02 * rng.random(NPTS)

    def make(sig):
        sim = make_sim(density)
        st = sim.structures[0]
        med = st.medium.copy(update=dict(
            conductivity=SpatialDataArray(sig, coords=_coords())))
        return sim.copy(update=dict(
            structures=(st.copy(update=dict(medium=med)),)))

    _, grads, _ = run_structure_gradients(
        make(sigma0), objective, {0: [("medium", "conductivity")]})
    g_sig = grads[0][("medium", "conductivity")]
    assert g_sig.shape == NPTS

    flat = np.argsort(-np.abs(g_sig).ravel())[:2]
    h = 5e-4
    for fi in flat:
        idx = np.unravel_index(fi, NPTS)
        sp = sigma0.copy()
        sp[idx] += h
        sm = sigma0.copy()
        sm[idx] -= h
        g_fd = (J_of(make(sp)) - J_of(make(sm))) / (2 * h)
        assert abs(g_sig[idx] / g_fd - 1.0) < 0.08, (idx, g_sig[idx], g_fd)
