"""FD-vs-adjoint validation of structure-parameter gradients.

Covers VERDICT item 4: Box size, PolySlab vertex, and medium
permittivity gradients through the two-solve adjoint protocol
(Structure.compute_derivatives dispatch, make_adjoint_sim sources,
web.autograd.run_structure_gradients). Geometries are deliberately NOT
grid-aligned: the rasterizer's clip(frac) has subgradient kinks exactly
at face-on-grid positions where FD and the one-sided derivative
legitimately disagree.

Measured accuracies (scripts/adjoint_check.py): permittivity 0.05%,
box sizes 3-4%, polyslab vertices 2-8% — the box/vertex residual is the
adjoint-run-vs-discrete-adjoint field error at interface cells (<1% per
cell, fit in scripts/adjoint_map_check.py) accumulated over faces.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.web.autograd import _monitor_fields, run_structure_gradients
from tidy3d_tpu.web.run import run as web_run

FREQ0 = C_0 / 1.55
DL = 0.05
SIZE0 = (0.585, 0.505, 0.395)
CENTER0 = (0.163, 0.011, -0.017)
VERTS0 = [(-0.237, -0.285), (0.462, -0.294), (0.441, 0.308), (-0.256, 0.277)]


def make_sim(eps=4.0, size=SIZE0, center=CENTER0, verts=None):
    if verts is not None:
        geo = td.PolySlab(vertices=verts, slab_bounds=(-0.213, 0.188), axis=2)
    else:
        geo = td.Box(center=center, size=size)
    return td.Simulation(
        center=(0, 0, 0), size=(32 * DL,) * 3, run_time=8e-14,
        sources=[td.PointDipole(
            center=(-0.45, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        structures=[td.Structure(geometry=geo,
                                 medium=td.Medium(permittivity=eps))],
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


def test_permittivity_gradient():
    _, grads, _ = run_structure_gradients(
        make_sim(), objective, {0: [("medium", "permittivity")]})
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of(make_sim(eps=4.0 + h)) - J_of(make_sim(eps=4.0 - h))) / (2 * h)
    assert abs(g_adj / g_fd - 1.0) < 0.02, (g_adj, g_fd)


def test_box_size_gradient():
    _, grads, _ = run_structure_gradients(
        make_sim(), objective, {0: [("geometry", "size")]})
    g_adj = grads[0][("geometry", "size")][2]
    h = DL / 3
    sp = list(SIZE0); sp[2] += h
    sm = list(SIZE0); sm[2] -= h
    g_fd = (J_of(make_sim(size=tuple(sp)))
            - J_of(make_sim(size=tuple(sm)))) / (2 * h)
    assert abs(g_adj / g_fd - 1.0) < 0.10, (g_adj, g_fd)


def test_polyslab_vertex_gradient():
    _, grads, _ = run_structure_gradients(
        make_sim(verts=VERTS0), objective, {0: [("geometry", "vertices")]})
    g_adj = grads[0][("geometry", "vertices")]
    assert g_adj.shape == (4, 2)
    h = DL / 3
    vp = [list(v) for v in VERTS0]; vp[2][1] += h
    vm = [list(v) for v in VERTS0]; vm[2][1] -= h
    g_fd = (J_of(make_sim(verts=vp)) - J_of(make_sim(verts=vm))) / (2 * h)
    assert abs(g_adj[2, 1] / g_fd - 1.0) < 0.10, (g_adj[2, 1], g_fd)


def test_diffraction_efficiency_gradient():
    """Diffraction-order power objective through the generic runner:
    DiffractionData.make_adjoint_sources synthesizes the conjugate
    Fourier-kernel current sheet (reference: monitor_data.py:2923)."""
    bspec = td.BoundarySpec(
        x=td.Boundary.periodic(), y=td.Boundary.periodic(),
        z=td.Boundary.pml(num_layers=8))

    def make(eps=4.0):
        return td.Simulation(
            center=(0, 0, 0), size=(2.4, 2.4, 1.6), run_time=1.2e-13,
            sources=[td.PlaneWave(
                center=(0, 0, -0.55), size=(td.inf, td.inf, 0),
                source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
                direction="+")],
            structures=[td.Structure(
                geometry=td.Box(center=(0.2, 0.05, -0.1),
                                size=(0.9, 1.2, 0.3)),
                medium=td.Medium(permittivity=eps))],
            monitors=[td.DiffractionMonitor(
                center=(0, 0, 0.55), size=(td.inf, td.inf, 0),
                freqs=[FREQ0], name="diff")],
            boundary_spec=bspec, grid_spec=td.GridSpec.uniform(dl=DL),
            shutoff=1e-6)

    def objective(fields):
        return jnp.sum(jnp.abs(fields["diff"]["amps"][-1]) ** 2)

    def J_of_d(sim):
        data = web_run(sim, verbose=False)
        return float(np.sum(np.abs(
            np.asarray(data["diff"].amps.values)[-1]) ** 2))

    _, grads, _ = run_structure_gradients(
        make(), objective, {0: [("medium", "permittivity")]},
        monitor_names=["diff"])
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_d(make(4.0 + h)) - J_of_d(make(4.0 - h))) / (2 * h)
    assert abs(g_adj / g_fd - 1.0) < 0.05, (g_adj, g_fd)


def test_flux_objective_gradient():
    """Flux(-like) plane objective: mixed E/H Poynting sum on a plane
    FieldMonitor. Exercises the magnetic (H-VJP) adjoint-current branch;
    this is the supported route for flux objectives (FluxData itself
    raises, matching reference monitor_data.py:1937)."""

    def make(eps=4.0):
        sim = make_sim(eps=eps)
        mon = td.FieldMonitor(center=(0.65, 0, 0), size=(0, 0.6, 0.6),
                              freqs=[FREQ0], colocate=False, name="plane")
        return sim.copy(update=dict(monitors=(mon,)))

    def obj(fields):
        ey, ez = fields["plane"]["Ey"], fields["plane"]["Ez"]
        hy, hz = fields["plane"]["Hy"], fields["plane"]["Hz"]
        n = min(ey.shape[1], hz.shape[1]), min(ey.shape[2], hz.shape[2])
        s = (ey[:, :n[0], :n[1]] * jnp.conj(hz[:, :n[0], :n[1]])
             - ez[:, :n[0], :n[1]] * jnp.conj(hy[:, :n[0], :n[1]]))
        return jnp.sum(jnp.real(s))

    def J_of_f(sim):
        data = web_run(sim, verbose=False)
        f = _monitor_fields(data, ["plane"])
        f = {k: {c: jnp.asarray(v) for c, v in d.items()}
             for k, d in f.items()}
        return float(obj(f))

    _, grads, _ = run_structure_gradients(
        make(), obj, {0: [("medium", "permittivity")]},
        monitor_names=["plane"])
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_f(make(4.0 + h)) - J_of_f(make(4.0 - h))) / (2 * h)
    assert abs(g_adj / g_fd - 1.0) < 0.05, (g_adj, g_fd)


def test_flux_monitor_adjoint_guard():
    """FluxData raises on a nonzero VJP and skips when all-zero (parity
    with reference monitor_data.py:1937)."""
    from tidy3d_tpu.components.data.data_array import FluxDataArray
    from tidy3d_tpu.components.data.monitor_data import FluxData

    mon = td.FluxMonitor(center=(0, 0, 0), size=(0, 1, 1),
                         freqs=[FREQ0], name="flux")
    zero = FluxData(monitor=mon, flux=FluxDataArray(
        np.zeros(1), coords=dict(f=np.array([FREQ0]))))
    assert zero.make_adjoint_sources(["flux"], fwidth=FREQ0 / 10) == []
    nz = FluxData(monitor=mon, flux=FluxDataArray(
        np.ones(1), coords=dict(f=np.array([FREQ0]))))
    with pytest.raises(NotImplementedError):
        nz.make_adjoint_sources(["flux"], fwidth=FREQ0 / 10)


def test_broadband_multifreq_gradient():
    """Two-frequency objective through ONE adjoint solve: the runner
    remixes per-frequency adjoint sources for spectral pulse coupling
    (beyond reference sim_data.py:1132-1281, which only handles the
    single-pattern case) and runs the adjoint unnormalized. FD-validated
    against the summed two-frequency objective."""
    f1, f2 = 0.94 * FREQ0, 1.06 * FREQ0

    def make(eps=4.0):
        sim = make_sim(eps=eps)
        mon = td.FieldMonitor(center=(0.65, 0, 0), size=(0, 0, 0),
                              freqs=[f1, f2], colocate=False, name="point")
        return sim.copy(update=dict(monitors=(mon,)))

    def obj(fields):
        ez = fields["point"]["Ez"]
        return jnp.sum(jnp.abs(ez) ** 2)

    def J_of_m(sim):
        data = web_run(sim, verbose=False)
        f = _monitor_fields(data, ["point"])
        return float(np.sum(np.abs(f["point"]["Ez"]) ** 2))

    _, grads, _ = run_structure_gradients(
        make(), obj, {0: [("medium", "permittivity")]},
        monitor_names=["point"])
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_m(make(4.0 + h)) - J_of_m(make(4.0 - h))) / (2 * h)
    assert abs(g_adj / g_fd - 1.0) < 0.05, (g_adj, g_fd)
