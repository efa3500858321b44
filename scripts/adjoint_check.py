"""Dev check: shape-adjoint gradients vs central finite differences (CPU)."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.web.run import run as _web_run
from tidy3d_tpu.web.autograd import run_structure_gradients, _monitor_fields

FREQ0 = C_0 / 1.55
DL = 0.05


def make_sim(eps=4.0, size=(0.585, 0.505, 0.395), center=(0.163, 0.011, -0.017), verts=None):
    structures = []
    if verts is not None:
        geo = td.PolySlab(vertices=verts, slab_bounds=(-0.213, 0.188), axis=2)
    else:
        geo = td.Box(center=center, size=size)
    structures = [td.Structure(geometry=geo, medium=td.Medium(permittivity=eps))]
    return td.Simulation(
        center=(0, 0, 0), size=(32 * DL,) * 3, run_time=8e-14,
        sources=[td.PointDipole(
            center=(-0.45, 0, 0),
            source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
            polarization="Ez")],
        structures=structures,
        monitors=[td.FieldMonitor(center=(0.65, 0, 0), size=(0, 0, 0),
                                  freqs=[FREQ0], colocate=False,
                                  name="point")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=8)),
        grid_spec=td.GridSpec.uniform(dl=DL), shutoff=0.0)


def objective(fields):
    ez = fields["point"]["Ez"]
    return jnp.sum(jnp.abs(ez) ** 2)


def J_of(sim):
    data = _web_run(sim, verbose=False)
    f = _monitor_fields(data, ["point"])
    return float(np.sum(np.abs(f["point"]["Ez"]) ** 2))


def check_eps():
    val, grads, _ = run_structure_gradients(
        make_sim(), objective, {0: [("medium", "permittivity")]})
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    jp = J_of(make_sim(eps=4.0 + h))
    jm = J_of(make_sim(eps=4.0 - h))
    g_fd = (jp - jm) / (2 * h)
    print(f"[eps]  J={val:.6e} adj={g_adj:.6e} fd={g_fd:.6e} "
          f"ratio={g_adj / g_fd:.4f}")


def check_box():
    val, grads, _ = run_structure_gradients(
        make_sim(), objective, {0: [("geometry", "size"),
                                    ("geometry", "center")]})
    h = DL / 3
    for ax in range(3):
        for which in ("size", "center"):
            g_adj = grads[0][("geometry", which)][ax]
            base = dict(size=[0.585, 0.505, 0.395], center=[0.163, 0.011, -0.017])
            pp = {k: list(v) for k, v in base.items()}
            pm = {k: list(v) for k, v in base.items()}
            pp[which][ax] += h
            pm[which][ax] -= h
            jp = J_of(make_sim(size=tuple(pp["size"]), center=tuple(pp["center"])))
            jm = J_of(make_sim(size=tuple(pm["size"]), center=tuple(pm["center"])))
            g_fd = (jp - jm) / (2 * h)
            r = g_adj / g_fd if g_fd else float("nan")
            print(f"[box {which}[{ax}]] adj={g_adj:.5e} fd={g_fd:.5e} ratio={r:.4f}")


def check_polyslab():
    verts0 = [(-0.237, -0.285), (0.462, -0.294), (0.441, 0.308), (-0.256, 0.277)]
    val, grads, _ = run_structure_gradients(
        make_sim(verts=verts0), objective, {0: [("geometry", "vertices")]})
    g = grads[0][("geometry", "vertices")]
    h = DL / 3
    for (vi, k) in [(1, 0), (2, 1), (0, 0)]:
        vp = [list(v) for v in verts0]
        vm = [list(v) for v in verts0]
        vp[vi][k] += h
        vm[vi][k] -= h
        jp = J_of(make_sim(verts=vp))
        jm = J_of(make_sim(verts=vm))
        g_fd = (jp - jm) / (2 * h)
        r = g[vi, k] / g_fd if g_fd else float("nan")
        print(f"[vertex {vi},{'xy'[k]}] adj={g[vi, k]:.5e} fd={g_fd:.5e} ratio={r:.4f}")




def check_flux():
    """Flux-like mixed E/H objective: exercises magnetic adjoint currents."""
    import tidy3d_tpu as td

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
        data = _web_run(sim, verbose=False)
        f = _monitor_fields(data, ["plane"])
        f = {k: {c: jnp.asarray(v) for c, v in d.items()} for k, d in f.items()}
        return float(obj(f))

    val, grads, _ = run_structure_gradients(
        make(), obj, {0: [("medium", "permittivity")]},
        monitor_names=["plane"])
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_f(make(4.0 + h)) - J_of_f(make(4.0 - h))) / (2 * h)
    print(f"[flux-like]  J={val:.6e} adj={g_adj:.6e} fd={g_fd:.6e} "
          f"ratio={g_adj / g_fd:.4f}")


def check_plane(comp="Ez"):
    """Single-component plane-monitor objective: isolates the
    CustomCurrentSource adjoint branch (E comps) and the magnetic branch
    (H comps)."""
    import tidy3d_tpu as td

    def make(eps=4.0):
        sim = make_sim(eps=eps)
        mon = td.FieldMonitor(center=(0.65, 0, 0), size=(0, 0.6, 0.6),
                              freqs=[FREQ0], colocate=False, name="plane")
        return sim.copy(update=dict(monitors=(mon,)))

    def obj(fields):
        return jnp.sum(jnp.abs(fields["plane"][comp]) ** 2)

    def J_of_f(sim):
        data = _web_run(sim, verbose=False)
        f = _monitor_fields(data, ["plane"])
        return float(np.sum(np.abs(f["plane"][comp]) ** 2))

    val, grads, _ = run_structure_gradients(
        make(), obj, {0: [("medium", "permittivity")]},
        monitor_names=["plane"])
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_f(make(4.0 + h)) - J_of_f(make(4.0 - h))) / (2 * h)
    print(f"[plane {comp}]  adj={g_adj:.6e} fd={g_fd:.6e} "
          f"ratio={g_adj / g_fd:.4f}")


def check_plane_single():
    """Plane monitor but objective touches ONE sample: must reproduce the
    validated point-dipole branch exactly."""
    import tidy3d_tpu as td

    def make(eps=4.0):
        sim = make_sim(eps=eps)
        mon = td.FieldMonitor(center=(0.65, 0, 0), size=(0, 0.6, 0.6),
                              freqs=[FREQ0], colocate=False, name="plane")
        return sim.copy(update=dict(monitors=(mon,)))

    import os as _os
    ix, iy, iz = (int(v) for v in
                  _os.environ.get("SINGLE_IDX", "0,6,6").split(","))

    def obj(fields):
        return jnp.sum(jnp.abs(fields["plane"]["Ez"][ix, iy, iz]) ** 2)

    def J_of_f(sim):
        data = _web_run(sim, verbose=False)
        f = _monitor_fields(data, ["plane"])
        return float(np.sum(np.abs(f["plane"]["Ez"][ix, iy, iz]) ** 2))

    val, grads, _ = run_structure_gradients(
        make(), obj, {0: [("medium", "permittivity")]},
        monitor_names=["plane"])
    g_adj = grads[0][("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_f(make(4.0 + h)) - J_of_f(make(4.0 - h))) / (2 * h)
    print(f"[plane-single Ez]  adj={g_adj:.6e} fd={g_fd:.6e} "
          f"ratio={g_adj / g_fd:.4f}")


def check_diffraction():
    """Diffraction-order-amplitude objective through the adjoint protocol
    (DiffractionData.make_adjoint_sources)."""
    import tidy3d_tpu as td

    def make(eps=4.0):
        dl = DL
        bspec = td.BoundarySpec(
            x=td.Boundary.periodic(), y=td.Boundary.periodic(),
            z=td.Boundary.pml(num_layers=8))
        src = td.PlaneWave(center=(0, 0, -0.55), size=(td.inf, td.inf, 0),
                           source_time=td.GaussianPulse(freq0=FREQ0,
                                                        fwidth=FREQ0 / 5),
                           direction="+")
        grating = td.Structure(
            geometry=td.Box(center=(0.2, 0.05, -0.1), size=(0.9, 1.2, 0.3)),
            medium=td.Medium(permittivity=eps))
        mon = td.DiffractionMonitor(center=(0, 0, 0.55),
                                    size=(td.inf, td.inf, 0),
                                    freqs=[FREQ0], name="diff")
        return td.Simulation(
            center=(0, 0, 0), size=(2.4, 2.4, 1.6), run_time=1.2e-13,
            sources=[src], structures=[grating], monitors=[mon],
            boundary_spec=bspec, grid_spec=td.GridSpec.uniform(dl=dl),
            shutoff=1e-6)

    def obj_amps(amps):
        # power in the +1 x-order, s+p
        return jnp.sum(jnp.abs(amps[-1, :, :, :]) ** 2)

    def J_of_d(sim):
        data = _web_run(sim, verbose=False)
        return float(np.sum(np.abs(
            np.asarray(data["diff"].amps.values)[-1]) ** 2))

    import tidy3d_tpu.web.autograd as ag

    # manual two-solve: the generic runner only knows Field/Mode monitors
    sim = make()
    sim_fwd = ag.setup_fwd(sim, {0: [("medium", "permittivity")]}, [FREQ0])
    data_fwd = _web_run(sim_fwd, verbose=False)
    amps = np.asarray(data_fwd["diff"].amps.values)
    val, g = None, None
    import jax

    def fn(parts):
        re, im = parts
        return obj_amps(re + 1j * im)

    val, (gre, gim) = jax.value_and_grad(fn)(
        (jnp.asarray(np.real(amps)), jnp.asarray(np.imag(amps))))
    gamp = np.asarray(gre) + 1j * np.asarray(gim)
    md = data_fwd["diff"].copy(update=dict(amps=type(data_fwd["diff"].amps)(
        gamp, coords=data_fwd["diff"].amps.coords)))
    sources = md.make_adjoint_sources(["amps"], float(FREQ0 / 5),
                                      grid=sim.grid)
    assert sources, "no adjoint sources synthesized"
    grad_mons = [m for m in sim_fwd.monitors
                 if m.name.startswith("adjoint_")]
    sim_adj = sim_fwd.copy(update=dict(sources=tuple(sources),
                                       monitors=tuple(
                                           m for m in grad_mons
                                           if m.name.startswith("adjoint_fld")),
                                       normalize_index=0))
    data_adj = _web_run(sim_adj, verbose=False)
    from tidy3d_tpu.components.autograd.derivative_utils import DerivativeInfo

    structure = sim.structures[0]
    dls = [float(np.mean(np.diff(np.asarray(
        sim.grid.boundaries.to_list[a])))) for a in range(3)]
    info = DerivativeInfo(
        E_fwd=ag._field_tuple(data_fwd["adjoint_fld_0"], freq=FREQ0),
        E_adj=ag._field_tuple(data_adj["adjoint_fld_0"], freq=FREQ0),
        eps_data=ag._eps_tuple(data_fwd["adjoint_eps_0"], FREQ0),
        eps_in=structure.medium.eps_model(FREQ0),
        eps_out=sim.medium.eps_model(FREQ0),
        frequency=FREQ0, bounds=structure.geometry.bounds, dt=sim.dt,
        dl_loc=float(np.mean(dls)), avg_dls=tuple(dls))
    grads = structure.compute_derivatives([("medium", "permittivity")], info)
    g_adj = grads[("medium", "permittivity")]
    h = 0.02
    g_fd = (J_of_d(make(4.0 + h)) - J_of_d(make(4.0 - h))) / (2 * h)
    print(f"[diffraction]  J={val:.6e} adj={g_adj:.6e} fd={g_fd:.6e} "
          f"ratio={g_adj / g_fd:.4f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "eps"
    if which.startswith("plane"):
        check_plane(which.split(":")[1] if ":" in which else "Ez")
    else:
        dict(eps=check_eps, box=check_box, poly=check_polyslab,
             flux=check_flux, single=check_plane_single, diff=check_diffraction)[which]()
