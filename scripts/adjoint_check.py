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


def make_sim(eps=4.0, size=(0.6, 0.5, 0.4), center=(0.15, 0, 0), verts=None):
    structures = []
    if verts is not None:
        geo = td.PolySlab(vertices=verts, slab_bounds=(-0.2, 0.2), axis=2)
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
        monitors=[td.FieldMonitor(center=(0.55, 0, 0), size=(0, 0, 0),
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
            base = dict(size=[0.6, 0.5, 0.4], center=[0.15, 0, 0])
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
    verts0 = [(-0.25, -0.3), (0.45, -0.3), (0.45, 0.3), (-0.25, 0.3)]
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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "eps"
    dict(eps=check_eps, box=check_box, poly=check_polyslab)[which]()
