"""Dev probe: decompose dJ/d(center_x) = sum g_eps * deps/dp three ways:
(1) full-J finite difference (ground truth),
(2) native-AD g map contracted with FD of the lowered eps arrays,
(3) native-AD g map contracted with the analytic rasterizer chain.
Isolates whether the analytic deps/dparam chain matches the rasterizer."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0, EPSILON_0
from tidy3d_tpu.solver.lowering import lower
from scripts.adjoint_map_check import native_map
from scripts.adjoint_check import make_sim, DL

FREQ0 = C_0 / 1.55


def eps_arrays(sim):
    plan = lower(sim)
    from tidy3d_tpu.solver.fdtd import FDTDRunner

    runner = FDTDRunner(plan)
    dt = plan.dt
    out = {}
    for c in ("Ex", "Ey", "Ez"):
        cb = np.asarray(runner.consts["coeffs_E"][c][1])
        cb = np.broadcast_to(cb, plan.shape)
        out[c] = (dt / EPSILON_0) / cb
    return out


def main(which="center", ax=0):
    g_native, sim, plan = native_map()

    h = DL / 3
    base = dict(size=[0.585, 0.505, 0.395], center=[0.163, 0.011, -0.017])
    pp = {k: list(v) for k, v in base.items()}
    pm = {k: list(v) for k, v in base.items()}
    pp[which][ax] += h
    pm[which][ax] -= h
    ep = eps_arrays(make_sim(size=tuple(pp["size"]), center=tuple(pp["center"])))
    em = eps_arrays(make_sim(size=tuple(pm["size"]), center=tuple(pm["center"])))

    total2 = 0.0
    for c in ("Ex", "Ey", "Ez"):
        deps = (ep[c] - em[c]) / (2 * h)
        total2 += np.sum(g_native[c] * deps)
        nz = np.abs(deps) > 1e-6
        print(c, "cells with deps != 0:", nz.sum(),
              "contribution:", np.sum(g_native[c] * deps))
    print(f"(2) native-g x lowering-FD total = {total2:.5e}")

    # (3) analytic chain, same g map (on full grid yee coords)
    from tidy3d_tpu.solver.lowering_utils import yee_coords
    geo = td.Box(center=tuple(base["center"]), size=tuple(base["size"]))
    dl_loc = DL
    hh = 1e-4 * DL
    total3 = 0.0
    for ci, c in enumerate(("Ex", "Ey", "Ez")):
        yc = yee_coords(sim.grid, c)
        cs = [np.asarray(yc[d], float) for d in "xyz"]
        X, Y, Z = np.meshgrid(*cs, indexing="ij")
        sdf = np.broadcast_to(np.asarray(geo.sdf(X, Y, Z), float), X.shape)
        band = np.abs(sdf) < 0.5 * dl_loc
        frac = np.clip(0.5 - sdf / dl_loc, 0, 1)
        grads = np.gradient(sdf, *cs, edge_order=1)
        gnorm = np.sqrt(sum(g**2 for g in grads)) + 1e-30
        w_n = (grads[ci] / gnorm) ** 2
        eps_in, eps_out = 4.0, 1.0
        eps_harm = 1.0 / (frac / eps_in + (1 - frac) / eps_out)
        deps_dfrac = (1 - w_n) * (eps_in - eps_out) \
            + w_n * eps_harm**2 * (1 / eps_out - 1 / eps_in)
        dfrac_dsdf = np.where(band, -1.0 / dl_loc, 0.0)
        vals = list(base[which]); vals[ax] += hh
        gp = td.Box(**{**{k: tuple(v) for k, v in base.items()},
                       which: tuple(vals)})
        vals = list(base[which]); vals[ax] -= hh
        gm = td.Box(**{**{k: tuple(v) for k, v in base.items()},
                       which: tuple(vals)})
        dsdf = (np.asarray(gp.sdf(X, Y, Z), float)
                - np.asarray(gm.sdf(X, Y, Z), float)) / (2 * hh)
        contrib = np.sum(g_native[c] * deps_dfrac * dfrac_dsdf * dsdf)
        print(c, "analytic chain contribution:", contrib)
        total3 += contrib
    print(f"(3) native-g x analytic chain  = {total3:.5e}")
    print("(1) full-J FD (from adjoint_check box): "
          "center0=-1.176e-2 size0=3.046e-2 size1=1.443e-2 size2=9.513e-2 "
          "center2=2.523e-3")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "center"
    ax = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    main(which, ax)
