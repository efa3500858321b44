"""Dev: convergence order of interface reflection error vs dl for
staircasing vs polarized subpixel averaging (VERDICT item 7)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.web.run import run as web_run

FREQ0 = C_0 / 1.55
N2 = 3.0
D_SLAB = 0.337  # um, off-grid at every tested dl

# etalon reflectance of the slab (normal incidence)
_r12 = (1 - N2) / (1 + N2)
_r23 = (N2 - 1) / (N2 + 1)
_beta = 2 * np.pi * FREQ0 / C_0 * N2
_ph = np.exp(2j * _beta * D_SLAB)
R_ANALYTIC = abs((_r12 + _r23 * _ph) / (1 + _r12 * _r23 * _ph)) ** 2


def measure_R(dl, subpixel):
    Ly = 6.0
    Lx = 4 * dl
    # interface off-grid by a fixed fractional offset
    y_if = 0.5 + 0.37 * dl
    bspec = td.BoundarySpec(
        x=td.Boundary.periodic(), y=td.Boundary.pml(num_layers=12),
        z=td.Boundary.periodic())
    src = td.PlaneWave(center=(0, -1.5, 0), size=(td.inf, 0, td.inf),
                       source_time=td.GaussianPulse(freq0=FREQ0,
                                                    fwidth=FREQ0 / 6),
                       direction="+")
    mon_back = td.FluxMonitor(center=(0, -2.2, 0), size=(td.inf, 0, td.inf),
                              freqs=[FREQ0], name="back")
    mon_fwd = td.FluxMonitor(center=(0, -0.8, 0), size=(td.inf, 0, td.inf),
                             freqs=[FREQ0], name="fwd")
    half_space = td.Structure(
        geometry=td.Box(center=(0, y_if + D_SLAB / 2, 0),
                        size=(td.inf, D_SLAB, td.inf)),
        medium=td.Medium(permittivity=N2**2))

    kwargs = dict(
        center=(0, 0, 0), size=(Lx, Ly, 0), run_time=1.2e-13,
        sources=[src], monitors=[mon_back, mon_fwd],
        boundary_spec=bspec, grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=1e-7)
    data_ref = web_run(td.Simulation(subpixel=False, **kwargs),
                       verbose=False)
    p_inc = float(data_ref["fwd"].flux.values[0])
    data = web_run(td.Simulation(subpixel=subpixel,
                                 structures=[half_space], **kwargs),
                   verbose=False)
    p_back = float(data["back"].flux.values[0])
    return abs(p_back) / p_inc


def main():
    dls = [0.08, 0.04, 0.02]
    for subpixel in (False, True):
        errs = []
        for dl in dls:
            R = measure_R(dl, subpixel)
            err = abs(R - R_ANALYTIC)
            errs.append(err)
            print(f"subpixel={subpixel} dl={dl}: R={R:.5f} "
                  f"(exact {R_ANALYTIC:.5f}) err={err:.2e}")
        slope = np.polyfit(np.log(dls), np.log(np.maximum(errs, 1e-12)), 1)[0]
        print(f"  -> order = {slope:.2f}")


if __name__ == "__main__":
    main()
