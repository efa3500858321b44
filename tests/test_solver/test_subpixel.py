"""Subpixel-averaging schemes: selection changes the lowering, and the
polarized scheme beats staircasing in convergence order (VERDICT item 7;
reference schema subpixel_spec.py:15-117).

Observable: reflectance of an n=3 slab whose thickness is off-grid at
every tested resolution — staircasing quantizes the thickness (~1st
order), subpixel averaging recovers it (>1.2 order here, with several
times smaller absolute error).
"""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.solver.lowering import lower
from tidy3d_tpu.web.run import run as web_run

FREQ0 = C_0 / 1.55
N2 = 3.0
D_SLAB = 0.337

_r12 = (1 - N2) / (1 + N2)
_r23 = (N2 - 1) / (N2 + 1)
_ph = np.exp(2j * (2 * np.pi * FREQ0 / C_0 * N2) * D_SLAB)
R_ANALYTIC = abs((_r12 + _r23 * _ph) / (1 + _r12 * _r23 * _ph)) ** 2


def _measure_R(dl, subpixel):
    y_if = 0.5 + 0.37 * dl
    bspec = td.BoundarySpec(
        x=td.Boundary.periodic(), y=td.Boundary.pml(num_layers=12),
        z=td.Boundary.periodic())
    kwargs = dict(
        center=(0, 0, 0), size=(4 * dl, 6.0, 0), run_time=1.2e-13,
        sources=[td.PlaneWave(center=(0, -1.5, 0), size=(td.inf, 0, td.inf),
                              source_time=td.GaussianPulse(
                                  freq0=FREQ0, fwidth=FREQ0 / 6),
                              direction="+")],
        monitors=[
            td.FluxMonitor(center=(0, -2.2, 0), size=(td.inf, 0, td.inf),
                           freqs=[FREQ0], name="back"),
            td.FluxMonitor(center=(0, -0.8, 0), size=(td.inf, 0, td.inf),
                           freqs=[FREQ0], name="fwd"),
        ],
        boundary_spec=bspec, grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=1e-7)
    slab = td.Structure(
        geometry=td.Box(center=(0, y_if + D_SLAB / 2, 0),
                        size=(td.inf, D_SLAB, td.inf)),
        medium=td.Medium(permittivity=N2**2))
    p_inc = float(web_run(td.Simulation(subpixel=False, **kwargs),
                          verbose=False)["fwd"].flux.values[0])
    data = web_run(td.Simulation(subpixel=subpixel, structures=[slab],
                                 **kwargs), verbose=False)
    return abs(float(data["back"].flux.values[0])) / p_inc


def test_polarized_convergence_order_beats_staircasing():
    dls = [0.08, 0.04, 0.02]
    errs = {}
    for subpixel in (False, True):
        errs[subpixel] = [abs(_measure_R(dl, subpixel) - R_ANALYTIC)
                          for dl in dls]
    order = {k: np.polyfit(np.log(dls), np.log(np.maximum(v, 1e-12)), 1)[0]
             for k, v in errs.items()}
    # measured on this setup: staircase ~0.8, polarized ~1.5
    assert order[True] > 1.2, (order, errs)
    assert order[False] < 1.2, (order, errs)
    assert errs[True][-1] < errs[False][-1] / 3, errs


def _eps_max_offgrid(sim):
    plan = lower(sim)
    from tidy3d_tpu.solver.fdtd import FDTDRunner

    runner = FDTDRunner(plan)
    cb = np.broadcast_to(np.asarray(runner.consts["coeffs_E"]["Ez"][1]),
                         plan.shape)
    from tidy3d_tpu.constants import EPSILON_0

    return (plan.dt / EPSILON_0) / cb


def test_scheme_selection_changes_lowering():
    """Staircasing / polarized / volumetric produce genuinely different
    eps arrays (the round-1 gap: schemes were accepted but silently
    lowered to polarized, PARITY.md:128)."""
    from tidy3d_tpu.components.subpixel_spec import (
        PolarizedAveraging,
        Staircasing,
        SubpixelSpec,
        VolumetricAveraging,
    )

    def build(spec):
        return td.Simulation(
            center=(0, 0, 0), size=(2, 2, 2), run_time=1e-14,
            sources=[td.PointDipole(
                center=(0, 0, 0),
                source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
                polarization="Ez")],
            structures=[td.Structure(
                geometry=td.Sphere(center=(0.11, 0.07, -0.13), radius=0.53),
                medium=td.Medium(permittivity=6.0))],
            boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=6)),
            grid_spec=td.GridSpec.uniform(dl=0.1), subpixel=spec)

    eps = {}
    for name, scheme in (("stair", Staircasing()),
                         ("pol", PolarizedAveraging()),
                         ("vol", VolumetricAveraging())):
        eps[name] = _eps_max_offgrid(build(SubpixelSpec(dielectric=scheme)))
    assert not np.allclose(eps["stair"], eps["pol"])
    assert not np.allclose(eps["pol"], eps["vol"])
    assert not np.allclose(eps["stair"], eps["vol"])
    # interface cells of the volumetric scheme are strict volume fractions:
    # values between the two media appear
    mid = (eps["vol"] > 1.5) & (eps["vol"] < 5.5)
    assert np.any(mid)


def test_pec_conformal_scheme():
    """PECConformal changes the lowering vs heuristic staircasing and
    reduces the time step by its timestep_reduction."""
    from tidy3d_tpu.components.subpixel_spec import (
        HeuristicPECStaircasing,
        PECConformal,
        SubpixelSpec,
    )

    def build(pec_scheme):
        return td.Simulation(
            center=(0, 0, 0), size=(2, 2, 2), run_time=1e-14,
            sources=[td.PointDipole(
                center=(0, 0, 0.6),
                source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5),
                polarization="Ez")],
            structures=[td.Structure(
                geometry=td.Sphere(center=(0.11, 0.07, -0.33), radius=0.41),
                medium=td.PECMedium())],
            boundary_spec=td.BoundarySpec.all_sides(td.PML(num_layers=6)),
            grid_spec=td.GridSpec.uniform(dl=0.1),
            subpixel=SubpixelSpec(pec=pec_scheme))

    sim_h = build(HeuristicPECStaircasing())
    sim_c = build(PECConformal(timestep_reduction=0.3))
    assert sim_c.dt == pytest.approx(sim_h.dt * 0.7, rel=1e-6)
    eps_h = _eps_max_offgrid(sim_h)
    eps_c = _eps_max_offgrid(sim_c)
    assert not np.allclose(eps_h, eps_c)
