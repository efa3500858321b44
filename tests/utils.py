"""Shared test helpers."""

import numpy as np

import tidy3d_tpu as td
from tidy3d_tpu.components.boundary import Boundary, BoundarySpec, PML, Periodic
from tidy3d_tpu.components.geometry.base import Box
from tidy3d_tpu.components.grid.grid_spec import GridSpec
from tidy3d_tpu.components.medium import Medium
from tidy3d_tpu.components.monitor import FieldMonitor, FieldTimeMonitor, FluxMonitor
from tidy3d_tpu.components.simulation import Simulation
from tidy3d_tpu.components.source import GaussianPulse, PointDipole
from tidy3d_tpu.components.structure import Structure
from tidy3d_tpu.constants import C_0

WVL = 1.5
FREQ0 = C_0 / WVL
FWIDTH = FREQ0 / 5


def make_sim_2d(size=6.0, dl=0.1, run_time=2.5e-14, monitors=(), structures=(),
                sources=None, **kwargs):
    """Small 2D testing simulation (z-periodic single cell)."""
    if sources is None:
        sources = [PointDipole(center=(0, 0, 0),
                               source_time=GaussianPulse(freq0=FREQ0, fwidth=FWIDTH),
                               polarization="Ez")]
    return Simulation(
        center=(0, 0, 0), size=(size, size, 0), run_time=run_time,
        sources=sources, monitors=monitors, structures=structures,
        boundary_spec=BoundarySpec(x=Boundary.pml(), y=Boundary.pml(),
                                   z=Boundary.periodic()),
        grid_spec=GridSpec.uniform(dl=dl), **kwargs,
    )


def make_sim_3d(size=2.5, run_time=2.5e-14, monitors=(), structures=(),
                min_steps_per_wvl=8, **kwargs):
    return Simulation(
        center=(0, 0, 0), size=(size, size, size), run_time=run_time,
        sources=[PointDipole(center=(0, 0, 0),
                             source_time=GaussianPulse(freq0=FREQ0, fwidth=FWIDTH),
                             polarization="Ez")],
        monitors=monitors, structures=structures,
        boundary_spec=BoundarySpec.all_sides(PML()),
        grid_spec=GridSpec.auto(min_steps_per_wvl=min_steps_per_wvl), **kwargs,
    )
