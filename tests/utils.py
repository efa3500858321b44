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


# --------------------------------------------------------------------------- #
# emulated run (reference: tests/utils.py run_emulated:880) — synthetic data
# for every monitor without running the solver, for fast data-pipeline tests
# --------------------------------------------------------------------------- #

def run_emulated(simulation: td.Simulation, path: str = None,
                 **kwargs) -> td.SimulationData:
    """Produce a SimulationData with smooth synthetic values for each monitor."""
    from scipy.ndimage import gaussian_filter

    from tidy3d_tpu.components.data.data_array import (
        FluxDataArray,
        FluxTimeDataArray,
        ModeAmpsDataArray,
        ModeIndexDataArray,
        ScalarFieldDataArray,
        ScalarFieldTimeDataArray,
    )
    from tidy3d_tpu.components.data.monitor_data import (
        FieldData,
        FieldTimeData,
        FluxData,
        FluxTimeData,
        ModeData,
        PermittivityData,
    )
    from tidy3d_tpu.components.monitor import (
        FieldMonitor,
        FieldTimeMonitor,
        FluxMonitor,
        FluxTimeMonitor,
        ModeMonitor,
        PermittivityMonitor,
    )
    from tidy3d_tpu.solver.lowering_utils import slices_for_box, yee_coords

    rng = np.random.default_rng(1)
    grid = simulation.grid

    def smooth(shape, complex_=True):
        data = rng.random(shape)
        data = gaussian_filter(data, sigma=1.0)
        return (1 + 0.5j) * data if complex_ else data

    def field_coords(monitor, comp):
        _, coords = slices_for_box(grid, monitor, comp, extend=False)
        return coords

    def make_field(monitor, freqs=None, times=None):
        cmps = {}
        for comp in monitor.fields:
            coords = dict(field_coords(monitor, comp))
            shape = [len(coords[d]) for d in "xyz"]
            if freqs is not None:
                coords["f"] = np.asarray(freqs)
                arr = smooth(tuple(shape) + (len(freqs),))
                cmps[comp] = ScalarFieldDataArray(arr, coords=coords)
            else:
                coords = {"t": np.asarray(times), **coords}
                arr = smooth((len(times),) + tuple(shape), complex_=False)
                # data arrives (t, x, y, z); declare the dims so the
                # constructor transposes into the canonical (x, y, z, t)
                cmps[comp] = ScalarFieldTimeDataArray(
                    arr, coords=coords, dims=("t", "x", "y", "z"))
        return cmps

    tmesh = simulation.tmesh
    data_list = []
    for monitor in simulation.monitors:
        if isinstance(monitor, FieldMonitor):
            data_list.append(FieldData(
                monitor=monitor, **make_field(monitor, freqs=monitor.freqs)))
        elif isinstance(monitor, FieldTimeMonitor):
            times = tmesh[::max(int(monitor.interval or 1), 1)]
            data_list.append(FieldTimeData(
                monitor=monitor, **make_field(monitor, times=times)))
        elif isinstance(monitor, PermittivityMonitor):
            cmps = {}
            for comp in ("eps_xx", "eps_yy", "eps_zz"):
                field = "E" + comp[-1]
                coords = dict(field_coords(monitor, field))
                shape = [len(coords[d]) for d in "xyz"]
                coords["f"] = np.asarray(monitor.freqs)
                cmps[comp] = ScalarFieldDataArray(
                    smooth(tuple(shape) + (len(monitor.freqs),)), coords=coords)
            data_list.append(PermittivityData(monitor=monitor, **cmps))
        elif isinstance(monitor, FluxMonitor):
            f = np.asarray(monitor.freqs)
            data_list.append(FluxData(monitor=monitor, flux=FluxDataArray(
                np.real(smooth((len(f),))), coords=dict(f=f))))
        elif isinstance(monitor, FluxTimeMonitor):
            data_list.append(FluxTimeData(monitor=monitor, flux=FluxTimeDataArray(
                smooth((len(tmesh),), complex_=False), coords=dict(t=tmesh))))
        elif isinstance(monitor, ModeMonitor):
            f = np.asarray(monitor.freqs)
            nm = monitor.mode_spec.num_modes
            coords_amps = dict(direction=np.array(["+", "-"]), f=f,
                               mode_index=np.arange(nm))
            coords_n = dict(f=f, mode_index=np.arange(nm))
            data_list.append(ModeData(
                monitor=monitor,
                amps=ModeAmpsDataArray(smooth((2, len(f), nm)), coords=coords_amps),
                n_complex=ModeIndexDataArray(smooth((len(f), nm)), coords=coords_n)))
        else:
            continue

    sim_data = td.SimulationData(simulation=simulation, data=tuple(data_list))
    if path is not None:
        sim_data.to_file(path)
    return sim_data
