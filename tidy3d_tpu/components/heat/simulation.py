"""Heat simulation specification + native steady-state solver.

Behavioral model: /root/reference/tidy3d/components/heat/simulation.py
(HeatSimulation:45; the reference's solver is cloud-side/unstructured-FEM).
Here a native structured finite-volume steady-state conduction solver is
provided (scipy sparse CG); the schema mirrors the reference so inputs carry
over.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pydantic
import scipy.sparse as sp
import scipy.sparse.linalg as spl

from ...exceptions import SetupError
from ...log import log
from ..base import cached_property
from ..data.data_array import SpatialDataArray
from ..geometry.base import Box
from ..grid.grid_spec import GridSpec
from ..medium import Medium, MediumType3D
from ..structure import Structure
from ..types import annotate_type
from .boundary import (
    ConvectionBC,
    HeatBoundarySpec,
    HeatFluxBC,
    SimulationBoundary,
    TemperatureBC,
)
from .data import HeatSimulationData, TemperatureData
from .heat_spec import SolidSpec
from .monitor import TemperatureMonitor
from .source import UniformHeatSource


class HeatSimulation(Box):
    """Steady-state heat conduction simulation."""

    medium: annotate_type(MediumType3D) = pydantic.Field(
        default_factory=Medium, title="Background medium")
    structures: Tuple[Structure, ...] = pydantic.Field((), title="Structures")
    boundary_spec: Tuple[HeatBoundarySpec, ...] = pydantic.Field(
        (), title="Boundary conditions")
    sources: Tuple[UniformHeatSource, ...] = pydantic.Field((), title="Heat sources")
    monitors: Tuple[TemperatureMonitor, ...] = pydantic.Field((), title="Monitors")
    grid_spec: GridSpec = pydantic.Field(default_factory=lambda: GridSpec.uniform(dl=1.0),
                                         title="Grid specification")
    symmetry: Tuple[int, int, int] = pydantic.Field((0, 0, 0))

    @cached_property
    def grid(self):
        sim_structure = Structure(
            geometry=Box(center=self.center, size=self.size), medium=self.medium)
        return self.grid_spec.make_grid(
            structures=[sim_structure] + list(self.structures))

    # ------------------------------------------------------------------ #
    # native solve
    # ------------------------------------------------------------------ #

    def run(self, verbose: bool = False) -> HeatSimulationData:
        """Solve div(k grad T) = -q with the configured BCs."""
        grid = self.grid
        xs = np.asarray(grid.centers.x)
        ys = np.asarray(grid.centers.y)
        zs = np.asarray(grid.centers.z)
        nx, ny, nz = len(xs), len(ys), len(zs)
        N = nx * ny * nz

        # conductivity map at cell centers (0 for fluids)
        k_map = np.zeros((nx, ny, nz))
        q_map = np.zeros((nx, ny, nz))
        bg_spec = getattr(self.medium, "heat_spec", None)
        if isinstance(bg_spec, SolidSpec):
            k_map[:] = bg_spec.conductivity
        xg, yg, zg = np.meshgrid(xs, ys, zs, indexing="ij", sparse=True)
        source_rates = {}
        for src in self.sources:
            for name in src.structures:
                source_rates[name] = src.rate
        for structure in self.structures:
            spec = getattr(structure.medium, "heat_spec", None)
            mask = structure.geometry.inside(xg, yg, zg)
            if isinstance(spec, SolidSpec):
                k_map = np.where(mask, spec.conductivity, k_map)
            else:
                k_map = np.where(mask, 0.0, k_map)
            if structure.name in source_rates:
                q_map = np.where(mask, source_rates[structure.name], q_map)

        dx = np.diff(np.asarray(grid.boundaries.x))
        dy = np.diff(np.asarray(grid.boundaries.y))
        dz = np.diff(np.asarray(grid.boundaries.z))

        # assemble 7-point FV Laplacian with harmonic-mean face conductivity
        def idx(i, j, k):
            return (i * ny + j) * nz + k

        rows, cols, vals = [], [], []
        rhs = np.zeros(N)

        # domain-boundary condition (one global spec supported natively)
        bc_temp = None
        bc_conv = None
        bc_flux = None
        for bc in self.boundary_spec:
            if isinstance(bc.placement, SimulationBoundary):
                if isinstance(bc.condition, TemperatureBC):
                    bc_temp = bc.condition.temperature
                elif isinstance(bc.condition, ConvectionBC):
                    bc_conv = bc.condition
                elif isinstance(bc.condition, HeatFluxBC):
                    bc_flux = bc.condition.flux
            else:
                log.warning("only SimulationBoundary placements are handled by "
                            "the native heat solver in this version; other "
                            "placements ignored.")

        steps = (dx, dy, dz)
        for i in range(nx):
            for j in range(ny):
                for k_ in range(nz):
                    p = idx(i, j, k_)
                    k_c = k_map[i, j, k_]
                    if k_c <= 0:
                        # fluid: pin to ambient/BC temperature
                        rows.append(p), cols.append(p), vals.append(1.0)
                        rhs[p] = bc_temp if bc_temp is not None else 300.0
                        continue
                    vol = dx[i] * dy[j] * dz[k_]
                    diag = 0.0
                    for axis, (ii, jj, kk) in enumerate(((1, 0, 0), (0, 1, 0),
                                                         (0, 0, 1))):
                        for sign in (-1, 1):
                            ni, nj, nk = i + sign * ii, j + sign * jj, k_ + sign * kk
                            in_domain = (0 <= ni < nx and 0 <= nj < ny
                                         and 0 <= nk < nz)
                            d_self = steps[axis][(i, j, k_)[axis]]
                            if in_domain:
                                k_n = k_map[ni, nj, nk]
                                if k_n <= 0:
                                    continue  # adiabatic to fluid
                                d_n = steps[axis][(ni, nj, nk)[axis]]
                                k_face = 2 * k_c * k_n / (k_c + k_n)
                                area = vol / d_self
                                g = k_face * area / (0.5 * (d_self + d_n))
                                q = idx(ni, nj, nk)
                                rows.append(p), cols.append(q), vals.append(-g)
                                diag += g
                            else:
                                area = vol / d_self
                                if bc_temp is not None:
                                    g = k_c * area / (0.5 * d_self)
                                    diag += g
                                    rhs[p] += g * bc_temp
                                elif bc_conv is not None:
                                    g = bc_conv.transfer_coeff * area
                                    diag += g
                                    rhs[p] += g * bc_conv.ambient_temperature
                                elif bc_flux is not None:
                                    rhs[p] += bc_flux * area
                                # else adiabatic
                    rows.append(p), cols.append(p), vals.append(diag if diag > 0
                                                                else 1.0)
                    rhs[p] += q_map[i, j, k_] * vol

        A = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))
        T, info = spl.cg(A, rhs, rtol=1e-8, maxiter=10000)
        if info != 0:
            T = spl.spsolve(A.tocsc(), rhs)
        T3 = T.reshape(nx, ny, nz)

        data = []
        for monitor in self.monitors:
            (i0, i1), (j0, j1), (k0, k1) = grid.discretize_inds(monitor)
            arr = SpatialDataArray(
                T3[i0:i1, j0:j1, k0:k1],
                coords=dict(x=xs[i0:i1], y=ys[j0:j1], z=zs[k0:k1]))
            data.append(TemperatureData(monitor=monitor, temperature=arr))
        return HeatSimulationData(simulation=self, data=tuple(data))
