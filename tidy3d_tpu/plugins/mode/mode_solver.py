"""ModeSolver: user-facing mode solving on a plane of a Simulation.

Behavioral model: /root/reference/tidy3d/plugins/mode/mode_solver.py
(ModeSolver:97 — plane discretization, per-freq solve loop, eps construction
on the Yee cross-section, normalization, group index, to_source/to_monitor).

The local coordinate frame maps the plane normal axis ``a`` to the solver's
propagation axis, with in-plane axes in cyclic order (b, c) = (a+1, a+2) mod
3 — the same convention as flux/overlap integrals, so the global Yee
staggering restricts to the solver's local staggering exactly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np
import pydantic

from ...components.base import Tidy3dBaseModel, cached_property
from ...components.data.data_array import (
    FreqDataArray,
    GroupIndexDataArray,
    ModeIndexDataArray,
    ScalarModeFieldDataArray,
)
from ...components.data.dataset import ModeSolverDataset
from ...components.data.monitor_data import ModeSolverData, _mode_overlaps
from ...components.geometry.base import Box
from ...components.mode import ModeSpec
from ...components.monitor import ModeMonitor, ModeSolverMonitor
from ...components.simulation import Simulation
from ...components.source import GaussianPulse, ModeSource, SourceTime
from ...components.types import Direction, FreqArray, annotate_type
from ...constants import C_0
from ...exceptions import SetupError, ValidationError
from ...log import log
from .solver import compute_modes

# fraction of cells under which we warn the plane is too coarse
MIN_PLANE_CELLS_WARN = 4


class ModeSolver(Tidy3dBaseModel):
    """Solves for the eigenmodes of a plane cross-section of a simulation."""

    simulation: Simulation = pydantic.Field(..., title="Simulation")
    plane: Box = pydantic.Field(..., title="Plane")
    mode_spec: ModeSpec = pydantic.Field(default_factory=ModeSpec, title="Mode specification")
    freqs: FreqArray = pydantic.Field(..., title="Frequencies")
    direction: Direction = pydantic.Field("+", title="Propagation direction")
    colocate: bool = pydantic.Field(True, title="Colocate fields")

    @pydantic.field_validator("plane")
    @classmethod
    def _plane_is_planar(cls, val):
        if tuple(val.size).count(0.0) != 1:
            raise ValidationError(f"ModeSolver plane must be planar, given size={val.size}")
        return val

    @cached_property
    def normal_axis(self) -> int:
        return tuple(self.plane.size).index(0.0)

    @cached_property
    def plane_axes(self) -> Tuple[int, int]:
        a = self.normal_axis
        return ((a + 1) % 3, (a + 2) % 3)

    @cached_property
    def solver_symmetry(self) -> Tuple[int, int]:
        return (0, 0)

    # ------------------------------------------------------------------ #
    # grid / eps construction
    # ------------------------------------------------------------------ #

    @cached_property
    def _plane_grid(self):
        """In-plane cell boundary coords (b_axis, c_axis) within the plane."""
        grid = self.simulation.grid
        b, c = self.plane_axes
        span = grid.discretize_inds(self.plane, extend=False)
        out = []
        for axis in (b, c):
            beg, end = span[axis]
            coords = np.asarray(grid.boundaries.to_list[axis])[beg:end + 1]
            if len(coords) < MIN_PLANE_CELLS_WARN:
                log.warning("mode plane has very few cells along axis "
                            f"{'xyz'[axis]}; increase plane size or resolution.")
            out.append(coords)
        return tuple(out)

    def _comp_coords(self, comp_local: str):
        """Global (x, y, z) coords of a local Yee component on the plane."""
        a = self.normal_axis
        b, c = self.plane_axes
        x_b, y_b = self._plane_grid
        centers_b = 0.5 * (x_b[1:] + x_b[:-1])
        centers_c = 0.5 * (y_b[1:] + y_b[:-1])
        pos_normal = self.plane.center[a]
        # local component positions: Ex at (cx, y), Ey at (x, cy), Ez at (x, y)
        # Hx at (x, cy), Hy at (cx, y), Hz at (cx, cy)
        local_positions = {
            "Ex": (centers_b, y_b[:-1]), "Ey": (x_b[:-1], centers_c),
            "Ez": (x_b[:-1], y_b[:-1]),
            "Hx": (x_b[:-1], centers_c), "Hy": (centers_b, y_b[:-1]),
            "Hz": (centers_b, centers_c),
        }
        pb, pc = local_positions[comp_local]
        coords = [None, None, None]
        coords[a] = np.array([pos_normal])
        coords[b] = pb
        coords[c] = pc
        return coords

    def _solver_eps(self, freq: float):
        """(eps_xx, eps_yy, eps_zz) in local axes at the local Yee points."""
        a = self.normal_axis
        b, c = self.plane_axes
        eps_out = []
        for local_comp, global_axis in (("Ex", b), ("Ey", c), ("Ez", a)):
            coords = self._comp_coords(local_comp)
            eps = self.simulation._eps_on_grid_points(
                coords[0], coords[1], coords[2], freq, global_axis)
            # reduce to local 2D (squeeze the normal axis, order (b, c))
            eps2d = np.squeeze(eps, axis=a)
            if b > c:
                eps2d = eps2d.T
            eps_out.append(eps2d)
        return tuple(eps_out)

    # ------------------------------------------------------------------ #
    # solving
    # ------------------------------------------------------------------ #

    @cached_property
    def data_raw(self) -> ModeSolverData:
        """Solve and return un-colocated mode data."""
        x_b, y_b = self._plane_grid
        freqs = np.atleast_1d(np.asarray(self.freqs, dtype=float))
        num_modes = self.mode_spec.num_modes
        a = self.normal_axis
        b, c = self.plane_axes

        field_arrays = {comp: [] for comp in ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz")}
        n_complex = np.zeros((len(freqs), num_modes), dtype=complex)

        # map local solver components back to global components
        local_to_global = {
            "Ex": f"E{'xyz'[b]}", "Ey": f"E{'xyz'[c]}", "Ez": f"E{'xyz'[a]}",
            "Hx": f"H{'xyz'[b]}", "Hy": f"H{'xyz'[c]}", "Hz": f"H{'xyz'[a]}",
        }

        for fi, freq in enumerate(freqs):
            eps_cross = self._solver_eps(freq)
            fields, n_c = compute_modes(
                eps_cross, (x_b, y_b), freq, self.mode_spec,
                direction=self.direction,
            )
            nm = min(len(n_c), num_modes)
            n_complex[fi, :nm] = n_c[:nm]
            fields = self._normalize_modes(fields, n_c, freq, x_b, y_b)
            for local_comp, arr in fields.items():
                field_arrays[local_to_global[local_comp]].append(arr[:, :, :num_modes])

        # assemble DataArrays with global coords
        data_fields = {}
        for local_comp, global_comp in local_to_global.items():
            stack = np.stack(field_arrays[global_comp], axis=2)  # (nb, nc, nf, nm)
            coords = self._comp_coords(local_comp)
            # expand to (x, y, z, f, mode_index) in global order
            arr = stack[..., None, :, :] if False else stack
            # current dims: (b, c, f, m); insert normal singleton and reorder
            arr = np.expand_dims(arr, axis=2)  # (b, c, 1, f, m)
            # build axis order mapping local (b, c, a) -> global (x, y, z)
            perm = np.argsort([b, c, a])  # positions of sorted global axes
            arr = np.transpose(arr, tuple(perm) + (3, 4))
            coord_dict = {
                "xyz"[axis]: np.asarray(coords[axis]) for axis in range(3)
            }
            coord_dict["f"] = freqs
            coord_dict["mode_index"] = np.arange(num_modes)
            data_fields[global_comp] = ScalarModeFieldDataArray(
                arr, coords={k: coord_dict[k] for k in ("x", "y", "z", "f",
                                                        "mode_index")})

        n_da = ModeIndexDataArray(
            n_complex, coords=dict(f=freqs, mode_index=np.arange(num_modes)))

        monitor = ModeSolverMonitor(
            center=self.plane.center, size=self.plane.size,
            freqs=freqs.tolist(), mode_spec=self.mode_spec,
            direction=self.direction, name="<mode_solver>", colocate=False,
        )
        data = ModeSolverData(monitor=monitor, n_complex=n_da, **data_fields)

        if self.mode_spec.track_freq is not None and len(freqs) > 1:
            data = data.overlap_sort(self.mode_spec.track_freq)
        if self.mode_spec.group_index_step:
            data = self._add_group_index(data)
        return data

    def _normalize_modes(self, fields, n_c, freq, x_b, y_b):
        """Normalize each mode to unit power flux along the normal."""
        # local flux: S_z = Ex Hy* - Ey Hx* integrated over the plane with
        # cell-overlap weights (fields at slightly different Yee points; use
        # simple colocation-free Riemann sum adequate for normalization)
        wx = np.diff(x_b)
        wy = np.diff(y_b)
        nmodes = fields["Ex"].shape[-1]
        for m in range(nmodes):
            sz = np.real(
                fields["Ex"][:, :, m] * np.conj(fields["Hy"][:, :, m])
                - fields["Ey"][:, :, m] * np.conj(fields["Hx"][:, :, m]))
            power = 0.5 * float(np.sum(sz * wx[:, None] * wy[None, :]))
            if abs(power) < 1e-30:
                continue
            scale = 1.0 / np.sqrt(abs(power))
            phase = 1.0
            # fix global phase: make the dominant E component real-positive
            # at its max |value| location
            e_all = np.stack([fields[c][:, :, m] for c in ("Ex", "Ey")])
            idx = np.unravel_index(np.argmax(np.abs(e_all)), e_all.shape)
            val = e_all[idx]
            if abs(val) > 0:
                phase = np.abs(val) / val
            for comp in fields:
                fields[comp][:, :, m] *= scale * phase
        return fields

    def _add_group_index(self, data: ModeSolverData) -> ModeSolverData:
        """3-point finite-difference group index n_g = n - lam dn/dlam."""
        step = float(self.mode_spec.group_index_step)
        freqs = np.atleast_1d(np.asarray(self.freqs, dtype=float))
        n_g = np.zeros((len(freqs), self.mode_spec.num_modes))
        for fi, f0 in enumerate(freqs):
            fp, fm = f0 * (1 + step), f0 * (1 - step)
            solver_pm = self.copy(update=dict(
                freqs=[fm, fp],
                mode_spec=self.mode_spec.copy(update=dict(group_index_step=False)),
            ))
            n_pm = solver_pm.data_raw.n_complex.values
            n0 = data.n_complex.values[fi]
            # n_g = d(f n)/df
            n_g[fi] = np.real(
                (fp * n_pm[1] - fm * n_pm[0]) / (fp - fm))
        return data.copy(update=dict(n_group_raw=GroupIndexDataArray(
            n_g, coords=dict(f=freqs, mode_index=np.arange(self.mode_spec.num_modes)))))

    @cached_property
    def data(self) -> ModeSolverData:
        """Mode data, colocated to the plane grid boundaries if requested."""
        data = self.data_raw
        if not self.colocate:
            return data
        # colocate fields onto the in-plane boundary positions
        x_b, y_b = self._plane_grid
        a = self.normal_axis
        b, c = self.plane_axes
        targets = {"xyz"[b]: x_b[:-1], "xyz"[c]: y_b[:-1]}
        update = {}
        for comp, arr in data.field_components.items():
            update[comp] = ScalarModeFieldDataArray(
                arr.interp(coords=targets, kwargs=dict(fill_value=None)).values,
                coords={**{d: (targets[d] if d in targets else arr.coords[d])
                           for d in ("x", "y", "z")},
                        "f": arr.coords["f"], "mode_index": arr.coords["mode_index"]},
            )
        return data.copy(update=update)

    def solve(self) -> ModeSolverData:
        return self.data

    # ------------------------------------------------------------------ #
    # exports
    # ------------------------------------------------------------------ #

    def to_source(self, source_time: SourceTime, direction: Direction = None,
                  mode_index: int = 0, **kwargs) -> ModeSource:
        return ModeSource(
            center=self.plane.center, size=self.plane.size,
            source_time=source_time, mode_spec=self.mode_spec,
            mode_index=mode_index,
            direction=direction or self.direction, **kwargs,
        )

    def to_monitor(self, freqs=None, name: str = "mode_monitor", **kwargs) -> ModeMonitor:
        freqs = freqs if freqs is not None else list(np.asarray(self.freqs))
        return ModeMonitor(
            center=self.plane.center, size=self.plane.size,
            freqs=list(np.asarray(freqs)), mode_spec=self.mode_spec, name=name,
            **kwargs,
        )

    @cached_property
    def reduced_simulation_copy(self) -> "ModeSolver":
        """Solver with the simulation cropped to the plane surroundings."""
        new_sim = self.simulation.subsection(self.plane)
        return self.copy(update=dict(simulation=new_sim))
