"""InverseDesign: bundles simulation + design region + objective.

Behavioral model: /root/reference/tidy3d/plugins/invdes/design.py
(InverseDesign:118). The gradient backend is exact reverse-mode AD through
the native solver (plugins/adjoint/topology.py) rather than the reference's
two-cloud-solve adjoint.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import pydantic

from ...components.base import Tidy3dBaseModel, cached_property
from ...components.simulation import Simulation
from ...components.types import Direction
from ...exceptions import SetupError
from .region import TopologyDesignRegion


class InverseDesign(Tidy3dBaseModel):
    """An inverse-design problem definition."""

    simulation: Simulation = pydantic.Field(..., title="Base simulation")
    design_region: TopologyDesignRegion = pydantic.Field(..., title="Design region")
    output_monitor_name: str = pydantic.Field(
        ..., title="Objective monitor name",
        description="ModeMonitor whose |amp|^2 is maximized (custom objectives "
        "via the metric field).")
    direction: Direction = pydantic.Field("+", title="Objective mode direction")
    mode_index: int = pydantic.Field(0, title="Objective mode index")
    task_name: str = pydantic.Field("invdes", title="Task name")
    verbose: bool = pydantic.Field(False)
    method: str = pydantic.Field(
        "adjoint", title="Gradient method",
        description="'adjoint': two forward solves on the fast kernel path "
        "(CustomMedium per-cell VJPs through run_structure_gradients — the "
        "production route, both solves ride the Pallas kernels); "
        "'autodiff': exact reverse-mode jax.grad through the checkpointed "
        "time loop (XLA kernel path; research/verification route).")

    @pydantic.field_validator("method")
    @classmethod
    def _check_method(cls, val):
        if val not in ("adjoint", "autodiff"):
            raise ValueError("method must be 'adjoint' or 'autodiff'")
        return val

    @cached_property
    def _topology(self):
        from ..adjoint import TopologyObjective

        eps_min, eps_max = self.design_region.eps_bounds
        return TopologyObjective(
            self.simulation, self.design_region.geometry,
            eps_min=eps_min, eps_max=eps_max,
            mode_monitor_name=self.output_monitor_name,
            direction=self.direction, mode_index=self.mode_index,
        )

    @cached_property
    def _dl(self) -> float:
        sizes = self.simulation.grid.sizes
        return float(np.min([np.min(np.asarray(s)) for s in sizes.to_list[:2]]))

    def _density_value_and_grad_adjoint(self, density):
        """(value, dJ/d density) via TWO forward solves on the fast kernel
        path: the design realized as a CustomMedium structure, mode-amp
        objective differentiated through the adjoint-simulation protocol
        (web.autograd.run_structure_gradients), per-cell gradients from
        CustomMedium.compute_derivatives. Both solves are ordinary forward
        runs — no AD tracing, so the Pallas kernels stay engaged (the
        reference's two-cloud-solve architecture, autograd/autograd.py:86,
        mapped to in-process execution)."""
        import jax.numpy as jnp

        from ...web.autograd import run_structure_gradients

        structure = self.design_region.to_structure(
            np.asarray(density), self.simulation)
        sim2 = self.simulation.copy(update=dict(
            structures=tuple(self.simulation.structures) + (structure,)))
        si = len(sim2.structures) - 1
        name = self.output_monitor_name
        dir_idx = list("+-").index(self.direction)
        mode_idx = self.mode_index

        def obj(fields):
            amps = fields[name]["amps"]  # (direction, f, mode_index)
            sel = amps[dir_idx, :, mode_idx]
            return jnp.sum(jnp.abs(sel) ** 2)

        value, grads, _ = run_structure_gradients(
            sim2, obj, {si: [("medium", "permittivity")]},
            monitor_names=[name])
        eps_min, eps_max = self.design_region.eps_bounds
        g_eps = grads[si][("medium", "permittivity")]
        return float(value), (eps_max - eps_min) * np.asarray(g_eps)

    def objective_fn(self, params) -> Tuple[float, np.ndarray]:
        """(value, gradient wrt raw params): maximize |amp|^2 - penalties."""
        import jax
        import jax.numpy as jnp

        region = self.design_region

        density, vjp_fn = jax.vjp(
            lambda p: region.transform(p, dl=self._dl), jnp.asarray(params))
        if self.method == "adjoint":
            value, grad_density = self._density_value_and_grad_adjoint(
                np.asarray(density))
        else:
            value, grad_density = self._topology.value_and_grad(
                np.asarray(density))
        (grad_params,) = vjp_fn(jnp.asarray(grad_density, jnp.float32))
        penalty_val = 0.0
        if region.penalty_weight > 0:
            pen_val, pen_grad = jax.value_and_grad(
                lambda p: region.penalty(p, dl=self._dl))(jnp.asarray(params))
            penalty_val = float(pen_val)
            grad_params = grad_params - pen_grad
        return value - penalty_val, np.asarray(grad_params)

    def initial_parameters(self) -> np.ndarray:
        return self.design_region.initial_parameters(self.simulation)

    def to_simulation(self, params) -> Simulation:
        """Simulation with the design structure realized from params."""
        density = np.asarray(self.design_region.transform(params, dl=self._dl))
        structure = self.design_region.to_structure(density, self.simulation)
        return self.simulation.copy(update=dict(
            structures=tuple(self.simulation.structures) + (structure,)))
