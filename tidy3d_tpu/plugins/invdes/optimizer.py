"""Adam optimizer driving an InverseDesign.

Behavioral model: /root/reference/tidy3d/plugins/invdes/optimizer.py
(AdamOptimizer:260 with history/serialization); backed here by optax.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pydantic

from ...components.base import Tidy3dBaseModel
from ...log import log
from .design import InverseDesign


class OptimizeResult(Tidy3dBaseModel):
    """Optimization history."""

    params: object = pydantic.Field(..., title="Final parameters")
    objective_history: Tuple[float, ...] = pydantic.Field((), title="Objective values")
    params_history: Tuple = pydantic.Field((), title="Parameter snapshots")

    @property
    def final_objective(self) -> float:
        return self.objective_history[-1] if self.objective_history else np.nan


class AdamOptimizer(Tidy3dBaseModel):
    """Adam gradient-ascent optimizer."""

    design: InverseDesign = pydantic.Field(..., title="Inverse design problem")
    learning_rate: pydantic.PositiveFloat = pydantic.Field(0.1)
    num_steps: pydantic.PositiveInt = pydantic.Field(10)
    beta1: float = pydantic.Field(0.9)
    beta2: float = pydantic.Field(0.999)
    eps: float = pydantic.Field(1e-8)
    store_history: bool = pydantic.Field(True)
    results_cache_fname: Optional[str] = pydantic.Field(None)

    def run(self, params0=None) -> OptimizeResult:
        import optax

        params = np.asarray(params0 if params0 is not None
                            else self.design.initial_parameters(), dtype=np.float32)
        optimizer = optax.adam(self.learning_rate, b1=self.beta1, b2=self.beta2,
                               eps=self.eps)
        opt_state = optimizer.init(params)
        history: List[float] = []
        snapshots = []
        for step in range(self.num_steps):
            value, grad = self.design.objective_fn(params)
            history.append(float(value))
            if self.store_history:
                snapshots.append(np.array(params))
            # gradient ASCENT on the objective
            updates, opt_state = optimizer.update(-np.asarray(grad, np.float32),
                                                  opt_state, params)
            params = np.clip(np.asarray(optax.apply_updates(params, updates)),
                             0.0, 1.0)
            log.info(f"invdes step {step + 1}/{self.num_steps}: J = {value:.4e}")
        result = OptimizeResult(params=params, objective_history=tuple(history),
                                params_history=tuple(snapshots))
        if self.results_cache_fname:
            np.savez(self.results_cache_fname, params=params,
                     objective_history=np.asarray(history))
        return result

    continue_run = run
