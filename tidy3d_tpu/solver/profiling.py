"""First-class performance telemetry for solver runs.

The reference's only runtime telemetry is the server-reported
``RunInfo(perc_done, field_decay)`` poll (SURVEY §5 — tidy3d
web/api/webapi.py:296). Here the solver is local, so throughput counters and
device profiler traces are part of the run itself:

* every run records a :class:`RunMetrics` (Gcell·steps/s, wall/transfer
  times, per-step cost) — surfaced in the SimulationData log;
* set ``TIDY3D_TPU_PROFILE=/path/to/dir`` to capture a JAX/XLA device trace
  of the run for TensorBoard's profiler plugin.
"""

from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass, field


@dataclass
class RunMetrics:
    """Throughput counters for one solver execution."""

    num_cells: int = 0
    steps_run: int = 0
    wall_time: float = 0.0
    transfer_time: float = 0.0
    compile_time: float = 0.0
    final_decay: float = 1.0

    @property
    def gcell_steps_per_s(self) -> float:
        if self.wall_time <= 0:
            return 0.0
        return self.num_cells * self.steps_run / self.wall_time / 1e9

    @property
    def ms_per_step(self) -> float:
        if self.steps_run == 0:
            return 0.0
        return self.wall_time / self.steps_run * 1e3

    def log_lines(self) -> list:
        return [
            f"throughput: {self.gcell_steps_per_s:.3f} Gcell*steps/s",
            f"steps: {self.steps_run} ({self.ms_per_step:.3f} ms/step)",
            f"wall time: {self.wall_time:.3f} s "
            f"(+{self.transfer_time:.3f} s result transfer, "
            f"+{self.compile_time:.3f} s compile)",
            f"final field decay: {self.final_decay:.2e}",
        ]

    @classmethod
    def from_runner(cls, runner) -> "RunMetrics":
        import numpy as np

        return cls(
            num_cells=int(np.prod(runner.shape)),
            steps_run=getattr(runner, "steps_run", 0),
            wall_time=getattr(runner, "wall_time", 0.0),
            transfer_time=getattr(runner, "transfer_time", 0.0),
            compile_time=getattr(runner, "compile_time", 0.0),
            final_decay=getattr(runner, "final_decay", 1.0),
        )


@contextlib.contextmanager
def maybe_profile():
    """JAX device-trace context, enabled by TIDY3D_TPU_PROFILE=<dir>."""
    trace_dir = os.environ.get("TIDY3D_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
