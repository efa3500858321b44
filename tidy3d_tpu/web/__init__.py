"""Local TPU execution with the reference web-API surface
(reference: tidy3d/web/__init__.py exports run/upload/monitor/load/Job/Batch)."""

from .run import run
from .container import Batch, BatchData, Job
from .asynchronous import run_async
from .api import abort, delete, delete_old, estimate_cost, load, monitor, real_cost, start, upload

__all__ = [
    "run", "run_async", "Job", "Batch", "BatchData",
    "upload", "start", "monitor", "load", "estimate_cost", "real_cost",
    "abort", "delete", "delete_old",
]
