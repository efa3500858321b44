"""Multi-host / multi-slice execution (SURVEY §2.2 P4, §5 comm backend).

The reference scales across machines with MPI/NCCL process groups managed by
its cloud scheduler (SURVEY §2.2 P4: "comm transport"). The TPU-native
equivalent is the JAX distributed runtime: one Python process per host, all
hosts joined through ``jax.distributed.initialize``, and a single global
``jax.sharding.Mesh`` spanning every chip. Collectives ride ICI inside a
slice and DCN between slices — the solver code itself is unchanged (the
same ``shard_map`` x-ring of ``lax.ppermute`` halo exchanges), only device
placement differs.

Design notes (How-to-Scale-Your-Model recipe):

* The FDTD x-decomposition is a 1D nearest-neighbour ring. The only
  communication is the per-group halo ``ppermute``, so the mesh's "gx"
  axis must be laid out so ring neighbours are physically adjacent:
  ICI-linked inside a slice, with as few DCN hops as possible between.
* :func:`ring_device_order` therefore sorts devices into contiguous
  per-slice segments (slice boundaries = the ONLY DCN crossings: exactly
  ``n_slices`` of the ``n_devices`` ring edges, the minimum possible for a
  ring over multiple slices), and snakes through the intra-slice torus so
  consecutive devices share an ICI link.
* Halo volume per edge is tiny (k-wide x-slabs: ``2*k*ny*nz*9`` floats
  per group) and latency-bound; DCN latency is hidden behind the interior
  compute of each group, which scales with the much larger shard volume.

Single-host usage is unchanged — these helpers degrade to the local
device list when the distributed runtime is not initialized.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax

from ..log import log
from .sharding import AXIS_NAMES, Mesh, ShardingPlan

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Join this process to the JAX distributed runtime (idempotent).

    On Cloud TPU pods ``jax.distributed.initialize()`` autodetects every
    argument from the TPU metadata server, so a bare ``initialize()`` in
    each host process is enough. Elsewhere (CPU/GPU fleets, manual pods)
    pass the coordinator explicitly or set the environment variables
    ``TIDY3D_TPU_COORDINATOR``, ``TIDY3D_TPU_NUM_PROCESSES``,
    ``TIDY3D_TPU_PROCESS_ID``.

    Returns True when the distributed runtime is (now) initialized,
    False when running single-process with no coordinator configured.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "TIDY3D_TPU_COORDINATOR")
    if num_processes is None and "TIDY3D_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TIDY3D_TPU_NUM_PROCESSES"])
    if process_id is None and "TIDY3D_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TIDY3D_TPU_PROCESS_ID"])

    on_tpu_pod = False
    try:
        on_tpu_pod = jax.devices()[0].platform == "tpu"
    except Exception:
        pass
    if coordinator_address is None and not on_tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
        _initialized = True
        log.info(
            f"distributed runtime up: process {jax.process_index()} / "
            f"{jax.process_count()}, {jax.device_count()} global devices "
            f"({jax.local_device_count()} local)")
        return True
    except Exception as exc:  # already initialized / single process
        if "already" in str(exc).lower():
            _initialized = True
            return True
        log.warning(f"jax.distributed.initialize failed: {exc}")
        return False


def _slice_index(dev) -> int:
    return getattr(dev, "slice_index", 0) or 0


def _coords(dev) -> Tuple[int, ...]:
    c = getattr(dev, "coords", None)
    if c is None:
        return (getattr(dev, "id", 0),)
    return tuple(c)


def ring_device_order(devices: Optional[Sequence] = None) -> list:
    """Order devices so a 1D ring decomposition maps to the interconnect.

    Segments the device list by ``slice_index`` (each slice contributes
    one contiguous run, so a ring crosses DCN exactly once per slice
    boundary — the minimum), and snakes through each slice's chip
    coordinates so consecutive ring entries share an ICI link: sorted by
    (y, z) with x traversed in alternating direction per (y, z) row.
    """
    devices = list(devices if devices is not None else jax.devices())
    # devices without chip coords (CPU/virtual) group by process instead
    have_coords = any(getattr(d, "coords", None) is not None
                      for d in devices)

    def key(dev):
        x, y, z = (tuple(_coords(dev)) + (0, 0, 0))[:3]
        snake_x = -x if (y + z) % 2 else x
        proc = 0 if have_coords else getattr(dev, "process_index", 0)
        return (_slice_index(dev), proc, z, y, snake_x)

    return sorted(devices, key=key)


def make_global_mesh(decomp: Optional[Tuple[int, int, int]] = None,
                     devices: Optional[Sequence] = None
                     ) -> Tuple[Mesh, Tuple[int, int, int]]:
    """A device mesh over ALL processes' devices, ring-ordered on "gx".

    Defaults to the x-only decomposition ``(n_global_devices, 1, 1)`` —
    the layout the sharded k-step kernel rides. For 2D/3D decompositions
    the gx axis still gets the ring-contiguous ordering (it carries the
    halo ppermute traffic); gy/gz split within segments.
    """
    ordered = ring_device_order(devices)
    n = len(ordered)
    if decomp is None:
        decomp = (n, 1, 1)
    need = int(np.prod(decomp))
    if need < n:
        # explicit decomposition smaller than the fleet: use a
        # ring-contiguous prefix (stays within as few slices as possible)
        ordered = ordered[:need]
    elif need > n:
        raise ValueError(
            f"decomposition {decomp} needs {need} devices, "
            f"only {n} available")
    dev_array = np.array(ordered, dtype=object).reshape(decomp)
    return Mesh(dev_array, AXIS_NAMES), decomp


def sharding_plan_from_env(plan_shape: Tuple[int, int, int]
                           ) -> Optional[ShardingPlan]:
    """Build a ShardingPlan from ``TIDY3D_TPU_SHARD``.

    Values: unset/"" /"0" -> None (single-device run, the default);
    "auto" -> x-decomposition over all global devices; "dx,dy,dz" ->
    explicit decomposition. Multi-host runs also call :func:`initialize`
    first (no-op single-host).
    """
    val = os.environ.get("TIDY3D_TPU_SHARD", "").strip()
    if val in ("", "0", "none"):
        return None
    initialize()
    if val == "auto":
        decomp = None
    else:
        parts = tuple(int(v) for v in val.split(","))
        decomp = parts + (1,) * (3 - len(parts))
    mesh, decomp = make_global_mesh(decomp)
    if int(np.prod(decomp)) == 1:
        return None
    # refuse decompositions the grid can't carry
    for ax in range(3):
        if decomp[ax] > 1 and plan_shape[ax] < 2 * decomp[ax]:
            log.warning(
                f"TIDY3D_TPU_SHARD={val}: axis {ax} too small for "
                f"{decomp[ax]}-way decomposition; running unsharded")
            return None
    return ShardingPlan(mesh, plan_shape)
