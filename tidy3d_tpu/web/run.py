"""Local TPU execution with the reference's web API shape.

The reference's ``web.run`` is upload -> start -> monitor -> load against a
cloud solver (/root/reference/tidy3d/web/api/webapi.py:49-155). Here the same
surface executes in-process: lower -> jit-compile -> time-step on TPU ->
assemble SimulationData. Signatures are kept so reference notebooks run
unchanged.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..components.data.data_array import (
    FluxDataArray,
    FluxTimeDataArray,
    ModeAmpsDataArray,
    ModeIndexDataArray,
    ScalarFieldDataArray,
    ScalarFieldTimeDataArray,
)
from ..components.data.monitor_data import (
    FieldData,
    FieldTimeData,
    FluxData,
    FluxTimeData,
    ModeData,
    ModeSolverData,
    PermittivityData,
    _integrate_plane,
    _mode_overlaps,
)
from ..components.data.sim_data import SimulationData
from ..components.monitor import (
    AbstractFieldProjectionMonitor,
    DiffractionMonitor,
    FieldMonitor,
    FieldTimeMonitor,
    FluxMonitor,
    FluxTimeMonitor,
    ModeMonitor,
    ModeSolverMonitor,
    PermittivityMonitor,
)
from ..components.simulation import Simulation
from ..exceptions import SetupError
from ..log import log
from ..solver.fdtd import FDTDRunner
from ..solver.lowering import E_COMPS, H_COMPS, lower


def run(
    simulation: Simulation,
    task_name: str = "local",
    folder_name: str = "default",
    path: str = None,
    callback_url: str = None,
    verbose: bool = True,
    solver_version: str = None,
    checkpoint_path: str = None,
    checkpoint_every: int = 5,
    **kwargs,
) -> SimulationData:
    """Run a simulation locally on TPU and return its SimulationData.

    ``checkpoint_path`` enables periodic device-state checkpointing (E/H
    fields, CPML psi memories, dispersive pole currents, DFT monitor
    accumulators); if the file exists the run resumes from it — long runs
    survive preemption (no equivalent in the reference, SURVEY §5)."""
    simulation.validate_pre_upload()
    t_start = _time.time()
    plan = lower(simulation)
    if verbose:
        nx, ny, nz = plan.shape
        log.info(f"[{task_name}] lowered: grid {nx}x{ny}x{nz}, "
                 f"{plan.num_steps} steps, {len(plan.sources)} source terms.")
    # multi-chip / multi-host decomposition via TIDY3D_TPU_SHARD
    # ("auto" or "dx,dy,dz"); multi-host processes join through
    # jax.distributed first (solver/distributed.py, SURVEY §2.2 P4)
    from ..solver.distributed import sharding_plan_from_env

    sharding_plan = sharding_plan_from_env(plan.shape)
    if sharding_plan is not None and verbose:
        log.info(f"[{task_name}] sharded run: decomp "
                 f"{sharding_plan.decomp} over "
                 f"{int(np.prod(sharding_plan.decomp))} devices.")
    runner = FDTDRunner(plan, sharding_plan=sharding_plan)
    # refuse over-budget plans with a clean SetupError before dispatch
    # (reference parity: validate_pre_upload gates scale client-side,
    # /root/reference/tidy3d/components/simulation.py:3341)
    runner.check_memory_budget()
    from ..solver.profiling import maybe_profile

    with maybe_profile():
        if checkpoint_path is not None:
            raw = runner.run_checkpointed(checkpoint_path,
                                          checkpoint_every=checkpoint_every,
                                          verbose=verbose)
        else:
            raw = runner.run(verbose=verbose)
    if verbose:
        ncells = np.prod(plan.shape)
        rate = ncells * runner.steps_run / max(runner.wall_time, 1e-9)
        log.info(f"[{task_name}] solved {runner.steps_run} steps in "
                 f"{runner.wall_time:.2f}s ({rate / 1e9:.2f} Gcell*steps/s).")

    sim_data = assemble_sim_data(simulation, plan, raw, runner, task_name)
    if path is not None:
        sim_data.to_file(path)
    return sim_data


def assemble_sim_data(simulation, plan, raw, runner, task_name="local") -> SimulationData:
    """Build SimulationData from raw monitor accumulators."""
    from ..solver.profiling import RunMetrics

    metrics = RunMetrics.from_runner(runner)
    log_lines = [
        f"task: {task_name}",
        f"steps run: {runner.steps_run} / {plan.num_steps}",
    ] + metrics.log_lines()

    # group plans by source monitor (flux monitors have per-surface plans)
    surface_groups: Dict[str, List[int]] = {}
    data_list = []
    handled = set()
    for idx, mp in enumerate(plan.monitors):
        parent = (mp.mode_info or {}).get("parent")
        if parent is not None:
            surface_groups.setdefault(parent, []).append(idx)

    for idx, mp in enumerate(plan.monitors):
        if idx in handled:
            continue
        monitor = mp.monitor
        info = mp.mode_info or {}
        if info.get("parent") is not None:
            continue  # handled with its parent group below
        if isinstance(monitor, FieldMonitor):
            data_list.append(_make_field_data(simulation, mp, raw[idx]))
        elif isinstance(monitor, FieldTimeMonitor):
            data_list.append(_make_field_time_data(simulation, plan, mp, raw[idx],
                                                   runner))
        elif isinstance(monitor, PermittivityMonitor):
            data_list.append(_make_permittivity_data(simulation, plan, mp))
        elif isinstance(monitor, (ModeMonitor, ModeSolverMonitor)):
            data_list.append(_make_mode_data(simulation, mp, raw[idx]))
        elif isinstance(monitor, DiffractionMonitor):
            data_list.append(_make_diffraction_data(simulation, mp, raw[idx]))

    # flux / projection monitors: combine their surface plans
    for mon in simulation.monitors:
        if isinstance(mon, FluxMonitor) and mon.name in surface_groups:
            data_list.append(_make_flux_data(simulation, plan, raw,
                                             surface_groups[mon.name], mon))
        elif isinstance(mon, FluxTimeMonitor) and mon.name in surface_groups:
            data_list.append(_make_flux_time_data(simulation, plan, raw,
                                                  surface_groups[mon.name], mon,
                                                  runner))
        elif isinstance(mon, AbstractFieldProjectionMonitor) \
                and mon.name in surface_groups:
            data_list.append(_make_projection_data(simulation, plan, raw,
                                                   surface_groups[mon.name], mon))

    sim_data = SimulationData(
        simulation=simulation, data=tuple(data_list), log="\n".join(log_lines),
        diverged=False,
    )
    # normalize frequency-domain data by the source spectrum
    if simulation.normalize_index is not None and simulation.sources:
        spectrum_fn = sim_data.source_spectrum(simulation.normalize_index)
        data_norm = tuple(md.normalize(spectrum_fn) for md in sim_data.data)
        sim_data = sim_data.copy(update=dict(data=data_norm))
    return sim_data


# --------------------------------------------------------------------------- #
# builders
# --------------------------------------------------------------------------- #


def _field_arrays_freq(mp, raw_mon) -> Dict[str, ScalarFieldDataArray]:
    arrays = {}
    freqs = np.asarray(mp.freqs)
    for comp in mp.comps:
        acc = raw_mon.get(comp)
        if acc is None:
            continue
        coords = dict(mp.coords[comp])
        coords["f"] = freqs
        arrays[comp] = ScalarFieldDataArray(acc, coords=coords)
    return arrays


def _make_field_data(simulation, mp, raw_mon) -> FieldData:
    arrays = _field_arrays_freq(mp, raw_mon)
    monitor = mp.monitor
    if monitor.colocate:
        arrays = _colocate_to_boundaries(simulation, monitor, arrays)
    return FieldData(monitor=monitor, symmetry=simulation.symmetry, **arrays)


def _colocate_to_boundaries(simulation, monitor, arrays):
    """Interpolate Yee-positioned fields onto primal-grid boundary points
    within the monitor region (reference colocate semantics)."""
    sub_grid = simulation.discretize_monitor(monitor)
    bounds = sub_grid.boundaries
    out = {}
    for comp, arr in arrays.items():
        coords = {}
        for dim in "xyz":
            axis = "xyz".index(dim)
            if monitor.size[axis] == 0.0:
                continue  # keep the single plane position
            target = np.asarray(getattr(bounds, dim))[:-1]
            if len(target) >= 1:
                coords[dim] = target
        out[comp] = arr.interp(coords=coords, kwargs=dict(fill_value=None)) \
            if coords else arr
        out[comp] = ScalarFieldDataArray(out[comp].values, coords=out[comp].coords) \
            if set(out[comp].dims) == {"x", "y", "z", "f"} else out[comp]
    return out


def _make_field_time_data(simulation, plan, mp, raw_mon, runner) -> FieldTimeData:
    monitor = mp.monitor
    tmesh = plan.tmesh
    beg, end, interval = mp.t_start, mp.t_stop, mp.t_interval
    t_coords = tmesh[beg:end:interval] + plan.dt
    arrays = {}
    for comp in mp.comps:
        acc = raw_mon.get(comp)
        if acc is None:
            continue
        # acc shape (n_samples, nx, ny, nz) -> (nx, ny, nz, t)
        vals = np.moveaxis(acc, 0, -1)[..., :len(t_coords)]
        coords = dict(mp.coords[comp])
        coords["t"] = t_coords[:vals.shape[-1]]
        arrays[comp] = ScalarFieldTimeDataArray(np.real(vals), coords=coords)
    return FieldTimeData(monitor=monitor, symmetry=simulation.symmetry, **arrays)


def _make_permittivity_data(simulation, plan, mp) -> PermittivityData:
    freqs = np.asarray(mp.freqs)
    arrays = {}
    for ci, comp in enumerate(E_COMPS):
        eps = plan.eps_yee[comp]
        if np.ndim(eps) == 0:  # uniform background stayed scalar in lowering
            eps = np.broadcast_to(eps, plan.shape)
        sl = mp.slices[comp]
        vals = eps[sl][..., None] * np.ones((1, 1, 1, len(freqs)))
        coords = dict(mp.coords[comp])
        coords["f"] = freqs
        arrays[f"eps_{comp[1]}{comp[1]}"] = ScalarFieldDataArray(
            vals.astype(np.complex64), coords=coords)
    return PermittivityData(monitor=mp.monitor, **arrays)


def _surface_flux(simulation, plan, raw, idx, normal_dir: str) -> np.ndarray:
    """Flux through one recorded surface plan (positive along +axis)."""
    mp = plan.monitors[idx]
    arrays = _field_arrays_freq(mp, raw[idx])
    axis = mp.mode_info["axis"]
    surf_monitor = type("M", (), {})()
    data = FieldData(
        monitor=FieldMonitor(
            center=mp.monitor.center, size=mp.monitor.size,
            freqs=mp.freqs.tolist(), name=mp.monitor.name, colocate=False,
        ),
        **arrays,
    )
    flux = data.flux_value()
    sign = 1.0 if normal_dir == "+" else -1.0
    return sign * np.asarray(flux.values), np.asarray(mp.freqs)


def _make_flux_data(simulation, plan, raw, idxs, monitor) -> FluxData:
    total = None
    freqs = None
    for idx in idxs:
        mp = plan.monitors[idx]
        normal_dir = mp.mode_info.get("normal_dir") or "+"
        vals, freqs = _surface_flux(simulation, plan, raw, idx, normal_dir)
        total = vals if total is None else total + vals
    return FluxData(monitor=monitor,
                    flux=FluxDataArray(total, coords=dict(f=freqs)))


def _make_flux_time_data(simulation, plan, raw, idxs, monitor, runner) -> FluxTimeData:
    total = None
    t_coords = None
    for idx in idxs:
        mp = plan.monitors[idx]
        normal_dir = mp.mode_info.get("normal_dir") or "+"
        sign = 1.0 if normal_dir == "+" else -1.0
        tmesh = plan.tmesh
        t_coords = tmesh[mp.t_start:mp.t_stop:mp.t_interval] + plan.dt
        arrays = {}
        for comp in mp.comps:
            acc = raw[idx].get(comp)
            if acc is None:
                continue
            vals = np.moveaxis(acc, 0, -1)[..., :len(t_coords)]
            coords = dict(mp.coords[comp])
            coords["t"] = t_coords[:vals.shape[-1]]
            arrays[comp] = ScalarFieldTimeDataArray(np.real(vals), coords=coords)
        ft = FieldTimeData(
            monitor=FieldTimeMonitor(
                center=mp.monitor.center, size=mp.monitor.size,
                name=mp.monitor.name, colocate=False,
            ), **arrays)
        flux = ft.flux_value()
        vals = sign * np.asarray(flux.values)
        total = vals if total is None else total + vals
    return FluxTimeData(monitor=monitor,
                        flux=FluxTimeDataArray(total, coords=dict(t=t_coords)))


def _make_projection_data(simulation, plan, raw, idxs, monitor):
    """Assemble near-field surfaces and project to the far zone."""
    from ..components.field_projection import FieldProjector

    surfaces = []
    for idx in idxs:
        mp = plan.monitors[idx]
        arrays = _field_arrays_freq(mp, raw[idx])
        fd = FieldData(
            monitor=FieldMonitor(
                center=mp.monitor.center, size=mp.monitor.size,
                freqs=mp.freqs.tolist(), name=mp.monitor.name, colocate=False,
            ),
            **arrays,
        )
        surfaces.append((fd, mp.mode_info.get("normal_dir") or "+"))
    eps_bg = simulation.medium.eps_model(float(np.asarray(plan.monitors[idxs[0]].freqs)[0]))
    medium_n = float(np.real(np.sqrt(eps_bg)))
    projector = FieldProjector(sim_data=None, surfaces=tuple(surfaces),
                               medium_n=medium_n)
    return projector.project_fields(monitor)


def _make_diffraction_data(simulation, mp, raw_mon):
    """Diffraction order amplitudes from the DFT fields on the plane.

    For a plane normal to `axis` in a transversely-periodic simulation, the
    order (m, n) amplitudes are the 2D Fourier coefficients of the tangential
    fields, decomposed into s/p polarizations
    (reference: monitor_data.py DiffractionData:2672, ux/uy conventions)."""
    from ..components.data.data_array import DiffractionDataArray
    from ..components.data.monitor_data import DiffractionData
    from ..constants import C_0, ETA_0

    monitor = mp.monitor
    axis = mp.mode_info["axis"]
    b_ax, c_ax = (axis + 1) % 3, (axis + 2) % 3
    arrays = _field_arrays_freq(mp, raw_mon)
    freqs = np.asarray(mp.freqs)

    fd = FieldData(
        monitor=FieldMonitor(center=monitor.center, size=monitor.size,
                             freqs=freqs.tolist(), name=monitor.name,
                             colocate=False),
        **arrays,
    )
    from ..components.data.monitor_data import _colocated_tangential_fields

    comps, (b_dim, c_dim) = _colocated_tangential_fields(fd, axis)

    # enforce (b, c, f) layout (cyclic ordering is transposed vs the arrays'
    # native xyz dim order for y-normal planes)
    def _ordered(arr):
        want = tuple(d for d in (b_dim, c_dim, "f") if d in arr.dims)
        return arr.transpose(*want) if tuple(arr.dims) != want else arr

    e_b = _ordered(comps[f"E{b_dim}"])
    e_c = _ordered(comps[f"E{c_dim}"])
    bb = np.asarray(e_b.coords[b_dim], dtype=float)
    cc = np.asarray(e_b.coords[c_dim], dtype=float)
    # periodic lengths from the simulation domain; a zero-extent (2D
    # singleton) transverse axis carries no Fourier decomposition: unit
    # effective length and weight
    rmin, rmax = simulation.bounds
    Lb = rmax[b_ax] - rmin[b_ax]
    Lc = rmax[c_ax] - rmin[c_ax]
    Lb_eff = Lb if Lb > 0 else 1.0
    Lc_eff = Lc if Lc > 0 else 1.0
    eps_bg = simulation.medium.eps_model(float(freqs[0]))
    n_med = float(np.real(np.sqrt(eps_bg)))

    # Bloch wavevector offsets (angled incidence): k_t,m = k_bloch + 2 pi m/L
    def _bloch_k(ax, L):
        bv = getattr(simulation.boundary_spec.to_list[ax][0], "bloch_vec", 0.0)
        return 2 * np.pi * (bv or 0.0) / L if L > 0 else 0.0

    kb0 = _bloch_k(b_ax, Lb)
    kc0 = _bloch_k(c_ax, Lc)

    # allowed orders at the highest frequency
    k_max = 2 * np.pi * freqs.max() * n_med / C_0
    m_max = int(np.floor((k_max + abs(kb0)) * Lb / (2 * np.pi))) if Lb > 0 else 0
    n_max = int(np.floor((k_max + abs(kc0)) * Lc / (2 * np.pi))) if Lc > 0 else 0
    orders_b = np.arange(-m_max, m_max + 1)
    orders_c = np.arange(-n_max, n_max + 1)

    # Fourier coefficients via direct projection (nonuniform-grid-safe)
    wb = np.zeros(len(bb))
    wb[:] = np.gradient(bb) if len(bb) > 1 else Lb_eff
    wc = np.zeros(len(cc))
    wc[:] = np.gradient(cc) if len(cc) > 1 else Lc_eff
    w2 = (wb[:, None] * wc[None, :]) / (Lb_eff * Lc_eff)
    amps = np.zeros((len(orders_b), len(orders_c), len(freqs), 2), dtype=complex)
    for mi_, m in enumerate(orders_b):
        for ni_, n in enumerate(orders_c):
            kb = kb0 + (2 * np.pi * m / Lb if Lb > 0 else 0.0)
            kc = kc0 + (2 * np.pi * n / Lc if Lc > 0 else 0.0)
            # the recorded (complex) fields carry the full Bloch phase ramp,
            # so project against the full transverse wavevector
            phase = np.exp(-1j * (kb * bb[:, None] + kc * cc[None, :]))
            for fi in range(len(freqs)):
                k0 = 2 * np.pi * freqs[fi] * n_med / C_0
                kt2 = kb**2 + kc**2
                if kt2 >= k0**2:
                    continue  # evanescent
                coef_b = np.sum(e_b.values[..., fi] * phase * w2)
                coef_c = np.sum(e_c.values[..., fi] * phase * w2)
                # s/p decomposition relative to the in-plane k direction
                if kt2 > 0:
                    ub, uc = kb / np.sqrt(kt2), kc / np.sqrt(kt2)
                else:
                    ub, uc = 1.0, 0.0
                # p: in the plane of incidence (along u); s: perpendicular
                amp_p = coef_b * ub + coef_c * uc
                amp_s = -coef_b * uc + coef_c * ub
                # fold obliquity into the amplitudes so |amp|^2 is the order's
                # diffraction efficiency: P_s = |E_s|^2 cos(theta),
                # P_p = |E_p,tan|^2 / cos(theta) (reference: DiffractionData
                # power conventions, monitor_data.py:2672)
                cos_t = np.sqrt(k0**2 - kt2) / k0
                amps[mi_, ni_, fi, 0] = amp_s * np.sqrt(cos_t)
                amps[mi_, ni_, fi, 1] = amp_p / np.sqrt(cos_t)

    amps_da = DiffractionDataArray(amps, coords=dict(
        orders_x=orders_b, orders_y=orders_c, f=freqs,
        polarization=np.array(["s", "p"])))
    bloch_b = getattr(simulation.boundary_spec.to_list[b_ax][0], "bloch_vec", 0.0) or 0.0
    bloch_c = getattr(simulation.boundary_spec.to_list[c_ax][0], "bloch_vec", 0.0) or 0.0
    return DiffractionData(monitor=monitor, amps=amps_da,
                           sim_size=(Lb, Lc), bloch_vecs=(bloch_b, bloch_c),
                           medium=simulation.medium)


def _make_mode_data(simulation, mp, raw_mon):
    """ModeData / ModeSolverData: overlap DFT fields with solver modes."""
    from ..plugins.mode.mode_solver import ModeSolver

    monitor = mp.monitor
    arrays = _field_arrays_freq(mp, raw_mon)
    freqs = np.asarray(mp.freqs)
    mode_spec = monitor.mode_spec

    solver = ModeSolver(
        simulation=simulation, plane=monitor.geometry, mode_spec=mode_spec,
        freqs=freqs.tolist(), colocate=False,
    )
    mode_data_raw = solver.data_raw

    field_data = FieldData(
        monitor=FieldMonitor(
            center=monitor.center, size=monitor.size, freqs=freqs.tolist(),
            name=monitor.name, colocate=False,
        ),
        **{k: v for k, v in arrays.items() if k in
           ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz")},
    )

    if isinstance(monitor, ModeSolverMonitor):
        return ModeSolverData(
            monitor=monitor,
            Ex=mode_data_raw.Ex, Ey=mode_data_raw.Ey, Ez=mode_data_raw.Ez,
            Hx=mode_data_raw.Hx, Hy=mode_data_raw.Hy, Hz=mode_data_raw.Hz,
            n_complex=mode_data_raw.n_complex,
        )

    # amplitudes in both directions via overlap with the (unit-power) modes
    num_modes = mode_spec.num_modes
    amps = np.zeros((2, len(freqs), num_modes), dtype=np.complex128)
    axis = mp.mode_info["axis"]

    mode_fields = mode_data_raw  # ModeSolverData-like with mode_index dim
    amp_plus = _mode_overlaps(mode_fields, field_data, axis, conjugate=True)
    # backward modes: tangential H negated -> overlap with flipped H
    flipped = {}
    for comp in ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"):
        arr = getattr(mode_fields, comp, None)
        if arr is None:
            continue
        if comp[0] == "H":
            flipped[comp] = type(arr)(-arr.values, coords=arr.coords)
        else:
            flipped[comp] = arr
    from ..components.data.dataset import ModeSolverDataset

    mode_fields_minus = ModeSolverDataset(**flipped)
    amp_minus = _mode_overlaps(mode_fields_minus, field_data, axis, conjugate=True)

    def to_np(arr):
        vals = np.asarray(arr.values if hasattr(arr, "values") else arr)
        # dims (f, mode_index) expected
        if hasattr(arr, "dims") and tuple(arr.dims) != ("f", "mode_index"):
            order = [arr.dims.index("f"), arr.dims.index("mode_index")]
            vals = np.transpose(vals, order)
        return vals

    amps[0] = to_np(amp_plus)   # '+' direction
    amps[1] = to_np(amp_minus)  # '-' direction

    amps_arr = ModeAmpsDataArray(
        amps, coords=dict(direction=np.array(["+", "-"]), f=freqs,
                          mode_index=np.arange(num_modes)))
    return ModeData(monitor=monitor, amps=amps_arr,
                    n_complex=mode_data_raw.n_complex)
