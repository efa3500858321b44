"""Physics-sanity tests of the FDTD core on small 2D grids (CPU backend).

Mirrors the reference's philosophy (SURVEY.md §4): analytic FDTD cases
instead of golden files — propagation speed, PML absorption, reciprocity.
"""

import numpy as np
import pytest

import tidy3d_tpu as td
from tests.utils import FREQ0, FWIDTH, make_sim_2d
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower


def run_raw(sim):
    plan = lower(sim)
    runner = FDTDRunner(plan)
    data = runner.run()
    return plan, runner, data


def probe_series(data, idx, comp="Ez"):
    arr = data[idx][comp]
    mid = tuple(s // 2 for s in arr.shape[1:])
    return arr[(slice(None),) + mid]


def test_pulse_speed_isotropy():
    monitors = [
        td.FieldTimeMonitor(center=(2.0, 0, 0), size=(0, 0, 0), name="px",
                            fields=["Ez"]),
        td.FieldTimeMonitor(center=(0, 2.0, 0), size=(0, 0, 0), name="py",
                            fields=["Ez"]),
    ]
    sim = make_sim_2d(size=6, dl=0.05, run_time=3.6e-14, monitors=monitors)
    plan, runner, data = run_raw(sim)
    t = sim.tmesh
    peak_src = sim.sources[0].source_time.offset * sim.sources[0].source_time.twidth
    for idx in (0, 1):
        ez = probe_series(data, idx)
        env = np.convolve(np.abs(ez), np.ones(25) / 25, mode="same")
        t_arrival = t[np.argmax(env)] - peak_src
        expected = 2.0 / C_0
        assert abs(t_arrival / expected - 1) < 0.12
    # isotropy: x and y probes identical by symmetry of Ez dipole in 2D
    assert np.allclose(probe_series(data, 0), probe_series(data, 1), rtol=1e-4,
                       atol=1e-6 * np.abs(probe_series(data, 0)).max())


def test_pml_reflection_floor():
    """PML reflection: compare a small domain against a reference domain big
    enough that no reflection reaches the probe within the run; the
    difference at the probe is the PML reflection level."""
    monitors = [td.FieldTimeMonitor(center=(2.0, 0, 0), size=(0, 0, 0), name="p",
                                    fields=["Ez"])]
    run_time = 4.6e-14
    sim_small = make_sim_2d(size=5, dl=0.05, run_time=run_time, monitors=monitors,
                            shutoff=0.0)
    sim_big = make_sim_2d(size=16, dl=0.05, run_time=run_time, monitors=monitors,
                          shutoff=0.0)
    _, _, data_small = run_raw(sim_small)
    _, _, data_big = run_raw(sim_big)
    ez_s = probe_series(data_small, 0)
    ez_b = probe_series(data_big, 0)
    n = min(len(ez_s), len(ez_b))
    err = np.abs(ez_s[:n] - ez_b[:n]).max() / np.abs(ez_b).max()
    # 12-layer CPML: expect better than -30 dB round-trip reflection
    assert err < 3e-2


def test_pec_wall_reflects():
    """A PEC boundary reflects the pulse back to the probe."""
    monitors = [td.FieldTimeMonitor(center=(1.5, 0, 0), size=(0, 0, 0), name="p",
                                    fields=["Ez"])]
    bspec = td.BoundarySpec(x=td.Boundary.pec(), y=td.Boundary.pml(),
                            z=td.Boundary.periodic())
    sim = make_sim_2d(size=6, dl=0.05, run_time=6e-14, monitors=monitors,
                      shutoff=0.0).copy(update=dict(boundary_spec=bspec))
    plan, runner, data = run_raw(sim)
    ez = probe_series(data, 0)
    # with PEC walls the energy stays in the domain: late fields NOT decayed
    # to the PML level
    peak = np.abs(ez).max()
    tail = np.abs(ez[-len(ez) // 6:]).max()
    assert tail > 5e-2 * peak


def test_flux_conservation_2d():
    freqs = [FREQ0]
    monitors = [
        td.FluxMonitor(center=(0, 0, 0), size=(1.0, 1.0, td.inf), freqs=freqs,
                       name="in", exclude_surfaces=("z-", "z+")),
        td.FluxMonitor(center=(0, 0, 0), size=(2.5, 2.5, td.inf), freqs=freqs,
                       name="out", exclude_surfaces=("z-", "z+")),
    ]
    sim = make_sim_2d(size=6, dl=0.04, run_time=8e-14, monitors=monitors)
    data = td.web.run(sim, verbose=False)
    f_in = float(data["in"].flux.values[0])
    f_out = float(data["out"].flux.values[0])
    assert f_in > 0
    assert abs(f_out / f_in - 1) < 0.03


def test_dielectric_slows_pulse():
    """Pulse through an n=2 slab arrives later than through vacuum."""
    monitors = [td.FieldTimeMonitor(center=(2.2, 0, 0), size=(0, 0, 0), name="p",
                                    fields=["Ez"])]
    slab = td.Structure(
        geometry=td.Box(center=(1.1, 0, 0), size=(1.0, 100, 100)),
        medium=td.Medium(permittivity=4.0),
    )
    sim_vac = make_sim_2d(size=6, dl=0.04, run_time=4e-14, monitors=monitors)
    sim_slab = make_sim_2d(size=6, dl=0.04, run_time=4e-14, monitors=monitors,
                           structures=[slab])
    t = sim_vac.tmesh
    _, _, data_vac = run_raw(sim_vac)
    _, _, data_slab = run_raw(sim_slab)
    ez_v = probe_series(data_vac, 0)
    ez_s = probe_series(data_slab, 0)
    env = lambda x: np.convolve(np.abs(x), np.ones(25) / 25, mode="same")  # noqa: E731
    t_v = t[np.argmax(env(ez_v))]
    t_s = t[np.argmax(env(ez_s))]
    # extra delay ~ (n-1) * L / c = 1.0 um / c
    extra = (t_s - t_v) / (1.0 / C_0)
    assert 0.6 < extra < 1.4


def test_shutoff_stops_early():
    sim = make_sim_2d(size=5, dl=0.08, run_time=3e-13, shutoff=1e-4)
    plan, runner, data = run_raw(sim)
    assert runner.steps_run < plan.num_steps
    assert runner.final_decay <= 1e-4 * 1.5


def test_divergence_detection():
    # force divergence with an unstable courant factor
    sim = make_sim_2d(size=3, dl=0.1, run_time=4e-14, shutoff=0.0)
    object.__setattr__(sim, "courant", 1.01)  # bypass validator cap
    sim.__dict__.pop("dt", None)
    sim.__dict__.pop("tmesh", None)
    from tidy3d_tpu.exceptions import DivergenceError

    plan = lower(sim)
    runner = FDTDRunner(plan)
    # some unstable runs may stay finite within the short window; only assert
    # that IF it blows up, we raise cleanly
    try:
        runner.run()
    except DivergenceError:
        pass
