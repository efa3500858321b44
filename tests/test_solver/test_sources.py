"""Source-type tests: plane wave, TFSF, gaussian beam, custom currents."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0

WL = 1.5
FREQ0 = C_0 / WL
PULSE = td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5)


def run_2d(sources, monitors, size=(5, 4.5, 0), dl=0.05, run_time=1.2e-13,
           **kwargs):
    sim = td.Simulation(
        center=(0, 0, 0), size=size, run_time=run_time,
        sources=sources, monitors=monitors, shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=dl), **kwargs,
    )
    return td.web.run(sim, verbose=False)


def test_plane_wave_directionality():
    # plane waves belong with periodic transverse boundaries (the validator
    # warns otherwise): sheets crossing PML regions would leak
    pw = td.PlaneWave(center=(-1, 0, 0), size=(0, td.inf, td.inf), direction="+",
                      source_time=PULSE, pol_angle=np.pi / 2)
    mons = [td.FieldMonitor(center=(1.0, 0, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="fwd"),
            td.FieldMonitor(center=(-2.0, 0, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="bwd")]
    sim = td.Simulation(
        center=(0, 0, 0), size=(5, 4.5, 0), run_time=1.2e-13,
        sources=[pw], monitors=mons, shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.periodic(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.05),
    )
    data = td.web.run(sim, verbose=False)
    fwd = np.abs(data["fwd"].Ez.values).max()
    bwd = np.abs(data["bwd"].Ez.values).max()
    assert fwd > 0.99
    assert bwd / fwd < 1e-3


def test_tfsf_confinement():
    tfsf = td.TFSF(center=(0, 0, 0), size=(2, 2, td.inf), direction="+",
                   injection_axis=0, pol_angle=np.pi / 2, source_time=PULSE)
    mons = [td.FieldMonitor(center=(0, 0, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="inside"),
            td.FieldMonitor(center=(0, 1.6, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="outside")]
    data = run_2d([tfsf], mons)
    inside = np.abs(data["inside"].Ez.values).max()
    outside = np.abs(data["outside"].Ez.values).max()
    # discrete TF/SF equivalence sheets are exact on the grid: unit incident
    # amplitude inside, leakage at the numerical floor
    assert abs(inside - 1.0) < 1e-3
    assert outside / inside < 1e-4


def test_gaussian_beam_focus():
    beam = td.GaussianBeam(center=(-1.5, 0, 0), size=(0, td.inf, td.inf),
                           direction="+", waist_radius=0.8, source_time=PULSE,
                           pol_angle=np.pi / 2)
    mons = [td.FieldMonitor(center=(0.5, 0, 0), size=(0, 3, 0), freqs=[FREQ0],
                            name="slice")]
    data = run_2d([beam], mons)
    ez = np.abs(data["slice"].Ez.values[0, :, 0, 0])
    ys = np.asarray(data["slice"].Ez.coords["y"])
    # beam peaks near the axis and decays off-axis (allowing for the
    # diffractive spread over the 2 um propagation distance)
    assert abs(ys[np.argmax(ez)]) < 0.3
    assert ez[np.argmax(np.abs(ys))] < 0.5 * ez.max()
    # measured 1/e width consistent with gaussian-beam divergence
    above = ys[ez > ez.max() / np.e]
    w_meas = (above.max() - above.min()) / 2
    zr = np.pi * 0.8**2 / WL
    w_theory = 0.8 * np.sqrt(1 + (2.0 / zr) ** 2)
    assert 0.5 * w_theory < w_meas < 1.7 * w_theory


def test_angled_plane_wave_bloch():
    """Complex-field (Bloch) run: angled plane wave injects at unit amplitude
    and carries flux cos(theta) relative to normal incidence."""
    theta = np.deg2rad(25)
    ly = 4.0
    pw = td.PlaneWave(center=(-1, 0, 0), size=(0, td.inf, td.inf), direction="+",
                      source_time=PULSE, pol_angle=np.pi / 2, angle_theta=theta)
    bloch = td.BlochBoundary.from_source(source=pw, domain_size=ly, axis=1)
    mons = [td.FieldMonitor(center=(1, 0.3, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="fwd"),
            td.FieldMonitor(center=(-2, 0.3, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="bwd"),
            td.FluxMonitor(center=(1.2, 0, 0), size=(0, td.inf, td.inf),
                           freqs=[FREQ0], name="flux")]
    sim = td.Simulation(
        center=(0, 0, 0), size=(5, ly, 0), run_time=1.5e-13,
        sources=[pw], monitors=mons, shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(),
                                      y=td.Boundary(minus=bloch, plus=bloch),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.05))
    assert sim.complex_fields
    data = td.web.run(sim, verbose=False)
    fwd = np.abs(data["fwd"].Ez.values).max()
    bwd = np.abs(data["bwd"].Ez.values).max()
    assert abs(fwd - 1.0) < 0.01
    assert bwd / fwd < 1e-2

    sim0 = sim.updated_copy(
        sources=[pw.updated_copy(angle_theta=0.0)],
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(),
                                      y=td.Boundary.periodic(),
                                      z=td.Boundary.periodic()))
    data0 = td.web.run(sim0, verbose=False)
    flux = float(np.asarray(data["flux"].flux).ravel()[0])
    flux0 = float(np.asarray(data0["flux"].flux).ravel()[0])
    assert abs(flux / flux0 - np.cos(theta)) < 0.01


def test_custom_current_source():
    from tidy3d_tpu.components.data.data_array import ScalarFieldDataArray

    ys = np.linspace(-0.5, 0.5, 11)
    prof = np.exp(-(ys / 0.25) ** 2)
    jz = ScalarFieldDataArray(
        prof.reshape(1, -1, 1, 1) + 0j,
        coords=dict(x=[0.0], y=ys, z=[0.0], f=[FREQ0]))
    src = td.CustomCurrentSource(center=(0, 0, 0), size=(0, 1, td.inf),
                                 source_time=PULSE,
                                 current_dataset={"Ez": jz})
    mons = [td.FieldMonitor(center=(1.2, 0, 0), size=(0, 0, 0), freqs=[FREQ0],
                            name="probe")]
    data = run_2d([src], mons)
    assert np.abs(data["probe"].Ez.values).max() > 1e-4


def test_broadband_mode_source():
    """Broadband (num_freqs) mode source: Chebyshev waveform operator is
    spectrally exact and injection stays accurate across the band."""
    from tidy3d_tpu.solver.field_sources import make_cheb_amp_fn

    st = td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 6)
    bw = 1.5 * st.fwidth
    dt = 1e-17
    times = np.arange(0, 4e-13, dt)

    def spec(v, f):
        return np.sum(v * np.exp(2j * np.pi * f * times)) * dt

    a_ref = st.amp_time(times)
    for k in (1, 2):
        wk = make_cheb_amp_fn(st, k, FREQ0, bw)(times)
        for f in (FREQ0 - 0.8 * bw, FREQ0 + 0.6 * bw):
            x = (f - FREQ0) / bw
            target = spec(a_ref, f) * np.cos(k * np.arccos(x))
            assert abs(spec(wk, f) - target) / abs(spec(a_ref, f)) < 1e-3

    # end-to-end: broadband injection carries the band within a few percent
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.4, td.inf)),
                      medium=td.Medium(permittivity=12.25))
    freqs = [FREQ0 * 0.9, FREQ0, FREQ0 * 1.1]
    src = td.ModeSource(center=(-1.6, 0, 0), size=(0, 3, td.inf), direction="+",
                        source_time=st,
                        mode_spec=td.ModeSpec(num_modes=1, target_neff=3.3),
                        num_freqs=3)
    mon = td.ModeMonitor(center=(1.6, 0, 0), size=(0, 3, td.inf), freqs=freqs,
                         name="m", mode_spec=td.ModeSpec(num_modes=1,
                                                         target_neff=3.3))
    sim = td.Simulation(
        center=(0, 0, 0), size=(4.4, 4, 0), run_time=2e-13, sources=[src],
        monitors=[mon], structures=[wg], shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.04))
    data = td.web.run(sim, verbose=False)
    amps = np.abs(np.asarray(data["m"].amps.sel(direction="+").values)[:, 0])
    assert np.all(amps > 0.9)
    assert np.all(amps < 1.05)
