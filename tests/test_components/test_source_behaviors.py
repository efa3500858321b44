"""Source physics behaviors: time dependencies, spectra, and per-source
validators — behavioral intent of the reference's source tests
(/root/reference/tests/test_components/test_source.py: spectrum
consistency, angle validators, planar constraints, TFSF geometry)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tests.utils import FREQ0, FWIDTH

GP = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)


# --------------------------------------------------------------------- #
# time dependencies
# --------------------------------------------------------------------- #

def _tmesh():
    dt = 1.0 / FREQ0 / 40
    return np.arange(0, 4000) * dt, dt


def test_gaussian_pulse_spectrum_peaks_at_freq0():
    times, dt = _tmesh()
    freqs = np.linspace(0.5 * FREQ0, 1.5 * FREQ0, 101)
    spec = np.abs(GP.spectrum(times, freqs, dt))
    # DC-component removal biases the peak slightly above freq0
    assert freqs[np.argmax(spec)] == pytest.approx(FREQ0, rel=0.06)


def test_gaussian_pulse_bandwidth_scales_with_fwidth():
    times, dt = _tmesh()
    freqs = np.linspace(0.5 * FREQ0, 1.5 * FREQ0, 201)
    wide = td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 5)
    narrow = td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 20)

    def hwhm(st):
        spec = np.abs(st.spectrum(times, freqs, dt))
        above = freqs[spec > 0.5 * spec.max()]
        return above[-1] - above[0]

    assert hwhm(wide) > 2.5 * hwhm(narrow)


def test_gaussian_pulse_amplitude_and_phase():
    times, dt = _tmesh()
    base = np.asarray(GP.amp_time(times))
    scaled = np.asarray(td.GaussianPulse(
        freq0=FREQ0, fwidth=FWIDTH, amplitude=2.5).amp_time(times))
    np.testing.assert_allclose(scaled, 2.5 * base, rtol=1e-12,
                               atol=1e-12)
    shifted = np.asarray(td.GaussianPulse(
        freq0=FREQ0, fwidth=FWIDTH, phase=np.pi / 2).amp_time(times))
    np.testing.assert_allclose(shifted, base * np.exp(1j * np.pi / 2),
                               rtol=1e-9, atol=1e-12)


def test_gaussian_pulse_peak_near_offset():
    times, dt = _tmesh()
    amps = np.abs(np.asarray(GP.amp_time(times)))
    t_peak = times[np.argmax(amps)]
    assert t_peak == pytest.approx(GP.offset * GP.twidth, rel=0.1)


def test_continuous_wave_reaches_steady_state():
    times, dt = _tmesh()
    cw = td.ContinuousWave(freq0=FREQ0, fwidth=FWIDTH)
    amps = np.abs(np.asarray(cw.amp_time(times)))
    tail = amps[-len(amps) // 4:]
    assert tail.max() == pytest.approx(1.0, rel=0.05)
    assert cw.end_time() is None


def test_custom_source_time_samples():
    values = np.exp(-np.linspace(-2, 2, 64) ** 2)
    dt = 1e-16
    cst = td.CustomSourceTime.from_values(freq0=FREQ0, fwidth=FWIDTH,
                                          values=values, dt=dt)
    # inside the dataset the envelope follows the samples
    amp = cst.amp_time(np.array([32 * dt]))
    assert np.abs(np.asarray(amp))[0] == pytest.approx(
        np.max(values), rel=0.15)


def test_frequency_range_brackets_freq0():
    lo, hi = GP.frequency_range()
    assert lo < FREQ0 < hi
    lo4, hi4 = GP.frequency_range(num_fwidth=2.0)
    assert lo < lo4 < FREQ0 < hi4 < hi


# --------------------------------------------------------------------- #
# source validators / geometry
# --------------------------------------------------------------------- #

def test_point_dipole_polarizations():
    for pol in ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"):
        td.PointDipole(center=(0, 0, 0), source_time=GP, polarization=pol)
    with pytest.raises(Exception):
        td.PointDipole(center=(0, 0, 0), source_time=GP, polarization="Q")


def test_plane_wave_must_be_planar():
    with pytest.raises(Exception):
        td.PlaneWave(center=(0, 0, 0), size=(1, 1, 1), source_time=GP,
                     direction="+")
    pw = td.PlaneWave(center=(0, 0, 0), size=(td.inf, td.inf, 0),
                      source_time=GP, direction="+")
    assert pw.injection_axis == 2


def test_plane_wave_angle_validator():
    with pytest.raises(Exception):
        td.PlaneWave(center=(0, 0, 0), size=(td.inf, td.inf, 0),
                     source_time=GP, direction="+",
                     angle_theta=np.pi / 2)  # grazing incidence is invalid


def test_gaussian_beam_waist():
    gb = td.GaussianBeam(center=(0, 0, 0), size=(2, 2, 0), source_time=GP,
                         direction="+", waist_radius=0.8)
    assert gb.waist_radius == 0.8
    with pytest.raises(Exception):
        td.GaussianBeam(center=(0, 0, 0), size=(2, 2, 0), source_time=GP,
                        direction="+", waist_radius=-1.0)


def test_mode_source_spec_roundtrip():
    ms = td.ModeSource(center=(0, 0, 0), size=(2, 2, 0), source_time=GP,
                       direction="+", mode_spec=td.ModeSpec(num_modes=3),
                       mode_index=1)
    assert ms.mode_spec.num_modes == 3
    assert ms.angle_theta == ms.mode_spec.angle_theta


def test_tfsf_injection_axis_and_direction():
    tfsf = td.TFSF(center=(0, 0, 0), size=(1, 1, 1), source_time=GP,
                   injection_axis=1, direction="-")
    assert tfsf.injection_axis == 1
    with pytest.raises(Exception):
        td.TFSF(center=(0, 0, 0), size=(1, 1, 1), source_time=GP,
                injection_axis=4, direction="+")


def test_uniform_current_source_components():
    ucs = td.UniformCurrentSource(center=(0, 0, 0), size=(0.4, 0.4, 0),
                                  source_time=GP, polarization="Ey")
    assert ucs.polarization == "Ey"


def test_source_time_json_roundtrip():
    s = GP.model_dump_json()
    back = td.GaussianPulse.model_validate_json(s)
    assert back == GP
    times, dt = _tmesh()
    np.testing.assert_allclose(np.asarray(back.amp_time(times)),
                               np.asarray(GP.amp_time(times)))
