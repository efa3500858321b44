"""SimulationData post-processing behaviors on emulated data —
behavioral intent of the reference's sim-data tests
(/root/reference/tests/test_data/test_sim_data.py: getitem/centers/
intensity/poynting/renormalize/IO round trip)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tests.utils import FREQ0, FWIDTH, make_sim_2d, run_emulated

GP = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)


@pytest.fixture(scope="module")
def sim_data():
    monitors = [
        td.FieldMonitor(center=(0, 0, 0), size=(2, 2, 0), freqs=[FREQ0],
                        name="field"),
        td.FluxMonitor(center=(0, 0, 0), size=(2, 2, 0), freqs=[FREQ0],
                       name="flux", normal_dir="+"),
        td.FieldTimeMonitor(center=(0, 0, 0), size=(1, 1, 0), name="ft",
                            interval=10),
    ]
    return run_emulated(make_sim_2d(monitors=monitors))


def test_getitem_and_contains(sim_data):
    assert "field" in sim_data
    assert "missing" not in sim_data
    data = sim_data["field"]
    assert data.monitor.name == "field"
    with pytest.raises(Exception):
        sim_data["missing"]


def test_at_centers_shapes_match(sim_data):
    cent = sim_data.at_centers("field")
    shapes = {k: np.asarray(v).shape for k, v in cent.items()
              if k in ("Ex", "Ey", "Ez")}
    assert len(set(shapes.values())) == 1  # colocated on one grid


def test_intensity_nonnegative_and_bounded(sim_data):
    inten = sim_data.get_intensity("field")
    vals = np.asarray(inten)
    assert np.all(vals >= 0)
    # |E|^2 is bounded by 3x the max per-component magnitude squared
    cent = sim_data.at_centers("field")
    cap = 3 * max(np.max(np.abs(np.asarray(cent[c]))) ** 2
                  for c in ("Ex", "Ey", "Ez") if c in cent)
    assert np.max(vals) <= cap * 1.001


def test_poynting_vector_normal_component(sim_data):
    # a planar monitor yields the normal Poynting component on the plane
    poynting = sim_data.get_poynting_vector("field")
    vals = np.asarray(poynting)
    assert vals.size > 0 and np.all(np.isfinite(vals))


def test_renormalize_scales_fields(sim_data):
    renorm = sim_data.renormalize(normalize_index=0)
    f0 = np.asarray(sim_data["field"].Ex)
    f1 = np.asarray(renorm["field"].Ex)
    assert f0.shape == f1.shape
    # renormalization divides by the (nonzero) source spectrum: fields
    # change by a uniform complex factor per frequency
    ratio = f1[np.abs(f0) > 1e-12] / f0[np.abs(f0) > 1e-12]
    assert np.allclose(ratio, ratio.flat[0], rtol=1e-6)


def test_final_decay_value_in_range(sim_data):
    v = sim_data.final_decay_value
    assert 0.0 <= v <= 1.0 or np.isnan(v)


def test_hdf5_round_trip(sim_data, tmp_path):
    path = str(tmp_path / "sim_data.hdf5")
    sim_data.to_file(path)
    back = td.SimulationData.from_file(path)
    assert set(back.monitor_data) == set(sim_data.monitor_data)
    np.testing.assert_allclose(
        np.asarray(back["field"].Ex), np.asarray(sim_data["field"].Ex))
    assert back.simulation == sim_data.simulation


def test_time_monitor_data_real(sim_data):
    ft = sim_data["ft"]
    assert not np.iscomplexobj(np.asarray(ft.Ex))


def test_source_spectrum_callable(sim_data):
    fn = sim_data.source_spectrum(0)
    vals = fn(np.array([FREQ0, FREQ0 * 1.01]))
    assert np.all(np.abs(np.asarray(vals)) > 0)
