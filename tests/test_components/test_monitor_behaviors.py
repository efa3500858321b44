"""Monitor behaviors: storage estimates, flux surface decomposition,
downsampling, time windows, apodization — behavioral intent of the
reference's monitor tests
(/root/reference/tests/test_components/test_monitor.py: storage_size
scaling, surfaces, time_inds, downsampled coords)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tests.utils import FREQ0

TMESH = np.linspace(0, 1e-13, 1001)


# --------------------------------------------------------------------- #
# storage sizes
# --------------------------------------------------------------------- #

def test_field_monitor_storage_scales_with_freqs_and_cells():
    mon1 = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0),
                           freqs=[FREQ0], name="m")
    mon5 = mon1.updated_copy(freqs=np.linspace(
        0.9 * FREQ0, 1.1 * FREQ0, 5).tolist())
    s1 = mon1.storage_size(num_cells=1000, tmesh=TMESH)
    s5 = mon5.storage_size(num_cells=1000, tmesh=TMESH)
    s1_big = mon1.storage_size(num_cells=4000, tmesh=TMESH)
    assert s5 == pytest.approx(5 * s1, rel=0.01)
    assert s1_big == pytest.approx(4 * s1, rel=0.01)
    assert s1 > 0


def test_time_monitor_storage_scales_with_samples():
    mon = td.FieldTimeMonitor(center=(0, 0, 0), size=(1, 1, 0), name="t",
                              start=0.0, interval=1)
    mon10 = mon.updated_copy(interval=10)
    s_all = mon.storage_size(num_cells=1000, tmesh=TMESH)
    s_10 = mon10.storage_size(num_cells=1000, tmesh=TMESH)
    assert s_all > 5 * s_10


def test_flux_monitor_storage_small():
    mon = td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 1), freqs=[FREQ0],
                         name="f")
    # flux stores one scalar per freq, not fields
    assert mon.storage_size(num_cells=10**6, tmesh=TMESH) < 10**4


# --------------------------------------------------------------------- #
# flux surface decomposition
# --------------------------------------------------------------------- #

def test_flux_box_has_six_surfaces():
    mon = td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 1), freqs=[FREQ0],
                         name="f")
    surfs = mon.integration_surfaces
    assert len(surfs) == 6
    # each surface is planar with the right zero axis
    zero_axes = sorted(tuple(s.size).index(0.0) for s in surfs)
    assert zero_axes == [0, 0, 1, 1, 2, 2]
    # surfaces sit on the box faces
    xs = sorted(s.center[0] for s in surfs if tuple(s.size).index(0) == 0)
    assert xs == pytest.approx([-0.5, 0.5])


def test_flux_exclude_surfaces():
    mon = td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 1), freqs=[FREQ0],
                         name="f", exclude_surfaces=("x-", "z+"))
    assert len(mon.integration_surfaces) == 4


def test_flux_plane_single_surface():
    mon = td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[FREQ0],
                         name="f", normal_dir="+")
    surfs = mon.integration_surfaces
    assert len(surfs) == 1
    assert surfs[0].normal_dir == "+"


def test_flux_plane_rejects_exclude_surfaces():
    with pytest.raises(Exception):
        td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[FREQ0],
                       name="f", exclude_surfaces=("x-",))


# --------------------------------------------------------------------- #
# time windows / downsampling
# --------------------------------------------------------------------- #

def test_time_inds_window():
    mon = td.FieldTimeMonitor(center=(0, 0, 0), size=(1, 1, 0), name="t",
                              start=2e-14, stop=6e-14)
    beg, end = mon.time_inds(TMESH)
    assert TMESH[beg] >= 2e-14 - (TMESH[1] - TMESH[0])
    assert TMESH[min(end, len(TMESH) - 1)] <= 6e-14 + 2 * (TMESH[1] - TMESH[0])
    assert beg < end


def test_time_inds_full_range():
    mon = td.FieldTimeMonitor(center=(0, 0, 0), size=(1, 1, 0), name="t")
    beg, end = mon.time_inds(TMESH)
    assert beg == 0
    assert end >= len(TMESH) - 1


def test_interval_space_downsamples_coords():
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[FREQ0],
                          name="m", interval_space=(2, 3, 1))
    coords = np.arange(12, dtype=float)
    down_x = mon.downsample(coords, axis=0)
    down_y = mon.downsample(coords, axis=1)
    assert len(down_x) < len(coords)
    assert len(down_y) < len(down_x)
    # endpoints retained (reference downsampling keeps boundary samples)
    assert down_x[0] == coords[0]


# --------------------------------------------------------------------- #
# apodization
# --------------------------------------------------------------------- #

def test_apodization_weights_window():
    apod = td.ApodizationSpec(start=2e-14, end=8e-14, width=5e-15)
    w = apod.apodization_weights(TMESH)
    assert w.shape == TMESH.shape
    assert w.max() <= 1.0 + 1e-12
    mid = (TMESH > 4e-14) & (TMESH < 6e-14)
    assert np.all(w[mid] > 0.99)
    assert w[0] < 0.01 and w[-1] < 0.01


def test_apodization_validators():
    with pytest.raises(Exception):
        td.ApodizationSpec(start=5e-14, end=2e-14, width=1e-15)
    with pytest.raises(Exception):
        td.ApodizationSpec(start=1e-14, end=2e-14, width=-1e-15)


# --------------------------------------------------------------------- #
# misc monitor validators
# --------------------------------------------------------------------- #

def test_field_monitor_requires_freqs():
    with pytest.raises(Exception):
        td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[],
                        name="m")


def test_mode_monitor_spec():
    mon = td.ModeMonitor(center=(0, 0, 0), size=(1, 1, 0), freqs=[FREQ0],
                         name="mm", mode_spec=td.ModeSpec(num_modes=4))
    assert mon.mode_spec.num_modes == 4


def test_diffraction_monitor_planar():
    with pytest.raises(Exception):
        td.DiffractionMonitor(center=(0, 0, 0), size=(1, 1, 1),
                              freqs=[FREQ0], name="d", normal_dir="+")


def test_permittivity_monitor():
    mon = td.PermittivityMonitor(center=(0, 0, 0), size=(1, 1, 1),
                                 freqs=[FREQ0], name="eps")
    assert mon.storage_size(num_cells=100, tmesh=TMESH) > 0
