"""Validator behavior suite: every Simulation validator with BOTH a
triggering case and a compliant (passing) case, mirroring the behavioral
intent of the reference's validator tests
(/root/reference/tests/test_components/test_simulation.py — e.g.
test_validate_plane_wave_boundaries:408, test_validate_zero_dim_
boundaries:504, test_sim_monitor_homogeneous:906, test_proj_monitor_
distance:1008, test_tfsf_boundaries:1593, test_error_large_monitors:1877).
Warnings are asserted through the log-capture machinery, not just absence
of an exception."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.exceptions import SetupError
from tidy3d_tpu.log import log
from tests.utils import FREQ0, FWIDTH

GP = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)
DIPOLE = td.PointDipole(center=(0, 0, 0), source_time=GP, polarization="Ez")


@pytest.fixture()
def warnings_captured():
    """Capture log warnings for the duration of a test (log-once keys are
    cleared so repeated parametrizations still observe their warning)."""
    log._logged_once.clear()
    log.begin_capture()
    yield log.captured_warnings
    log.end_capture()


def capture_msgs(captured):
    return " | ".join(w["message"] for w in captured)


def sim_kwargs(**overrides):
    kwargs = dict(
        center=(0, 0, 0), size=(2, 2, 2), run_time=1e-13,
        sources=[DIPOLE],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1),
    )
    kwargs.update(overrides)
    return kwargs


def make(**overrides):
    return td.Simulation(**sim_kwargs(**overrides))


# --------------------------------------------------------------------- #
# name / count validators
# --------------------------------------------------------------------- #

def test_monitor_names_unique_fail_and_pass():
    mon = td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 1), freqs=[FREQ0],
                         name="m")
    with pytest.raises(SetupError, match="not unique"):
        make(monitors=[mon, mon.updated_copy(size=(0.5, 0.5, 0.5))])
    sim = make(monitors=[mon, mon.updated_copy(name="m2")])
    assert len(sim.monitors) == 2


def test_max_sources_fail_and_pass():
    from tidy3d_tpu.components.simulation import MAX_NUM_SOURCES

    with pytest.raises(SetupError, match="Too many sources"):
        make(sources=[DIPOLE] * (MAX_NUM_SOURCES + 1))
    make(sources=[DIPOLE] * 3)


# --------------------------------------------------------------------- #
# bounds validators
# --------------------------------------------------------------------- #

def test_source_outside_bounds_fail_and_pass():
    far = DIPOLE.updated_copy(center=(50, 0, 0))
    with pytest.raises(SetupError, match="outside of the simulation"):
        make(sources=[far])
    make(sources=[DIPOLE.updated_copy(center=(0.9, 0, 0))])


def test_monitor_outside_bounds_fail():
    mon = td.FieldMonitor(center=(50, 0, 0), size=(1, 1, 0), freqs=[FREQ0],
                          name="far")
    with pytest.raises(SetupError, match="outside of the simulation"):
        make(monitors=[mon])


def test_structure_outside_bounds_warns(warnings_captured):
    st = td.Structure(geometry=td.Box(center=(50, 0, 0), size=(1, 1, 1)),
                      medium=td.Medium(permittivity=2.0))
    make(structures=[st])
    assert "outside" in capture_msgs(warnings_captured)


def test_structure_inside_bounds_no_warning(warnings_captured):
    st = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(1, 1, 1)),
                      medium=td.Medium(permittivity=2.0))
    make(structures=[st])
    assert "completely outside" not in capture_msgs(warnings_captured)


def test_integration_surface_outside_fail_and_pass():
    mon = td.FluxMonitor(center=(0, 0, 5), size=(1, 1, 1), freqs=[FREQ0],
                         name="f")
    # intersects() is true for the enclosing box check but the surfaces
    # themselves must overlap the domain
    with pytest.raises(SetupError):
        make(monitors=[mon])
    make(monitors=[mon.updated_copy(center=(0, 0, 0))])


# --------------------------------------------------------------------- #
# zero-size-axis validators
# --------------------------------------------------------------------- #

def _kwargs_2d(**overrides):
    kwargs = sim_kwargs(
        size=(2, 2, 0),
        boundary_spec=td.BoundarySpec(
            x=td.Boundary.pml(), y=td.Boundary.pml(),
            z=td.Boundary.periodic()))
    kwargs.update(overrides)
    return kwargs


def test_zero_dim_absorbing_boundary_fail_and_pass():
    with pytest.raises(SetupError, match="zero-size axis"):
        td.Simulation(**_kwargs_2d(
            boundary_spec=td.BoundarySpec.all_sides(td.PML())))
    td.Simulation(**_kwargs_2d())


def test_zero_dim_bloch_fail():
    with pytest.raises(SetupError, match="Bloch"):
        td.Simulation(**_kwargs_2d(boundary_spec=td.BoundarySpec(
            x=td.Boundary.pml(), y=td.Boundary.pml(),
            z=td.Boundary.bloch(bloch_vec=0.2))))


def test_zero_dim_symmetry_fail():
    with pytest.raises(SetupError, match="symmetry"):
        td.Simulation(**_kwargs_2d(symmetry=(0, 0, 1)))


def test_zero_dim_mismatched_kinds_fail():
    with pytest.raises(SetupError, match="same kind"):
        td.Simulation(**_kwargs_2d(boundary_spec=td.BoundarySpec(
            x=td.Boundary.pml(), y=td.Boundary.pml(),
            z=td.Boundary(minus=td.PECBoundary(), plus=td.PMCBoundary()))))


# --------------------------------------------------------------------- #
# plane-wave / boundary compatibility
# --------------------------------------------------------------------- #

def _pw(theta=0.0):
    return td.PlaneWave(center=(0, 0, -0.5), size=(td.inf, td.inf, 0),
                        source_time=GP, direction="+", angle_theta=theta)


def _bspec(xy):
    return td.BoundarySpec(x=xy, y=xy, z=td.Boundary.pml())


def test_plane_wave_normal_periodic_ok(warnings_captured):
    make(sources=[_pw()], boundary_spec=_bspec(td.Boundary.periodic()))
    assert "periodic-type boundary" not in capture_msgs(warnings_captured)


def test_plane_wave_normal_pml_warns(warnings_captured):
    make(sources=[_pw()])
    assert "periodic-type boundary" in capture_msgs(warnings_captured)


def test_plane_wave_angled_absorber_fail():
    with pytest.raises(SetupError, match="[Aa]ngled plane wave"):
        make(sources=[_pw(theta=0.3)],
             boundary_spec=_bspec(td.Boundary.pml()))


def test_plane_wave_angled_periodic_warns(warnings_captured):
    make(sources=[_pw(theta=0.3)],
         boundary_spec=_bspec(td.Boundary.periodic()))
    assert "Bloch" in capture_msgs(warnings_captured)


def test_plane_wave_angled_bloch_ok(warnings_captured):
    make(sources=[_pw(theta=0.3)],
         boundary_spec=_bspec(td.Boundary.bloch(bloch_vec=0.4)))
    assert "Bloch vector" not in capture_msgs(warnings_captured)


# --------------------------------------------------------------------- #
# symmetry validators
# --------------------------------------------------------------------- #

def test_bloch_with_symmetry_fail_and_pass():
    bspec = td.BoundarySpec(x=td.Boundary.bloch(bloch_vec=0.3),
                            y=td.Boundary.periodic(), z=td.Boundary.pml())
    with pytest.raises(SetupError, match="[Bb]loch"):
        make(boundary_spec=bspec, symmetry=(1, 0, 0))
    make(boundary_spec=bspec, symmetry=(0, 0, 1))


def test_symmetry_noninteger_bloch_fail_and_pass():
    bspec = td.BoundarySpec(x=td.Boundary.bloch(bloch_vec=1.0),
                            y=td.Boundary.periodic(), z=td.Boundary.pml())
    # integer Bloch vector + symmetry on that axis passes _symmetry_
    # boundaries but still trips _bloch_with_symmetry — expect the raise
    with pytest.raises(SetupError):
        make(boundary_spec=bspec, symmetry=(1, 0, 0))


def test_tfsf_with_symmetry_fail_and_pass():
    tfsf = td.TFSF(center=(0, 0, 0), size=(1, 1, 1), source_time=GP,
                   injection_axis=2, direction="+")
    with pytest.raises(SetupError, match="TFSF"):
        make(sources=[tfsf], symmetry=(0, -1, 0))
    make(sources=[tfsf])


# --------------------------------------------------------------------- #
# diffraction monitors
# --------------------------------------------------------------------- #

def test_diffraction_monitor_boundaries_fail_and_pass():
    mon = td.DiffractionMonitor(center=(0, 0, 0.8), size=(td.inf, td.inf, 0),
                                freqs=[FREQ0], name="d", normal_dir="+")
    with pytest.raises(SetupError, match="periodic or Bloch"):
        make(monitors=[mon])
    make(monitors=[mon], boundary_spec=_bspec(td.Boundary.periodic()))


# --------------------------------------------------------------------- #
# 2D media
# --------------------------------------------------------------------- #

def test_medium2d_on_3d_geometry_fail_and_pass():
    med2d = td.Medium2D(ss=td.Medium(conductivity=1e-4),
                        tt=td.Medium(conductivity=1e-4))
    bad = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(1, 1, 1)),
                       medium=med2d)
    with pytest.raises(SetupError, match="Medium2D"):
        make(structures=[bad])
    sheet = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(1, 1, 0)),
                         medium=med2d)
    make(structures=[sheet])


# --------------------------------------------------------------------- #
# normalize_index
# --------------------------------------------------------------------- #

def test_normalize_index_out_of_bounds_fail_and_pass():
    with pytest.raises(SetupError, match="normalize_index"):
        make(normalize_index=3)
    make(normalize_index=0)


def test_normalize_index_zero_amplitude_warns(warnings_captured):
    src = td.PointDipole(
        center=(0, 0, 0), polarization="Ez",
        source_time=td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH,
                                     amplitude=0.0))
    make(sources=[src], normalize_index=0)
    assert "zero" in capture_msgs(warnings_captured)


# --------------------------------------------------------------------- #
# homogeneity validators
# --------------------------------------------------------------------- #

def test_plane_wave_two_media_fail_and_pass():
    # an x-interface CUTS the source plane -> two media on the plane
    half = td.Structure(
        geometry=td.Box(center=(0.5, 0, 0), size=(1, td.inf, td.inf)),
        medium=td.Medium(permittivity=4.0))
    with pytest.raises(SetupError, match="more than one medium"):
        make(sources=[_pw()], structures=[half],
             boundary_spec=_bspec(td.Boundary.periodic()))
    # structure away from the source plane passes
    make(sources=[_pw()], structures=[half.updated_copy(
        geometry=td.Box(center=(0, 0, 0.9), size=(td.inf, td.inf, 0.2)))],
        boundary_spec=_bspec(td.Boundary.periodic()))


def test_plane_wave_anisotropic_medium_fail():
    aniso = td.AnisotropicMedium(xx=td.Medium(permittivity=2),
                                 yy=td.Medium(permittivity=3),
                                 zz=td.Medium(permittivity=4))
    # the source plane embedded in a SINGLE anisotropic medium (the
    # simulation background) trips the anisotropy branch specifically
    with pytest.raises(SetupError, match="anisotropic"):
        make(sources=[_pw()], medium=aniso,
             boundary_spec=_bspec(td.Boundary.periodic()))


def test_projection_monitor_two_media_fail_and_pass():
    mon = td.FieldProjectionAngleMonitor(
        center=(0, 0, 0.5), size=(1.5, 1.5, 0), freqs=[FREQ0], name="p",
        theta=[0.0], phi=[0.0], proj_distance=1e6)
    half = td.Structure(
        geometry=td.Box(center=(0.75, 0, 0.5), size=(0.5, 3, 0.5)),
        medium=td.Medium(permittivity=4.0))
    with pytest.raises(SetupError, match="more than one medium"):
        make(monitors=[mon], structures=[half])
    make(monitors=[mon])


def test_projection_distance_warns(warnings_captured):
    mon = td.FieldProjectionAngleMonitor(
        center=(0, 0, 0.5), size=(1.5, 1.5, 0), freqs=[FREQ0], name="p",
        theta=[0.0], phi=[0.0], proj_distance=2.0)
    make(monitors=[mon])
    assert "proj_distance" in capture_msgs(warnings_captured)


# --------------------------------------------------------------------- #
# frequency-range warnings
# --------------------------------------------------------------------- #

def test_monitor_freqs_outside_source_spectrum_warns(warnings_captured):
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0),
                          freqs=[FREQ0 * 5], name="m")
    make(monitors=[mon])
    assert "spectral range" in capture_msgs(warnings_captured)


def test_monitor_freqs_inside_source_spectrum_no_warn(warnings_captured):
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0),
                          freqs=[FREQ0], name="m")
    make(monitors=[mon])
    assert "spectral range" not in capture_msgs(warnings_captured)


def test_monitor_freqs_outside_medium_range_warns(warnings_captured):
    med = td.Medium(permittivity=4.0,
                    frequency_range=(FREQ0 * 2, FREQ0 * 3))
    st = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(1, 1, 1)),
                      medium=med)
    mon = td.FluxMonitor(center=(0, 0, 0), size=(1, 1, 1), freqs=[FREQ0],
                         name="m")
    make(structures=[st], monitors=[mon])
    assert "frequency_range" in capture_msgs(warnings_captured)


# --------------------------------------------------------------------- #
# PML-structure interaction
# --------------------------------------------------------------------- #

def test_structure_terminates_in_pml_warns(warnings_captured):
    # domain is 2 wide; PML extends beyond +/-1: a box ending at 1.05
    # terminates inside the PML region
    st = td.Structure(geometry=td.Box(center=(0, 0, 0.5),
                                      size=(0.5, 0.5, 1.1)),
                      medium=td.Medium(permittivity=4.0))
    make(structures=[st])
    assert "PML" in capture_msgs(warnings_captured)


def test_structure_through_pml_no_warn(warnings_captured):
    st = td.Structure(geometry=td.Box(center=(0, 0, 0),
                                      size=(0.5, 0.5, 100.0)),
                      medium=td.Medium(permittivity=4.0))
    make(structures=[st])
    assert "terminates inside the PML" not in capture_msgs(
        warnings_captured)


# --------------------------------------------------------------------- #
# custom source time
# --------------------------------------------------------------------- #

def test_custom_source_time_short_envelope_warns(warnings_captured):
    times = np.linspace(0, 1e-14, 32)
    cst = td.CustomSourceTime.from_values(
        freq0=FREQ0, fwidth=FWIDTH, values=np.ones(32),
        dt=float(times[1] - times[0]))
    src = td.PointDipole(center=(0, 0, 0), source_time=cst,
                         polarization="Ez")
    make(sources=[src], run_time=1e-13)
    assert "envelope" in capture_msgs(warnings_captured)


# --------------------------------------------------------------------- #
# pre-upload gates (reference: validate_pre_upload, simulation.py:3341)
# --------------------------------------------------------------------- #

def test_pre_upload_no_sources_fail():
    sim = make(sources=[])
    with pytest.raises(SetupError, match="No sources"):
        sim.validate_pre_upload()
    sim2 = make()
    sim2.validate_pre_upload()


def test_pre_upload_too_many_steps_fail():
    sim = make(run_time=4e-9)  # ~2e7 steps > MAX_TIME_STEPS
    with pytest.raises(SetupError, match="time steps"):
        sim.validate_pre_upload()


def test_pre_upload_monitor_data_limit_fail():
    # a 3D broadband field monitor over the whole domain at fine dl
    freqs = np.linspace(0.9 * FREQ0, 1.1 * FREQ0, 700).tolist()
    mon = td.FieldMonitor(center=(0, 0, 0), size=(td.inf, td.inf, td.inf),
                          freqs=freqs, name="huge")
    sim = make(monitors=[mon], grid_spec=td.GridSpec.uniform(dl=0.02))
    with pytest.raises(SetupError, match="monitor data"):
        sim.validate_pre_upload()


def test_monitor_storage_size_scales():
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0),
                          freqs=[FREQ0], name="m")
    mon11 = mon.updated_copy(freqs=np.linspace(
        0.9 * FREQ0, 1.1 * FREQ0, 11).tolist())
    tmesh = np.linspace(0, 1e-13, 1000)
    s1 = mon.storage_size(num_cells=10000, tmesh=tmesh)
    s11 = mon11.storage_size(num_cells=10000, tmesh=tmesh)
    assert s11 == pytest.approx(11 * s1, rel=0.01)


# --------------------------------------------------------------------- #
# derived quantities
# --------------------------------------------------------------------- #

def test_dt_respects_courant():
    from tidy3d_tpu.constants import C_0

    sim_a = make(courant=0.5)
    sim_b = make(courant=0.9)
    assert sim_a.dt < sim_b.dt
    dl = 0.1
    assert sim_b.dt <= 0.99 * dl / (np.sqrt(3) * C_0) * 0.9 / 0.9 + 1e-25


def test_nyquist_step_positive_and_monotone():
    sim = make()
    n1 = sim.nyquist_step()
    assert n1 >= 1
    # a higher-frequency source needs a finer (smaller) Nyquist stride
    hi = td.PointDipole(
        center=(0, 0, 0), polarization="Ez",
        source_time=td.GaussianPulse(freq0=4 * FREQ0, fwidth=FWIDTH))
    sim_hi = make(sources=[hi])
    assert sim_hi.nyquist_step() <= n1


def test_tmesh_consistent_with_run_time():
    sim = make(run_time=2e-13)
    assert sim.num_time_steps == len(sim.tmesh)
    assert sim.tmesh[-1] <= 2e-13 + sim.dt
    assert np.allclose(np.diff(sim.tmesh), sim.dt)


def test_schema_version_migration_warns(warnings_captured):
    sim = make()
    d = sim.model_dump_json()
    import json as _json

    dd = _json.loads(d)
    dd["version"] = "1.0.0"
    td.Simulation.model_validate(dd)
    assert "schema version" in capture_msgs(warnings_captured)
