"""S-matrix component modeler tests (modal)."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.plugins.smatrix import ComponentModeler, Port

WL = 1.5
FREQ0 = C_0 / WL


@pytest.fixture(scope="module")
def straight_smatrix():
    wg = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.5, td.inf)),
        medium=td.Medium(permittivity=6.25))
    sim = td.Simulation(
        center=(0, 0, 0), size=(4.4, 3.2, 0), run_time=1.6e-13,
        structures=[wg], shutoff=0.0,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(), y=td.Boundary.pml(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.05),
    )
    mode_spec = td.ModeSpec(num_modes=1, target_neff=2.3)
    ports = [
        Port(center=(-1.6, 0, 0), size=(0, 2.4, td.inf), direction="+",
             mode_spec=mode_spec, name="left"),
        Port(center=(1.6, 0, 0), size=(0, 2.4, td.inf), direction="-",
             mode_spec=mode_spec, name="right"),
    ]
    modeler = ComponentModeler(simulation=sim, ports=ports, freqs=[FREQ0],
                               verbose=False)
    return modeler.run()


def test_straight_waveguide_transmission(straight_smatrix):
    smat = straight_smatrix
    s21 = complex(smat.sel(port_in="left", port_out="right",
                           mode_index_in=0, mode_index_out=0).values.ravel()[0])
    s11 = complex(smat.sel(port_in="left", port_out="left",
                           mode_index_in=0, mode_index_out=0).values.ravel()[0])
    assert abs(s21) > 0.97
    assert abs(s21) < 1.02
    assert abs(s11) < 0.1


def test_smatrix_reciprocity(straight_smatrix):
    smat = straight_smatrix
    s21 = complex(smat.sel(port_in="left", port_out="right",
                           mode_index_in=0, mode_index_out=0).values.ravel()[0])
    s12 = complex(smat.sel(port_in="right", port_out="left",
                           mode_index_in=0, mode_index_out=0).values.ravel()[0])
    # straight symmetric guide: S21 == S12 to solver accuracy
    assert abs(s21 - s12) < 0.05
