"""Time-modulated media: sideband generation at f0 +/- f_mod."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0

WL = 1.5
FREQ0 = C_0 / WL
FM = FREQ0 / 10


def test_modulated_slab_sidebands():
    """Phase modulation index m = k0 L d_eps/(2 n): sidebands at ~m/2."""
    n0 = 2.0
    length = 2.0
    deps = 0.08
    m_idx = (2 * np.pi / WL) * length * deps / (2 * n0)

    pulse = td.GaussianPulse(freq0=FREQ0, fwidth=FREQ0 / 50)
    mod = td.ModulationSpec(permittivity=td.SpaceTimeModulation(
        time_modulation=td.ContinuousWaveTimeModulation(freq0=FM,
                                                        amplitude=deps)))
    slab = td.Structure(
        geometry=td.Box(center=(0, 0, 0), size=(length, td.inf, td.inf)),
        medium=td.Medium(permittivity=n0**2, modulation_spec=mod))
    pw = td.PlaneWave(center=(-2, 0, 0), size=(0, td.inf, td.inf),
                      direction="+", source_time=pulse, pol_angle=np.pi / 2)
    mon = td.FieldMonitor(center=(2, 0, 0), size=(0, 0, 0),
                          freqs=[FREQ0 - FM, FREQ0, FREQ0 + FM], name="out")
    sim = td.Simulation(
        center=(0, 0, 0), size=(5.5, 0.4, 0), run_time=5e-13,
        medium=td.Medium(permittivity=n0**2),
        sources=[pw], monitors=[mon], structures=[slab], shutoff=0.0,
        normalize_index=None,
        boundary_spec=td.BoundarySpec(x=td.Boundary.pml(),
                                      y=td.Boundary.periodic(),
                                      z=td.Boundary.periodic()),
        grid_spec=td.GridSpec.uniform(dl=0.03))
    data = td.web.run(sim, verbose=False)
    ez = np.asarray(data["out"].Ez.values).reshape(-1, 3)
    amps = np.abs(ez).max(axis=0)
    lower, carrier, upper = amps
    assert carrier > 5 * upper  # weak modulation
    assert abs(upper / carrier - m_idx / 2) / (m_idx / 2) < 0.1
    assert abs(lower / carrier - m_idx / 2) / (m_idx / 2) < 0.35
