"""EME solver tests: uniform guide exactness, step junction physics."""

import numpy as np
import pytest

import tidy3d_tpu as td
from tidy3d_tpu.constants import C_0
from tidy3d_tpu.solver.eme import run_eme

WL = 1.55
FREQ0 = C_0 / WL

SI = td.Medium(permittivity=12.25)
OX = td.Medium(permittivity=2.25)


def _eme_sim(structures, length=6.0, num_cells=3, num_modes=2):
    return td.EMESimulation(
        center=(0, 0, 0), size=(length, 4, 0),
        axis=0, freqs=[FREQ0],
        medium=OX,
        structures=structures,
        eme_grid_spec=td.EMEUniformGrid(
            num_cells=num_cells,
            mode_spec=td.EMEModeSpec(num_modes=num_modes, target_neff=3.0)),
        grid_spec=td.GridSpec.uniform(dl=0.04),
    )


def test_eme_uniform_guide_exact():
    """Uniform waveguide: |S21| = 1 per mode with phase exp(i beta L), and
    no reflection or mode mixing."""
    length = 6.0
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.4, td.inf)),
                      medium=SI)
    sim = _eme_sim([wg], length=length)
    data = run_eme(sim)
    s21 = np.asarray(data.smatrix.S21.values)[0, 0]
    s11 = np.asarray(data.smatrix.S11.values)[0, 0]
    # diagonal transmission of unit magnitude
    assert np.allclose(np.abs(np.diag(s21)), 1.0, atol=1e-3)
    # no reflection, no inter-mode coupling
    assert np.max(np.abs(s11)) < 1e-3
    off = s21 - np.diag(np.diag(s21))
    assert np.max(np.abs(off)) < 1e-3
    # phase matches exp(i beta L) of the solved modes
    n_eff = np.asarray(data.n_complex.values)[0, 0, 0]  # first cell
    beta = 2 * np.pi * FREQ0 / C_0 * np.real(n_eff)
    phase_theory = np.exp(1j * beta * length)
    ratio = np.diag(s21) / phase_theory
    assert np.allclose(np.angle(ratio), 0.0, atol=0.02)


def test_eme_step_junction():
    """Width step: energy conservation and reciprocity of the S-matrix."""
    wg_in = td.Structure(
        geometry=td.Box(center=(-1.5, 0, 0), size=(3, 0.4, td.inf)), medium=SI)
    wg_out = td.Structure(
        geometry=td.Box(center=(1.5, 0, 0), size=(3, 0.8, td.inf)), medium=SI)
    sim = _eme_sim([wg_in, wg_out], length=6.0, num_cells=2, num_modes=3)
    data = run_eme(sim)
    s11 = np.asarray(data.smatrix.S11.values)[0, 0]
    s21 = np.asarray(data.smatrix.S21.values)[0, 0]
    s12 = np.asarray(data.smatrix.S12.values)[0, 0]
    s22 = np.asarray(data.smatrix.S22.values)[0, 0]
    S = np.block([[s11, s12], [s21, s22]])
    # passive: no gain in any input combination
    sv = np.linalg.svd(S, compute_uv=False)
    assert sv.max() < 1.0 + 1e-6
    # fundamental-mode launch mostly transmits with little loss to radiation
    p_out = np.abs(s21[:, 0]) ** 2
    p_ref = np.abs(s11[:, 0]) ** 2
    assert p_out.sum() > 0.8
    assert p_out.sum() + p_ref.sum() < 1.0 + 1e-6


def test_eme_length_sweep():
    """Length sweep scales the propagation phase linearly."""
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.4, td.inf)),
                      medium=SI)
    sim = _eme_sim([wg], length=2.0, num_cells=1, num_modes=1).updated_copy(
        sweep_spec=td.EMELengthSweep(scale_factors=[1.0, 2.0]))
    data = run_eme(sim)
    s21 = np.asarray(data.smatrix.S21.values)[0]  # (sweep, modes, modes)
    ph1 = np.angle(s21[0, 0, 0])
    ph2 = np.angle(s21[1, 0, 0])
    # doubling the length doubles the accumulated phase (mod 2 pi)
    assert abs(np.angle(np.exp(1j * (2 * ph1 - ph2)))) < 0.02


def test_eme_mode_and_freq_sweeps():
    """Mode-count sweep converges toward the full basis; freq sweep scales
    the phase."""
    wg = td.Structure(geometry=td.Box(center=(0, 0, 0), size=(td.inf, 0.4, td.inf)),
                      medium=SI)
    sim = _eme_sim([wg], length=2.0, num_cells=1, num_modes=2).updated_copy(
        sweep_spec=td.EMEModeSweep(num_modes=[1, 2]))
    data = run_eme(sim)
    s21 = np.asarray(data.smatrix.S21.values)[0]  # (sweep, 2, 2)
    # sweep entry 0 keeps 1 mode: second row/col zero
    assert abs(s21[0, 0, 0]) > 0.99
    assert np.allclose(s21[0, 1, :], 0) and np.allclose(s21[0, :, 1], 0)
    assert abs(s21[1, 1, 1]) > 0.99

    sim_f = _eme_sim([wg], length=2.0, num_cells=1, num_modes=1).updated_copy(
        sweep_spec=td.EMEFreqSweep(freq_scale_factors=[1.0, 1.02]))
    data_f = run_eme(sim_f)
    s21f = np.asarray(data_f.smatrix.S21.values)[0][:, 0, 0]
    assert abs(np.angle(s21f[0] / s21f[1])) > 1e-3  # phase changed
