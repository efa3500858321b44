"""EME solver: per-cell mode solve + mode-matching transfer matrices.

The reference keeps its EME engine cloud-side (SURVEY.md §2.3 item 8); here
it is built on the native mode solver. Per cell the cross-section modes are
solved at the cell center; interfaces couple neighboring mode bases through
unconjugated reciprocal overlap integrals (mode matching):

    F' + B' = D^-1 P^T (F + B),   F' - B' = D^-1 R (F - B)

with P_ab = 1/2 int (E^A_a x H^B_b).n, R_ba = 1/2 int (E^B_b x H^A_a).n and
D the self-overlap normalization of basis B. Cells propagate with diagonal
exp(+i beta L) phases; the cascade is accumulated as transfer matrices and
converted to the port S-matrix.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..components.data.data_array import EMESMatrixDataArray, EMEModeIndexDataArray
from ..components.eme.data import EMESimulationData, EMESMatrixDataset
from ..components.eme.simulation import EMESimulation
from ..components.eme.sweep import EMEFreqSweep, EMELengthSweep, EMEModeSweep
from ..components.geometry.base import Box
from ..constants import C_0, inf
from ..exceptions import SetupError
from ..log import log


def run_eme(eme_sim: EMESimulation, verbose: bool = False) -> EMESimulationData:
    """Solve an EME simulation."""
    from ..plugins.mode.mode_solver import ModeSolver

    fdtd_sim = eme_sim._to_fdtd_sim()
    freqs = np.atleast_1d(np.asarray(eme_sim.freqs, dtype=float))
    axis = eme_sim.axis
    centers = eme_sim.cell_centers
    lengths = eme_sim.cell_lengths
    mode_specs = eme_sim.mode_specs
    num_cells = len(centers)

    # sweep handling: length scaling, perturbative frequency scaling (both
    # scale the accumulated propagation phase), or retained-mode-count sweep
    sweep_spec = eme_sim.sweep_spec
    sweep_mode_counts = None
    if isinstance(sweep_spec, EMELengthSweep):
        sweep_scales = np.asarray(sweep_spec.scale_factors, dtype=float)
    elif isinstance(sweep_spec, EMEFreqSweep):
        sweep_scales = np.asarray(sweep_spec.freq_scale_factors, dtype=float)
    elif isinstance(sweep_spec, EMEModeSweep):
        sweep_mode_counts = [int(n) for n in sweep_spec.num_modes]
        sweep_scales = np.ones(len(sweep_mode_counts))
    else:
        sweep_scales = np.array([1.0])
    num_sweep = len(sweep_scales)

    # solve modes per cell
    cell_modes = []
    for ci, (pos, mode_spec) in enumerate(zip(centers, mode_specs)):
        plane_center = list(eme_sim.center)
        plane_center[axis] = float(pos)
        plane_size = list(eme_sim.size)
        plane_size[axis] = 0.0
        # 2D EME sims: a zero-extent transverse dim is the homogeneous axis;
        # the mode plane spans it fully (same convention as ModeMonitor)
        for d in range(3):
            if d != axis and plane_size[d] == 0.0:
                plane_size[d] = inf
        solver = ModeSolver(
            simulation=fdtd_sim, plane=Box(center=tuple(plane_center),
                                           size=tuple(plane_size)),
            mode_spec=mode_spec, freqs=freqs.tolist(), colocate=False,
        )
        cell_modes.append(solver.data_raw)
        if verbose:
            log.info(f"EME cell {ci + 1}/{num_cells} solved.")

    num_modes = min(ms.num_modes for ms in mode_specs)
    n_complex = np.zeros((len(freqs), num_sweep, num_cells, num_modes),
                         dtype=complex)

    s11 = np.zeros((len(freqs), num_sweep, num_modes, num_modes), dtype=complex)
    s12 = np.zeros_like(s11)
    s21 = np.zeros_like(s11)
    s22 = np.zeros_like(s11)

    for fi, freq in enumerate(freqs):
        k0 = 2 * np.pi * freq / C_0
        betas = []
        for ci in range(num_cells):
            n_c = cell_modes[ci].n_complex.values[fi, :num_modes]
            betas.append(k0 * n_c)
        for si, scale in enumerate(sweep_scales):
            n_complex[fi, si] = np.stack(betas) / k0
            nm = num_modes if sweep_mode_counts is None \
                else min(sweep_mode_counts[si], num_modes)
            T = np.eye(2 * nm, dtype=complex)
            for ci in range(num_cells):
                # propagation through the cell
                phase = np.exp(1j * betas[ci][:nm] * lengths[ci] * scale)
                P = np.zeros((2 * nm, 2 * nm), dtype=complex)
                P[:nm, :nm] = np.diag(phase)
                P[nm:, nm:] = np.diag(1.0 / phase)
                T = P @ T
                if ci < num_cells - 1:
                    T = _interface_transfer(cell_modes[ci], cell_modes[ci + 1],
                                            fi, nm, axis) @ T
            s = _transfer_to_smatrix(T, nm)
            s = _apply_constraint(s, eme_sim.constraint, nm)
            s11[fi, si, :nm, :nm], s12[fi, si, :nm, :nm], \
                s21[fi, si, :nm, :nm], s22[fi, si, :nm, :nm] = s

    coords = dict(
        f=freqs, sweep_index=np.arange(num_sweep),
        mode_index_out=np.arange(num_modes), mode_index_in=np.arange(num_modes),
    )
    smatrix = EMESMatrixDataset(
        S11=EMESMatrixDataArray(s11, coords=coords),
        S12=EMESMatrixDataArray(s12, coords=coords),
        S21=EMESMatrixDataArray(s21, coords=coords),
        S22=EMESMatrixDataArray(s22, coords=coords),
    )
    n_da = EMEModeIndexDataArray(
        n_complex, coords=dict(f=freqs, sweep_index=np.arange(num_sweep),
                               eme_cell_index=np.arange(num_cells),
                               mode_index=np.arange(num_modes)))
    return EMESimulationData(simulation=eme_sim, smatrix=smatrix, n_complex=n_da)


# --------------------------------------------------------------------------- #
# overlaps / matrices
# --------------------------------------------------------------------------- #


def _mode_fields_on_common_grid(data_a, data_b, fi: int, num_modes: int, axis: int):
    """Tangential fields of both bases interpolated to basis A's E grid."""
    b_dim = "xyz"[(axis + 1) % 3]
    c_dim = "xyz"[(axis + 2) % 3]

    def get(data, comp, target=None):
        arr = getattr(data, comp)
        arr = arr.isel(f=fi)
        # squeeze the normal axis
        n_dim = "xyz"[axis]
        if n_dim in arr.dims:
            arr = arr.isel(**{n_dim: 0})
        if target is not None:
            arr = arr.interp(coords=target, kwargs=dict(fill_value=0.0))
        return arr

    e_ref = get(data_a, f"E{b_dim}")
    target = {b_dim: e_ref.coords[b_dim], c_dim: e_ref.coords[c_dim]}
    fields = {}
    for tag, data in (("A", data_a), ("B", data_b)):
        for comp in (f"E{b_dim}", f"E{c_dim}", f"H{b_dim}", f"H{c_dim}"):
            fields[f"{tag}_{comp}"] = get(data, comp, target).values[..., :num_modes]
    wb = np.gradient(np.asarray(e_ref.coords[b_dim], dtype=float)) \
        if len(e_ref.coords[b_dim]) > 1 else np.ones(1)
    wc = np.gradient(np.asarray(e_ref.coords[c_dim], dtype=float)) \
        if len(e_ref.coords[c_dim]) > 1 else np.ones(1)
    return fields, b_dim, c_dim, wb, wc


def _interface_transfer(data_a, data_b, fi: int, num_modes: int, axis: int
                        ) -> np.ndarray:
    """Transfer matrix across the interface from basis A to basis B."""
    fields, b_dim, c_dim, wb, wc = _mode_fields_on_common_grid(
        data_a, data_b, fi, num_modes, axis)
    w2 = wb[:, None] * wc[None, :]

    def cross_int(e_tag, h_tag):
        # 1/2 int (E^e x H^h) . n  -> matrix (modes_e, modes_h)
        eb = fields[f"{e_tag}_E{b_dim}"]
        ec = fields[f"{e_tag}_E{c_dim}"]
        hb = fields[f"{h_tag}_H{b_dim}"]
        hc = fields[f"{h_tag}_H{c_dim}"]
        integrand = (np.einsum("xym,xyn->mn", eb * w2[..., None], hc)
                     - np.einsum("xym,xyn->mn", ec * w2[..., None], hb))
        return 0.5 * integrand

    P = cross_int("A", "B")          # (a, b)
    R = cross_int("B", "A")          # (b, a)
    NB = np.diag(cross_int("B", "B"))  # self overlap of B

    D_inv = np.diag(1.0 / NB)
    M1 = D_inv @ P.T   # maps (F+B) -> (F'+B')
    M2 = D_inv @ R     # maps (F-B) -> (F'-B')
    n = num_modes
    T = np.zeros((2 * n, 2 * n), dtype=complex)
    T[:n, :n] = 0.5 * (M1 + M2)
    T[:n, n:] = 0.5 * (M1 - M2)
    T[n:, :n] = 0.5 * (M1 - M2)
    T[n:, n:] = 0.5 * (M1 + M2)
    return T


def _apply_constraint(s_blocks, constraint, n: int):
    """Project the S-matrix onto the passive (singular values <= 1) or
    unitary (= 1) set; truncating the mode basis at an interface can
    otherwise produce slight gain (reference: eme/simulation.py constraint
    field)."""
    if constraint not in ("passive", "unitary"):
        return s_blocks
    s11, s12, s21, s22 = s_blocks
    S = np.block([[s11, s12], [s21, s22]])
    u, sv, vh = np.linalg.svd(S)
    sv = np.minimum(sv, 1.0) if constraint == "passive" else np.ones_like(sv)
    S = (u * sv) @ vh
    return S[:n, :n], S[:n, n:], S[n:, :n], S[n:, n:]


def _transfer_to_smatrix(T: np.ndarray, n: int):
    """Convert a total transfer matrix [F_out; B_out] = T [F_in; B_in] into
    S-matrix blocks (S11, S12, S21, S22)."""
    T11 = T[:n, :n]
    T12 = T[:n, n:]
    T21 = T[n:, :n]
    T22 = T[n:, n:]
    T22_inv = np.linalg.pinv(T22)
    S21 = T11 - T12 @ T22_inv @ T21
    S11 = -T22_inv @ T21
    S12 = T22_inv
    S22_ = T12 @ T22_inv
    return S11, S12, S21, S22_
