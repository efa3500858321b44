"""Field-source profile generation: plane waves, Gaussian beams, mode sources.

Produces the complex tangential field profiles (E, H) of the desired wave on
the source plane, evaluated at the exact Yee positions of each component
(including the half-cell stagger along the normal via the e^{i k_a da}
factor). The lowering turns these into equivalence-principle currents
J_s = -n x H, M_s = n x E for unidirectional injection
(reference behavior: tidy3d's CustomFieldSource docstring and server-side
mode injection, monitor_data.py:553-570 grid corrections).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..components.medium import PECMedium
from ..components.source import (
    CustomFieldSource,
    GaussianBeam,
    ModeSource,
    PlaneWave,
)
from ..constants import C_0, EPSILON_0, ETA_0, MU_0
from ..exceptions import SetupError
from .lowering_utils import slices_for_box, yee_coords


def make_source_fields(simulation, source) -> Tuple[Dict[str, dict], int]:
    """Compute tangential (and normal) field profiles of a field source.

    Returns ({comp: {"profile": complex array, "slices": (sx, sy, sz)}}, axis).
    Profiles are the desired propagating-wave fields at each Yee point of the
    source plane; H in units of E/eta0.
    """
    plane_axis = tuple(source.size).index(0.0)
    if isinstance(source, PlaneWave):
        return _plane_wave_fields(simulation, source, plane_axis), plane_axis
    if isinstance(source, GaussianBeam):
        return _gaussian_beam_fields(simulation, source, plane_axis), plane_axis
    if isinstance(source, ModeSource):
        return _mode_source_fields(simulation, source, plane_axis), plane_axis
    if isinstance(source, CustomFieldSource):
        return _custom_field_fields(simulation, source, plane_axis), plane_axis
    raise NotImplementedError(f"field source type {type(source).__name__}")


# --------------------------------------------------------------------------- #
# helpers
# --------------------------------------------------------------------------- #


def _background_index(simulation, source) -> float:
    """Refractive index at the source center."""
    freq0 = source.source_time.freq0
    x0, y0, z0 = source.center
    medium = simulation.medium
    for structure in simulation.structures:
        if structure.geometry.inside(np.array(x0), np.array(y0), np.array(z0)):
            medium = structure.medium
    if isinstance(medium, PECMedium):
        raise SetupError("source is embedded in PEC")
    eps = medium.eps_model(freq0)
    return float(np.real(np.sqrt(eps)))


def _tangential_slices_coords(simulation, source, plane_axis: int):
    """Per-component slices/coords on the source plane (1 cell thick along
    the plane axis, at the Yee position nearest the source center)."""
    grid = simulation.grid
    out = {}
    pos = source.center[plane_axis]
    for comp in ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"):
        sl, coords = slices_for_box(grid, source, comp, extend=False)
        # restrict to one plane along the normal axis
        dim = "xyz"[plane_axis]
        axis_coords = yee_coords(grid, comp)[dim]
        idx = int(np.argmin(np.abs(axis_coords - pos)))
        sl = list(sl)
        sl[plane_axis] = slice(idx, idx + 1)
        coords = dict(coords)
        coords[dim] = axis_coords[idx:idx + 1]
        out[comp] = (tuple(sl), coords)
    return out


def _wave_vectors(source, plane_axis: int, n_medium: float):
    """(k_vec, E_pol, H_pol) in global coordinates for an angled wave."""
    freq0 = source.source_time.freq0
    k0 = 2 * np.pi * freq0 * n_medium / C_0
    theta = getattr(source, "angle_theta", 0.0)
    phi = getattr(source, "angle_phi", 0.0)
    psi = getattr(source, "pol_angle", 0.0)
    s = 1.0 if source.direction == "+" else -1.0

    # local frame: z' = plane_axis, (x', y') = the two other axes in cyclic order
    b, c = (plane_axis + 1) % 3, (plane_axis + 2) % 3
    k_local = np.array([np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
                        s * np.cos(theta)])
    theta_hat = np.array([np.cos(theta) * np.cos(phi), np.cos(theta) * np.sin(phi),
                          -s * np.sin(theta)])
    phi_hat = np.array([-np.sin(phi), np.cos(phi), 0.0])
    e_local = np.cos(psi) * theta_hat + np.sin(psi) * phi_hat
    h_local = np.cos(psi) * phi_hat - np.sin(psi) * theta_hat  # k x E direction

    def to_global(v_local):
        v = np.zeros(3)
        v[b], v[c], v[plane_axis] = v_local[0], v_local[1], v_local[2]
        return v

    k_vec = k0 * to_global(k_local)
    e_pol = to_global(e_local)
    h_pol = (n_medium / ETA_0) * to_global(h_local)
    return k_vec, e_pol, h_pol


def _plane_wave_fields(simulation, source, plane_axis: int) -> Dict[str, dict]:
    n_medium = _background_index(simulation, source)
    k_vec, e_pol, h_pol = _wave_vectors(source, plane_axis, n_medium)
    slices_coords = _tangential_slices_coords(simulation, source, plane_axis)
    origin = np.asarray(source.center)

    fields = {}
    for ci, comp in enumerate(("Ex", "Ey", "Ez", "Hx", "Hy", "Hz")):
        pol = e_pol if comp[0] == "E" else h_pol
        amp = pol[ci % 3]
        sl, coords = slices_coords[comp]
        xs, ys, zs = np.meshgrid(coords["x"], coords["y"], coords["z"],
                                 indexing="ij", sparse=True)
        phase = np.exp(1j * (k_vec[0] * (xs - origin[0]) + k_vec[1] * (ys - origin[1])
                             + k_vec[2] * (zs - origin[2])))
        profile = amp * np.broadcast_to(
            phase, tuple(len(coords[d]) for d in "xyz")).astype(np.complex64)
        fields[comp] = {"profile": profile, "slices": sl}
    return fields


def _gaussian_beam_fields(simulation, source, plane_axis: int) -> Dict[str, dict]:
    """Paraxial Gaussian beam fields at the source plane (normal incidence
    exact; angles applied as a phase ramp + polarization rotation)."""
    n_medium = _background_index(simulation, source)
    freq0 = source.source_time.freq0
    k0 = 2 * np.pi * freq0 * n_medium / C_0
    k_vec, e_pol, h_pol = _wave_vectors(source, plane_axis, n_medium)
    slices_coords = _tangential_slices_coords(simulation, source, plane_axis)
    origin = np.asarray(source.center)
    w0 = source.waist_radius
    s = 1.0 if source.direction == "+" else -1.0
    # distance from waist to source plane along propagation: positive
    # waist_distance means the waist is *behind* the source plane
    z_w = source.waist_distance
    zr = k0 * w0**2 / 2.0

    b, c = (plane_axis + 1) % 3, (plane_axis + 2) % 3

    fields = {}
    for ci, comp in enumerate(("Ex", "Ey", "Ez", "Hx", "Hy", "Hz")):
        pol = e_pol if comp[0] == "E" else h_pol
        amp = pol[ci % 3]
        sl, coords = slices_coords[comp]
        xs, ys, zs = np.meshgrid(coords["x"], coords["y"], coords["z"],
                                 indexing="ij", sparse=True)
        pts = (xs - origin[0], ys - origin[1], zs - origin[2])
        r2 = pts[b] ** 2 + pts[c] ** 2
        z = z_w  # evaluate beam envelope at the plane distance from waist
        wz = w0 * np.sqrt(1 + (z / zr) ** 2)
        inv_R = z / (z**2 + zr**2)
        gouy = np.arctan2(z, zr)
        envelope = (w0 / wz) * np.exp(-r2 / wz**2) * np.exp(
            1j * (s * k0 * inv_R * r2 / 2 - gouy))
        phase = np.exp(1j * (k_vec[0] * pts[0] + k_vec[1] * pts[1] + k_vec[2] * pts[2]))
        profile = (amp * envelope * phase)
        profile = np.broadcast_to(profile, tuple(len(coords[d]) for d in "xyz"))
        fields[comp] = {"profile": profile.astype(np.complex64), "slices": sl}
    return fields


def _mode_source_fields(simulation, source, plane_axis: int) -> Dict[str, dict]:
    """Mode fields from the native mode solver, at the Yee points of the plane."""
    from ..plugins.mode.mode_solver import ModeSolver

    freq0 = source.source_time.freq0
    solver = ModeSolver(
        simulation=simulation,
        plane=source.geometry,
        mode_spec=source.mode_spec,
        freqs=[freq0],
        direction=source.direction,
        colocate=False,
    )
    data = solver.data_raw
    slices_coords = _tangential_slices_coords(simulation, source, plane_axis)

    # propagation phase across the staggered sheet offsets: each Yee component
    # sits at a slightly different normal position z_comp; the mode varies as
    # exp(+/- i beta (z - z0)), which sets the J/M relative phase that makes
    # the injection unidirectional
    n_eff = complex(data.n_complex.values[0, int(source.mode_index)])
    k0 = 2 * np.pi * freq0 / C_0
    beta = k0 * n_eff
    sign = 1.0 if source.direction == "+" else -1.0
    z0 = source.center[plane_axis]
    n_dim = "xyz"[plane_axis]

    fields = {}
    for comp in ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"):
        sl, coords = slices_coords[comp]
        arr = getattr(data, comp, None)
        if arr is None:
            fields[comp] = None
            continue
        sel = arr.isel(f=0, mode_index=int(source.mode_index))
        prof = sel.interp(
            x=coords["x"], y=coords["y"], z=coords["z"],
            kwargs=dict(fill_value=0.0),
        ).values
        delta = float(coords[n_dim][0]) - z0
        phase = np.exp(1j * sign * beta * delta)
        fields[comp] = {"profile": np.asarray(prof * phase, dtype=np.complex64),
                        "slices": sl}
    return fields


def _custom_field_fields(simulation, source, plane_axis: int) -> Dict[str, dict]:
    """Tangential fields from a user-provided FieldDataset."""
    dataset = source.field_dataset
    if dataset is None:
        raise NotImplementedError("CustomFieldSource with no dataset")
    slices_coords = _tangential_slices_coords(simulation, source, plane_axis)
    fields = {}
    get = dataset.get if isinstance(dataset, dict) else lambda k, d=None: getattr(
        dataset, k, d)
    for comp in ("Ex", "Ey", "Ez", "Hx", "Hy", "Hz"):
        arr = get(comp, None) if isinstance(dataset, dict) else get(comp)
        if arr is None:
            continue
        sl, coords = slices_coords[comp]
        prof = arr.interp(
            x=coords["x"], y=coords["y"], z=coords["z"], kwargs=dict(fill_value=0.0),
        ).values
        fields[comp] = {"profile": np.asarray(prof, dtype=np.complex64), "slices": sl}
    return fields
