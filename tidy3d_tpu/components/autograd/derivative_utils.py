"""Shape-derivative adjoint inputs: forward/adjoint fields near a structure.

Behavioral model: the reference's ``DerivativeInfo``
(/root/reference/tidy3d/components/autograd/derivative_utils.py:19), which
carries forward and adjoint E fields, permittivity data, inside/outside
permittivities and structure bounds into ``Geometry.compute_derivatives`` /
``Medium.compute_derivatives``. The math here is the standard continuum
shape derivative of a dielectric interface:

    dJ/d(outward shift) = Re{ pref * [ (eps_in - eps_out) E_par,f . E_par,a
                                - (1/eps_out - 1/eps_in) D_n,f . D_n,a ] } dA

with D = eps_r E (relative units) and pref = 2 k0^2 exp(-i w dt) per
frequency, where the exp(-i w dt) corrects the half-step offset between the
source-spectrum normalization time base and the actual injection/DFT time
bases of the two runs (derivation in web/autograd.py).

All fields are evaluated by trilinear interpolation from the adjoint
gradient monitors' raw (non-colocated) Yee samples.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ...constants import C_0

E_COMPS = ("Ex", "Ey", "Ez")


class _Field3:
    """Trilinear interpolator over a (nx, ny, nz) complex array."""

    def __init__(self, values: np.ndarray, coords: Dict[str, np.ndarray]):
        self.values = np.asarray(values)
        self.coords = {d: np.asarray(coords[d], dtype=float) for d in "xyz"}

    def __call__(self, x, y, z) -> np.ndarray:
        """Evaluate at broadcastable point arrays (clamped at edges)."""
        pts = np.broadcast_arrays(np.asarray(x, float), np.asarray(y, float),
                                  np.asarray(z, float))
        out_shape = pts[0].shape
        idx = []
        frac = []
        for d, p in zip("xyz", pts):
            c = self.coords[d]
            if len(c) == 1:
                idx.append((np.zeros(p.shape, int), np.zeros(p.shape, int)))
                frac.append(np.zeros(p.shape))
                continue
            i = np.clip(np.searchsorted(c, p) - 1, 0, len(c) - 2)
            f = (p - c[i]) / (c[i + 1] - c[i])
            idx.append((i, i + 1))
            frac.append(np.clip(f, 0.0, 1.0))
        v = self.values
        out = np.zeros(out_shape, dtype=v.dtype)
        for bx in (0, 1):
            wx = frac[0] if bx else (1 - frac[0])
            for by in (0, 1):
                wy = frac[1] if by else (1 - frac[1])
                for bz in (0, 1):
                    wz = frac[2] if bz else (1 - frac[2])
                    out = out + (wx * wy * wz) * v[idx[0][bx], idx[1][by],
                                                   idx[2][bz]]
        return out


def quad_weights(coords: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Cell-integration weights of sample points covering [lo, hi]."""
    coords = np.asarray(coords, dtype=float)
    if len(coords) == 0:
        return coords
    if len(coords) == 1:
        return np.array([max(hi - lo, 0.0)])
    mids = 0.5 * (coords[1:] + coords[:-1])
    edges = np.clip(np.concatenate([[lo], mids, [hi]]), lo, hi)
    return np.maximum(np.diff(edges), 0.0)


class DerivativeInfo:
    """Forward/adjoint fields and permittivities for one traced structure
    at one frequency.

    ``E_fwd`` / ``E_adj``: dict comp -> (complex ndarray, coords dict) on
    the gradient FieldMonitor's raw Yee grids. ``eps_data``: same layout
    from the PermittivityMonitor. ``eps_in`` / ``eps_out``: complex
    relative permittivities inside/outside the structure.
    """

    def __init__(self, E_fwd: Dict[str, Tuple[np.ndarray, dict]],
                 E_adj: Dict[str, Tuple[np.ndarray, dict]],
                 eps_data: Optional[Dict[str, Tuple[np.ndarray, dict]]],
                 eps_in: complex, eps_out: complex, frequency: float,
                 bounds: Tuple[Tuple[float, float, float],
                               Tuple[float, float, float]],
                 dt: float = 0.0):
        self.fwd = {c: _Field3(*E_fwd[c]) for c in E_fwd}
        self.adj = {c: _Field3(*E_adj[c]) for c in E_adj}
        self.eps = {c: _Field3(*eps_data[c]) for c in eps_data} \
            if eps_data else None
        self.eps_in = complex(eps_in)
        self.eps_out = complex(eps_out)
        self.frequency = float(frequency)
        self.bounds = bounds
        omega = 2 * np.pi * self.frequency
        k0 = omega / C_0
        # 2 k0^2 from the shape-derivative chain; exp(-i w dt) corrects the
        # dt/2 offset each of the two runs carries between its normalization
        # time base (tmesh) and its injection time base (tmesh + dt/2)
        self.prefactor = 2.0 * k0**2 * np.exp(-1j * omega * dt)

    # ------------------------------------------------------------------ #
    # sampled products
    # ------------------------------------------------------------------ #

    def sample_coords(self, comp: str) -> Dict[str, np.ndarray]:
        return self.fwd[comp].coords

    def e_prod(self, comp: str, x, y, z) -> np.ndarray:
        """E_fwd(comp) * E_adj(comp) at the given points (complex)."""
        return self.fwd[comp](x, y, z) * self.adj[comp](x, y, z)

    def d_prod(self, comp: str, x, y, z) -> np.ndarray:
        """(eps_r E)_fwd * (eps_r E)_adj at the given points, using the
        measured permittivity for continuity across the interface."""
        if self.eps is not None and comp in self.eps:
            eps = self.eps[comp](x, y, z)
        else:
            eps = 0.5 * (self.eps_in + self.eps_out)
        return (eps * self.fwd[comp](x, y, z)) * (eps * self.adj[comp](x, y, z))

    def e_vec(self, which: str, x, y, z) -> np.ndarray:
        """Stacked (3, ...) E vector of the fwd/adj run at the points."""
        fields = self.fwd if which == "fwd" else self.adj
        return np.stack([fields[c](x, y, z) for c in E_COMPS])

    def d_vec(self, which: str, x, y, z) -> np.ndarray:
        """Stacked (3, ...) relative-D vector (eps_r E) at the points."""
        fields = self.fwd if which == "fwd" else self.adj
        out = []
        for c in E_COMPS:
            if self.eps is not None and c in self.eps:
                eps = self.eps[c](x, y, z)
            else:
                eps = 0.5 * (self.eps_in + self.eps_out)
            out.append(eps * fields[c](x, y, z))
        return np.stack(out)

    # ------------------------------------------------------------------ #
    # interface integrand
    # ------------------------------------------------------------------ #

    def surface_integrand(self, normal: np.ndarray, x, y, z) -> np.ndarray:
        """The interface shape-derivative integrand at surface points.

        ``normal``: (3,) or (3, ...) outward unit normal(s). Returns the
        complex integrand per unit area (prefactor NOT applied):
        delta_eps * E_par.E_par - delta_inv_eps * D_n.D_n.
        """
        normal = np.asarray(normal)
        if normal.ndim == 1:
            normal = normal.reshape((3,) + (1,) * np.ndim(
                np.broadcast_arrays(np.asarray(x), np.asarray(y),
                                    np.asarray(z))[0]))
        ef = self.e_vec("fwd", x, y, z)
        ea = self.e_vec("adj", x, y, z)
        df = self.d_vec("fwd", x, y, z)
        da = self.d_vec("adj", x, y, z)
        dn_f = np.sum(normal * df, axis=0)
        dn_a = np.sum(normal * da, axis=0)
        # parallel E = E - n (n . E)
        en_f = np.sum(normal * ef, axis=0)
        en_a = np.sum(normal * ea, axis=0)
        epar = np.sum(ef * ea, axis=0) - en_f * en_a
        d_eps = self.eps_in - self.eps_out
        d_inv = 1.0 / self.eps_out - 1.0 / self.eps_in
        return d_eps * epar - d_inv * dn_f * dn_a

    def real_grad(self, integral: np.ndarray) -> np.ndarray:
        """Fold the physics prefactor and take the real part."""
        return np.real(self.prefactor * integral)
