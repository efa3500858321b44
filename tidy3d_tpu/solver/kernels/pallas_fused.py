"""Single-pass fused Pallas kernel: BOTH leapfrog half-steps per HBM round
trip, with an XLA slab/slice correction pass for x-axis CPML and sources.

Motivation (measured on TPU v5e, 384^3 f32): the two-phase kernels move
~74 B/cell/step (read 6 fields + old, write 3, twice). Fusing the E and H
updates into one kernel re-reads only seven x-halo planes and moves
~52 B/cell/step — the update becomes E,H in / E,H out, once.

Mechanics:

* Grid over x blocks of ``BX`` planes. Each program recomputes newE on an
  EXTENDED row range [s, s+BX] (one extra hi row for Ey/Ez) so the in-kernel
  H update has the forward-x neighbor without a second dispatch. H sources
  come in as block + lo/hi halo planes; periodic x wraps via modular
  index_maps.
* CPML psi for y/z axes of BOTH families updates in-kernel (z slabs in the
  transposed (x, z-slab, y) layout, as in the two-phase path).
* What the kernel CANNOT see — current sources (J) injected between the half
  steps, and the x-axis psi recursions — is applied afterwards in XLA as
  *delta corrections*: the E-side deltas are added to newE, then linearly
  propagated to newH (delta of the forward curl), to the y/z psi-H slabs
  they graze, and the x-psi-H recursion is evaluated on the final newE.
  Every correction is slab- or source-slice-sized, so the full-volume
  traffic stays at the fused kernel's ~52 B/cell.

Falls back to the two-phase kernels (pallas_step.py) for nonlinear or
time-modulated media (those apply between the half steps on full volumes)
and for single-plane-x domains; both fall back to XLA for Bloch/sharded
runs. Reference parity: SURVEY.md §2.3 items 1-2 (the engine the reference
keeps server-side)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fdtd import _bslice, _take
from ..lowering import E_COMPS, H_COMPS

VMEM_BUDGET_BYTES = 48 * 1024 * 1024
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


class PallasFusedStepper:
    """One pallas_call per time step (both half-steps) + XLA corrections."""

    def __init__(self, runner, interpret: bool = False):
        self.runner = runner
        self.plan = runner.plan
        self.shape = runner.shape
        self.dtype = runner.dtype
        self.interpret = interpret
        self.bx = self._pick_bx()

    @classmethod
    def supported(cls, runner, interpret: bool = False) -> bool:
        from .pallas_step import PallasStepper

        if not PallasStepper.supported(runner, interpret):
            return False
        plan = runner.plan
        if plan.nonlinear is not None or plan.modulation:
            return False  # full-volume ops between half steps -> two-phase
        nx = runner.shape[0]
        if nx < 2 or nx % 2:
            return False
        return True

    def _pick_bx(self) -> int:
        nx, ny, nz = self.shape
        esize = 4 if self.dtype == jnp.float32 else 2
        plane = ny * nz * esize
        n_blocks = 12 + 6 * len(self.runner.pole_scalars)
        for fam_key in ("coeffs_E", "coeffs_H"):
            for _, (a, b) in self.runner.consts[fam_key].items():
                n_blocks += int(np.ndim(a) > 0) + int(np.ndim(b) > 0)
        # psi slab blocks (in + out): ~2 * 16-wide slabs per axis per family
        for fam in ("dual", "primal"):
            for axis in (1, 2):
                w_lo, w_hi = self.runner.pml_meta[(fam, axis)]
                n_ax = ny if axis == 1 else nz
                n_blocks += 4 * (w_lo + w_hi) / max(n_ax, 1)
        for bx in (8, 4, 2):
            if nx % bx:
                continue
            if 2 * n_blocks * bx * plane <= VMEM_BUDGET_BYTES:
                return bx
        return 2

    # ------------------------------------------------------------------ #
    # the fused kernel
    # ------------------------------------------------------------------ #

    def step_update(self, view: dict, consts: dict):
        """Both half-steps in one pallas_call. Returns (newE, newH, new_psi)
        BEFORE source injection and x-psi corrections — apply
        :meth:`post_corrections` on the results."""
        runner = self.runner
        plan = self.plan
        nx, ny, nz = self.shape
        bx = self.bx
        dtype = self.dtype
        n_prog = nx // bx
        boundaries = plan.boundaries
        pole_scalars = runner.pole_scalars
        x_periodic = boundaries[0][0] not in ("pec", "pmc")

        names: List[str] = []
        arrays: List = []
        specs: List = []

        def add(name, arr, spec):
            names.append(name)
            arrays.append(arr)
            specs.append(spec)

        def blk():
            return pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def lo_plane():
            if x_periodic:
                return pl.BlockSpec((1, ny, nz),
                                    lambda i: ((i * bx - 1) % nx, 0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1, ny, nz),
                                lambda i: (jnp.maximum(i * bx - 1, 0), 0, 0),
                                memory_space=pltpu.VMEM)

        def hi_plane():
            if x_periodic:
                return pl.BlockSpec((1, ny, nz),
                                    lambda i: ((i * bx + bx) % nx, 0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1, ny, nz),
                                lambda i: (jnp.minimum(i * bx + bx, nx - 1),
                                           0, 0),
                                memory_space=pltpu.VMEM)

        H, E = view["H"], view["E"]
        for c in H_COMPS:
            add(f"src_{c}", H[c], blk())
            add(f"hi_{c}", H[c], hi_plane())
        for c in ("Hy", "Hz"):
            add(f"lo_{c}", H[c], lo_plane())
        for c in E_COMPS:
            add(f"old_{c}", E[c], blk())
        for c in ("Ey", "Ez"):
            add(f"hi_{c}", E[c], hi_plane())

        # inverse-step vectors, full in VMEM (tiny); x sliced dynamically
        add("inv_e_x", consts["inv_dual"][0],
            pl.BlockSpec(memory_space=pltpu.VMEM))
        add("inv_e_y", consts["inv_dual"][1],
            pl.BlockSpec(memory_space=pltpu.VMEM))
        add("inv_e_z", consts["inv_dual"][2],
            pl.BlockSpec(memory_space=pltpu.VMEM))
        add("inv_h_x", consts["inv_primal"][0],
            pl.BlockSpec(memory_space=pltpu.VMEM))
        add("inv_h_y", consts["inv_primal"][1],
            pl.BlockSpec(memory_space=pltpu.VMEM))
        add("inv_h_z", consts["inv_primal"][2],
            pl.BlockSpec(memory_space=pltpu.VMEM))

        # material coefficients: static when uniform; blocked (+hi plane for
        # the extended Ey/Ez rows) otherwise
        static_coeffs: Dict[str, tuple] = {}
        for fam, comps, ckey in (("E", E_COMPS, "coeffs_E"),
                                 ("H", H_COMPS, "coeffs_H")):
            host = runner.consts[ckey]
            for c in comps:
                ca_h, cb_h = host[c]
                ca_s = float(ca_h) if np.ndim(ca_h) == 0 else None
                cb_s = float(cb_h) if np.ndim(cb_h) == 0 else None
                static_coeffs[c] = (ca_s, cb_s)
                if ca_s is None:
                    add(f"ca_{c}", consts[ckey][c][0], blk())
                    if c in ("Ey", "Ez"):
                        add(f"ca_hi_{c}", consts[ckey][c][0], hi_plane())
                if cb_s is None:
                    add(f"cb_{c}", consts[ckey][c][1], blk())
                    if c in ("Ey", "Ez"):
                        add(f"cb_hi_{c}", consts[ckey][c][1], hi_plane())

        # dispersive pole currents (E family): blocks + hi planes for Ey/Ez
        for pi, Qp in enumerate(view["Q"]):
            for c in E_COMPS:
                qr, qi = Qp[c]
                add(f"q{pi}_{c}_re", qr, blk())
                add(f"q{pi}_{c}_im", qi, blk())
                if c in ("Ey", "Ez"):
                    add(f"q{pi}hi_{c}_re", qr, hi_plane())
                    add(f"q{pi}hi_{c}_im", qi, hi_plane())

        # psi slabs (y/z axes, both families) + hi planes for E comps Ey/Ez
        psi_meta = []  # (key, fam, comp, axis, side, width, sgn, extended)
        for fam, comps in (("dual", E_COMPS), ("primal", H_COMPS)):
            for ci, comp in enumerate(comps):
                j, k = (ci + 1) % 3, (ci + 2) % 3
                for axis, sgn in ((j, +1), (k, -1)):
                    if axis == 0:
                        continue
                    w_lo, w_hi = runner.pml_meta[(fam, axis)]
                    for side, width in (("lo", w_lo), ("hi", w_hi)):
                        key = f"{comp}|{axis}|{side}"
                        if width == 0 or key not in view["psi"]:
                            continue
                        ext = comp in ("Ey", "Ez")
                        w2 = nz if axis == 1 else ny
                        add(f"psi_{key}", view["psi"][key],
                            pl.BlockSpec((bx, width, w2),
                                         lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
                        if ext:
                            if x_periodic:
                                spec = pl.BlockSpec(
                                    (1, width, w2),
                                    lambda i: ((i * bx + bx) % nx, 0, 0),
                                    memory_space=pltpu.VMEM)
                            else:
                                spec = pl.BlockSpec(
                                    (1, width, w2),
                                    lambda i: (jnp.minimum(i * bx + bx,
                                                           nx - 1), 0, 0),
                                    memory_space=pltpu.VMEM)
                            add(f"psihi_{key}", view["psi"][key], spec)
                        psi_meta.append((key, fam, comp, axis, side, width,
                                         sgn, ext))
        for fam in ("dual", "primal"):
            for axis in (1, 2):
                pml_c = consts["pml"].get(f"{fam}{axis}")
                if pml_c is None:
                    continue
                w_lo, w_hi = runner.pml_meta[(fam, axis)]
                for side, width in (("lo", w_lo), ("hi", w_hi)):
                    if width == 0:
                        continue
                    add(f"b_{fam}{axis}{side}", pml_c[f"b_{side}"],
                        pl.BlockSpec(memory_space=pltpu.VMEM))
                    add(f"c_{fam}{axis}{side}", pml_c[f"c_{side}"],
                        pl.BlockSpec(memory_space=pltpu.VMEM))

        mask_axes: Dict[str, List[int]] = {}
        for ci, comp in enumerate(E_COMPS):
            if comp in runner.consts["wall_masks"]:
                mask_axes[comp] = [ax for ax in range(3) if ax != ci
                                   and boundaries[ax][0] == "pec"]

        names_out = ([f"out_{c}" for c in E_COMPS + H_COMPS]
                     + [f"outpsi_{m[0]}" for m in psi_meta])
        all_names = names + names_out

        def kernel(*refs):
            r = dict(zip(all_names, refs))
            i = pl.program_id(0)
            iota_y = lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
            iota_z = lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
            iotas = {1: iota_y, 2: iota_z}
            s0 = i * bx

            fH = {c: _f32(r[f"src_{c}"][:]) for c in H_COMPS}
            fE = {c: _f32(r[f"old_{c}"][:]) for c in E_COMPS}

            def edge_col(f, kind, side, wrap=None):
                if kind == "pec":
                    return jnp.zeros((1,) + f.shape[1:], jnp.float32)
                if kind == "pmc":
                    return f[:1] if side == "lo" else f[-1:]
                return wrap

            # extended H arrays along x
            H_ext = {}
            for c in H_COMPS:
                hi = _f32(r[f"hi_{c}"][:])
                if not x_periodic:
                    # at the last program the clamped hi plane only feeds the
                    # (unused) extended row; no fix needed here
                    pass
                if c in ("Hy", "Hz"):
                    lo = _f32(r[f"lo_{c}"][:])
                    if not x_periodic:
                        kind = boundaries[0][0]
                        edge = edge_col(fH[c], kind, "lo")
                        lo = jnp.where(i == 0, edge, lo)
                    H_ext[c] = jnp.concatenate([lo, fH[c], hi], axis=0)
                else:
                    H_ext[c] = jnp.concatenate([fH[c], hi], axis=0)

            E_ext = {}
            for c in ("Ey", "Ez"):
                E_ext[c] = jnp.concatenate(
                    [fE[c], _f32(r[f"hi_{c}"][:])], axis=0)

            # inverse-step rows for this block (+1 extended row)
            def iv_rows(name, extended):
                ref = r[name]
                rows = ref[pl.ds(s0, bx)]
                if not extended:
                    return rows
                if x_periodic:
                    hi_row = ref[pl.ds((s0 + bx) % nx, 1)]
                else:
                    hi_row = ref[pl.ds(jnp.minimum(s0 + bx, nx - 1), 1)]
                return jnp.concatenate([rows, hi_row], axis=0)

            inv_e = {0: None, 1: r["inv_e_y"][:], 2: r["inv_e_z"][:]}
            inv_h = {0: None, 1: r["inv_h_y"][:], 2: r["inv_h_z"][:]}

            def bd_yz(f, axis, kind):
                """backward diff along y/z with boundary column handling."""
                prev = pltpu.roll(f, 1, axis)
                if kind == "pec":
                    prev = jnp.where(iotas[axis] == 0, 0.0, prev)
                elif kind == "pmc":
                    first = f[:, :1] if axis == 1 else f[:, :, :1]
                    prev = jnp.where(iotas[axis] == 0, first, prev)
                return f - prev

            def fd_yz(f, axis, kind):
                nxt = pltpu.roll(f, f.shape[axis] - 1, axis)
                if kind == "pec":
                    nxt = jnp.where(iotas[axis] == f.shape[axis] - 1,
                                    0.0, nxt)
                elif kind == "pmc":
                    last = f[:, -1:] if axis == 1 else f[:, :, -1:]
                    nxt = jnp.where(iotas[axis] == f.shape[axis] - 1,
                                    last, nxt)
                return nxt - f

            def coeff(prefix, comp, which, extended):
                cs = static_coeffs[comp][0 if which == "ca" else 1]
                if cs is not None:
                    return cs
                val = _f32(r[f"{which}_{comp}"][:])
                if extended:
                    val = jnp.concatenate(
                        [val, _f32(r[f"{which}_hi_{comp}"][:])], axis=0)
                return val

            # psi handling shared by both families
            def apply_psi(comp, fam, out, d1, d2, cb_sign, extended):
                for (key, fm, c2, axis, side, width, sgn, ext) in psi_meta:
                    if c2 != comp or fm != fam:
                        continue
                    dv = d1 if sgn > 0 else d2
                    n_ax = ny if axis == 1 else nz
                    if axis == 1:
                        dsl = (dv[:, :width] if side == "lo"
                               else dv[:, n_ax - width:])
                    else:
                        dsl = (dv[:, :, :width] if side == "lo"
                               else dv[:, :, n_ax - width:])
                        dsl = jnp.transpose(dsl, (0, 2, 1))
                    b = r[f"b_{fam}{axis}{side}"][:]
                    c_ = r[f"c_{fam}{axis}{side}"][:]
                    if axis == 2:
                        b = jnp.reshape(b, (1, width, 1))
                        c_ = jnp.reshape(c_, (1, width, 1))
                    psi_old = _f32(r[f"psi_{key}"][:])
                    if extended:
                        psi_old = jnp.concatenate(
                            [psi_old, _f32(r[f"psihi_{key}"][:])], axis=0)
                    psi_new = b * psi_old + c_ * dsl
                    store = psi_new[:-1] if extended else psi_new
                    r[f"outpsi_{key}"][:] = store.astype(
                        r[f"outpsi_{key}"].dtype)
                    psi_nat = (psi_new if axis == 1
                               else jnp.transpose(psi_new, (0, 2, 1)))
                    if np.ndim(cb_sign):
                        if axis == 1:
                            cb_sl = (cb_sign[:, :width] if side == "lo"
                                     else cb_sign[:, n_ax - width:])
                        else:
                            cb_sl = (cb_sign[:, :, :width] if side == "lo"
                                     else cb_sign[:, :, n_ax - width:])
                    else:
                        cb_sl = cb_sign
                    contrib = sgn * cb_sl * psi_nat
                    if axis == 1:
                        if side == "lo":
                            out = jnp.concatenate(
                                [out[:, :width] + contrib, out[:, width:]],
                                axis=1)
                        else:
                            out = jnp.concatenate(
                                [out[:, :n_ax - width],
                                 out[:, n_ax - width:] + contrib], axis=1)
                    else:
                        if side == "lo":
                            out = jnp.concatenate(
                                [out[:, :, :width] + contrib,
                                 out[:, :, width:]], axis=2)
                        else:
                            out = jnp.concatenate(
                                [out[:, :, :n_ax - width],
                                 out[:, :, n_ax - width:] + contrib], axis=2)
                return out

            def pole_term(comp, extended):
                acc = None
                for pi, (A, Gc) in enumerate(pole_scalars):
                    qr = _f32(r[f"q{pi}_{comp}_re"][:])
                    qi = _f32(r[f"q{pi}_{comp}_im"][:])
                    if extended:
                        qr = jnp.concatenate(
                            [qr, _f32(r[f"q{pi}hi_{comp}_re"][:])], axis=0)
                        qi = jnp.concatenate(
                            [qi, _f32(r[f"q{pi}hi_{comp}_im"][:])], axis=0)
                    t = Gc.real * qr - Gc.imag * qi
                    acc = t if acc is None else acc + t
                return acc

            def wall_mask(comp, out, extended):
                for ax in mask_axes.get(comp, ()):
                    if ax == 0:
                        iota_xx = lax.broadcasted_iota(
                            jnp.int32, (out.shape[0], 1, 1), 0)
                        out = jnp.where(iota_xx + s0 == 0, 0.0, out)
                    else:
                        out = jnp.where(iotas[ax] == 0, 0.0, out)
                return out

            # ---------------- E half-step ---------------- #
            newE = {}
            # Ex on bx rows (never consumed at the extended row)
            d1 = bd_yz(fH["Hz"], 1, boundaries[1][0]) * inv_e[1]
            d2 = bd_yz(fH["Hy"], 2, boundaries[2][0]) * inv_e[2]
            rhs = d1 - d2
            pt = pole_term("Ex", False)
            if pt is not None:
                rhs = rhs - pt
            out = coeff("E", "Ex", "ca", False) * fE["Ex"] \
                + coeff("E", "Ex", "cb", False) * rhs
            out = apply_psi("Ex", "dual", out, d1, d2,
                            coeff("E", "Ex", "cb", False), False)
            newE["Ex"] = wall_mask("Ex", out, False)

            # Ey on bx+1 rows: d1 = dHx/dz, d2 = dHz/dx
            hx_e = H_ext["Hx"]  # bx+1 rows
            d1 = bd_yz(hx_e, 2, boundaries[2][0]) * inv_e[2]
            hz_e = H_ext["Hz"]  # bx+2 rows
            # pec/pmc x-lo edges are exact already: the lo plane was replaced
            # by the boundary column (zeros / mirror) in the H_ext assembly
            iv = iv_rows("inv_e_x", True).reshape(-1, 1, 1)
            d2 = (hz_e[1:] - hz_e[:-1]) * iv
            rhs = d1 - d2
            pt = pole_term("Ey", True)
            if pt is not None:
                rhs = rhs - pt
            out = coeff("E", "Ey", "ca", True) * E_ext["Ey"] \
                + coeff("E", "Ey", "cb", True) * rhs
            out = apply_psi("Ey", "dual", out, d1, d2,
                            coeff("E", "Ey", "cb", True), True)
            newE["Ey"] = wall_mask("Ey", out, True)

            # Ez on bx+1 rows: d1 = dHy/dx, d2 = dHx/dy
            hy_e = H_ext["Hy"]
            d1 = (hy_e[1:] - hy_e[:-1]) * iv
            d2 = bd_yz(hx_e, 1, boundaries[1][0]) * inv_e[1]
            rhs = d1 - d2
            pt = pole_term("Ez", True)
            if pt is not None:
                rhs = rhs - pt
            out = coeff("E", "Ez", "ca", True) * E_ext["Ez"] \
                + coeff("E", "Ez", "cb", True) * rhs
            out = apply_psi("Ez", "dual", out, d1, d2,
                            coeff("E", "Ez", "cb", True), True)
            newE["Ez"] = wall_mask("Ez", out, True)

            for c in E_COMPS:
                blk_rows = newE[c][:bx] if newE[c].shape[0] > bx else newE[c]
                r[f"out_{c}"][:] = blk_rows.astype(r[f"out_{c}"].dtype)

            # ---------------- H half-step ---------------- #
            ex_b = newE["Ex"]
            ey_b, ey_ext = newE["Ey"][:bx], newE["Ey"]
            ez_b, ez_ext = newE["Ez"][:bx], newE["Ez"]

            def fd_x(f_ext, comp_wrap):
                """forward x diff on block rows from the extended array."""
                ivh = iv_rows("inv_h_x", False).reshape(-1, 1, 1)
                d = (f_ext[1:] - f_ext[:-1]) * ivh
                kind = boundaries[0][1]
                if not x_periodic:
                    iota_xx = lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0)
                    glob = iota_xx + s0
                    if kind == "pec":
                        edge_d = (0.0 - f_ext[:-1]) * ivh
                        d = jnp.where(glob == nx - 1, edge_d, d)
                    else:  # pmc: mirror -> zero derivative
                        d = jnp.where(glob == nx - 1, 0.0, d)
                return d

            newH = {}
            # Hx: d1 = dEz/dy (fwd), d2 = dEy/dz
            d1 = fd_yz(ez_b, 1, boundaries[1][1]) * inv_h[1]
            d2 = fd_yz(ey_b, 2, boundaries[2][1]) * inv_h[2]
            rhs = d1 - d2
            out = coeff("H", "Hx", "ca", False) * fH["Hx"] \
                - coeff("H", "Hx", "cb", False) * rhs
            out = apply_psi("Hx", "primal", out, d1, d2,
                            -coeff("H", "Hx", "cb", False), False)
            newH["Hx"] = out

            # Hy: d1 = dEx/dz, d2 = dEz/dx
            d1 = fd_yz(ex_b, 2, boundaries[2][1]) * inv_h[2]
            d2 = fd_x(ez_ext, "Ez")
            rhs = d1 - d2
            out = coeff("H", "Hy", "ca", False) * fH["Hy"] \
                - coeff("H", "Hy", "cb", False) * rhs
            out = apply_psi("Hy", "primal", out, d1, d2,
                            -coeff("H", "Hy", "cb", False), False)
            newH["Hy"] = out

            # Hz: d1 = dEy/dx, d2 = dEx/dy
            d1 = fd_x(ey_ext, "Ey")
            d2 = fd_yz(ex_b, 1, boundaries[1][1]) * inv_h[1]
            rhs = d1 - d2
            out = coeff("H", "Hz", "ca", False) * fH["Hz"] \
                - coeff("H", "Hz", "cb", False) * rhs
            out = apply_psi("Hz", "primal", out, d1, d2,
                            -coeff("H", "Hz", "cb", False), False)
            newH["Hz"] = out

            for c in H_COMPS:
                r[f"out_{c}"][:] = newH[c].astype(r[f"out_{c}"].dtype)

        out_shapes = [jax.ShapeDtypeStruct((nx, ny, nz), dtype)
                      for _ in range(6)]
        out_specs = [pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in range(6)]
        for (key, fam, comp, axis, side, width, sgn, ext) in psi_meta:
            psi_arr = view["psi"][key]
            out_shapes.append(
                jax.ShapeDtypeStruct(psi_arr.shape, psi_arr.dtype))
            w2 = nz if axis == 1 else ny
            out_specs.append(pl.BlockSpec((bx, width, w2),
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))

        results = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(n_prog,),
            in_specs=specs,
            out_specs=out_specs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=self.interpret,
        )(*arrays)

        newE = {c: results[ci] for ci, c in enumerate(E_COMPS)}
        newH = {c: results[3 + ci] for ci, c in enumerate(H_COMPS)}
        new_psi = {}
        for oi, m in enumerate(psi_meta):
            new_psi[m[0]] = results[6 + oi]
        return newE, newH, new_psi
