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

VMEM_BUDGET_BYTES = 66 * 1024 * 1024
VMEM_LIMIT_BYTES = 120 * 1024 * 1024


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
        # the slab-fixup pallas pass handles x-axis CPML when the packed
        # region exists (8-aligned widths and nx); otherwise the runner
        # falls back to XLA delta corrections
        self.fixup_ok = runner.fixup_meta is not None

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
        for bx in (8, 6, 4, 3, 2):
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

    # ------------------------------------------------------------------ #
    # slab-fixup pass: x-axis CPML in one aliased pallas kernel
    # ------------------------------------------------------------------ #

    def x_fixup(self, newE: dict, newH: dict, psi: dict, view: dict,
                consts: dict):
        """Apply the x-axis CPML corrections in ONE pallas call over the
        packed slab region, updating the kernel outputs in place via
        input/output aliasing (unvisited blocks keep their values).

        Per 8-row block of the region it:
          1. updates psi_E_x (recursion on dx of the old H) and adds the
             resulting delta to newEy/newEz;
          2. propagates that delta linearly through the H half-step (forward
             curl) including the psi_Hx y/z slab recursions it grazes;
          3. updates psi_H_x from the corrected newE and folds it into newH.

        Pad rows carry b = c = 0, so their psi and deltas vanish — every
        program runs identical branch-free math. Replaces ~20 sequential
        XLA slab ops (measured ~3 Gcell*steps/s of bench loss) with one
        multi-stream kernel."""
        runner = self.runner
        fm = runner.fixup_meta
        nb_lo, nb_hi, R = fm["nb_lo"], fm["nb_hi"], fm["R"]
        nx, ny, nz = self.shape
        boundaries = self.plan.boundaries
        FB = 4  # fixup block rows (small: 13+ aliased windows live at once)
        nbl = nb_lo * 8 // FB
        nbh = nb_hi * 8 // FB
        n_prog = nbl + nbh
        nxb = nx // FB
        sb = pl.Buffered(buffer_count=1)  # no prefetch: halves VMEM windows

        def gb(p):
            return jnp.where(p < nbl, p, nxb - nbh + (p - nbl))

        names: List[str] = []
        arrays: List = []
        specs: List = []

        def add(name, arr, spec):
            names.append(name)
            arrays.append(arr)
            specs.append(spec)

        def fld_blk():
            return pl.BlockSpec((FB, ny, nz), lambda p: (gb(p), 0, 0),
                                memory_space=pltpu.VMEM, pipeline_mode=sb)

        # ----- aliased in/out (inputs 0..n_alias-1 <-> outputs, in order) --
        aliased = [("newEy", newE["Ey"], fld_blk()),
                   ("newEz", newE["Ez"], fld_blk()),
                   ("newHx", newH["Hx"], fld_blk()),
                   ("newHy", newH["Hy"], fld_blk()),
                   ("newHz", newH["Hz"], fld_blk())]
        for c in ("Ey", "Ez", "Hy", "Hz"):
            aliased.append((f"psiP_{c}", psi[f"{c}|0|packed"],
                            pl.BlockSpec((FB, ny, nz), lambda p: (p, 0, 0),
                                         memory_space=pltpu.VMEM,
                                         pipeline_mode=sb)))
        # grazed psi_Hx y/z slabs (only Hx has nonzero delta derivatives
        # along y and z: dHx = d(dEz)/dy - d(dEy)/dz)
        graze_meta = []
        for axis in (1, 2):
            w_lo, w_hi = runner.pml_meta[("primal", axis)]
            for side, width in (("lo", w_lo), ("hi", w_hi)):
                key = f"Hx|{axis}|{side}"
                if width == 0 or key not in psi:
                    continue
                w2 = nz if axis == 1 else ny
                aliased.append((f"gz_{key}", psi[key],
                                pl.BlockSpec((FB, width, w2),
                                             lambda p: (gb(p), 0, 0),
                                             memory_space=pltpu.VMEM,
                                             pipeline_mode=sb)))
                graze_meta.append((key, axis, side, width))
        n_alias = len(aliased)
        for name, arr, spec in aliased:
            add(name, arr, spec)

        # ----- read-only inputs ----- #
        H = view["H"]
        lo_pl = pl.BlockSpec((1, ny, nz),
                             lambda p: (jnp.maximum(gb(p) * FB - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=sb)
        hi_pl = pl.BlockSpec((1, ny, nz),
                             lambda p: (jnp.minimum(gb(p) * FB + FB, nx - 1),
                                        0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=sb)
        add("Hy_blk", H["Hy"], fld_blk())
        add("Hy_lo", H["Hy"], lo_pl)
        add("Hy_hi", H["Hy"], hi_pl)
        add("Hz_blk", H["Hz"], fld_blk())
        add("Hz_lo", H["Hz"], lo_pl)
        add("Hz_hi", H["Hz"], hi_pl)
        add("newEy_hi", newE["Ey"], hi_pl)
        add("newEz_hi", newE["Ez"], hi_pl)
        psi_hi = pl.BlockSpec((1, ny, nz),
                              lambda p: (jnp.minimum(p * FB + FB, R - 1),
                                         0, 0),
                              memory_space=pltpu.VMEM, pipeline_mode=sb)
        add("psiP_Ey_hi", psi["Ey|0|packed"], psi_hi)
        add("psiP_Ez_hi", psi["Ez|0|packed"], psi_hi)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        b_e, c_e = consts["pml"]["dual0_packed"]
        b_h, c_h = consts["pml"]["primal0_packed"]
        add("b_e", b_e, full)
        add("c_e", c_e, full)
        add("b_h", b_h, full)
        add("c_h", c_h, full)
        add("inv_e_x", consts["inv_dual"][0], full)
        add("inv_h_x", consts["inv_primal"][0], full)
        add("inv_h_y", consts["inv_primal"][1], full)
        add("inv_h_z", consts["inv_primal"][2], full)
        for key, axis, side, width in graze_meta:
            add(f"ceff_{axis}{side}",
                consts["pml"][f"primal{axis}"][f"c_{side}"], full)
        # spatially varying coefficients
        host_ce = runner.consts["coeffs_E"]
        host_ch = runner.consts["coeffs_H"]
        cb_static = {}
        for c in ("Ey", "Ez"):
            cb_h = host_ce[c][1]
            cb_static[c] = float(cb_h) if np.ndim(cb_h) == 0 else None
            if cb_static[c] is None:
                add(f"cb_{c}", consts["coeffs_E"][c][1], fld_blk())
                add(f"cb_{c}_hi", consts["coeffs_E"][c][1], hi_pl)
        db_static = {}
        for c in H_COMPS:
            db_h = host_ch[c][1]
            db_static[c] = float(db_h) if np.ndim(db_h) == 0 else None
            if db_static[c] is None:
                add(f"db_{c}", consts["coeffs_H"][c][1], fld_blk())

        mask_axes = {}
        for ci, comp in enumerate(E_COMPS):
            if comp in runner.consts["wall_masks"]:
                mask_axes[comp] = [ax for ax in range(3) if ax != ci
                                   and boundaries[ax][0] == "pec"]

        names_out = [a[0] for a in aliased]
        all_names = names + names_out

        def kernel(*refs):
            r = dict(zip(all_names, refs))
            p = pl.program_id(0)
            g0 = gb(p) * FB
            iota8 = lax.broadcasted_iota(jnp.int32, (FB, 1, 1), 0)
            grow = g0 + iota8
            iota_y = lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
            iota_z = lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
            iotas = {1: iota_y, 2: iota_z}

            iv_e = r["inv_e_x"][pl.ds(g0, FB)]
            iv_h = r["inv_h_x"][pl.ds(g0, FB)]
            b_e_r = r["b_e"][pl.ds(p * FB, FB)]
            c_e_r = r["c_e"][pl.ds(p * FB, FB)]
            b_h_r = r["b_h"][pl.ds(p * FB, FB)]
            c_h_r = r["c_h"][pl.ds(p * FB, FB)]
            p_hi = jnp.minimum(p * FB + FB, R - 1)
            b_e_hi = r["b_e"][pl.ds(p_hi, 1)]
            c_e_hi = r["c_e"][pl.ds(p_hi, 1)]

            def cb_of(c, hi=False):
                if cb_static[c] is not None:
                    return cb_static[c]
                return _f32(r[f"cb_{c}_hi"][:] if hi else r[f"cb_{c}"][:])

            def db_of(c):
                if db_static[c] is not None:
                    return db_static[c]
                return _f32(r[f"db_{c}"][:])

            def masked(comp, val, ext=False):
                for ax in mask_axes.get(comp, ()):
                    if ax == 0:
                        cmp_ = (grow if not ext else g0 + FB)
                        val = jnp.where(cmp_ == 0, 0.0, val)
                    else:
                        val = jnp.where(iotas[ax] == 0, 0.0, val)
                return val

            # ---- 1. psi_E_x and the E deltas (block + extended row) ---- #
            deltas = {}
            deltas_ext = {}
            for comp, src, sgn in (("Ey", "Hz", -1.0), ("Ez", "Hy", 1.0)):
                sb = _f32(r[f"{src}_blk"][:])
                s_lo = _f32(r[f"{src}_lo"][:])
                s_hi = _f32(r[f"{src}_hi"][:])
                prev = jnp.concatenate([s_lo, sb[:-1]], axis=0)
                prev = jnp.where(grow == 0, 0.0, prev)  # PML backed by PEC
                d = (sb - prev) * iv_e
                psi_old = _f32(r[f"psiP_{comp}"][:])
                psi_new = b_e_r * psi_old + c_e_r * d
                r[f"out_psiP_{comp}"] = psi_new  # staged; stored below
                delta = masked(comp, sgn * cb_of(comp) * psi_new)
                deltas[comp] = delta
                # extended row g0+8 (recomputed; zero past the domain)
                d_ext = (s_hi - sb[-1:]) \
                    * r["inv_e_x"][pl.ds(jnp.minimum(g0 + FB, nx - 1), 1)]
                psi_ext = b_e_hi * _f32(r[f"psiP_{comp}_hi"][:]) \
                    + c_e_hi * d_ext
                d_ext_val = masked(comp, sgn * cb_of(comp, hi=True) * psi_ext,
                                   ext=True)
                d_ext_val = jnp.where(g0 + FB >= nx, 0.0, d_ext_val)
                deltas_ext[comp] = d_ext_val

            # write corrected newE
            outs = {}
            outs["newEy"] = _f32(r["newEy"][:]) + deltas["Ey"]
            outs["newEz"] = _f32(r["newEz"][:]) + deltas["Ez"]

            # ---- 2. propagate the deltas through the H half-step ---- #
            def fd_yz(v, axis, inv):
                kind = boundaries[axis][1]
                nxt = pltpu.roll(v, v.shape[axis] - 1, axis)
                if kind == "pec":
                    nxt = jnp.where(iotas[axis] == v.shape[axis] - 1,
                                    0.0, nxt)
                elif kind == "pmc":
                    last = v[:, -1:] if axis == 1 else v[:, :, -1:]
                    nxt = jnp.where(iotas[axis] == v.shape[axis] - 1,
                                    last, nxt)
                return (nxt - v) * inv

            dEy9 = jnp.concatenate([deltas["Ey"], deltas_ext["Ey"]], axis=0)
            dEz9 = jnp.concatenate([deltas["Ez"], deltas_ext["Ez"]], axis=0)
            fdx_dEy = (dEy9[1:] - dEy9[:-1]) * iv_h
            fdx_dEz = (dEz9[1:] - dEz9[:-1]) * iv_h
            fdy_dEz = fd_yz(deltas["Ez"], 1, r["inv_h_y"][:])
            fdz_dEy = fd_yz(deltas["Ey"], 2, r["inv_h_z"][:])
            dHx = -db_of("Hx") * (fdy_dEz - fdz_dEy)
            dHy = db_of("Hy") * fdx_dEz
            dHz = -db_of("Hz") * fdx_dEy
            nhx = _f32(r["newHx"][:]) + dHx
            outs["newHy"] = _f32(r["newHy"][:]) + dHy
            outs["newHz"] = _f32(r["newHz"][:]) + dHz

            # grazed psi_Hx slabs (d1 = dEz/dy -> +, d2 = dEy/dz -> -)
            for key, axis, side, width in graze_meta:
                dd = fdy_dEz if axis == 1 else fdz_dEy
                sgn_t = 1.0 if axis == 1 else -1.0
                n_ax = ny if axis == 1 else nz
                if axis == 1:
                    dsl = (dd[:, :width] if side == "lo"
                           else dd[:, n_ax - width:])
                else:
                    dsl = (dd[:, :, :width] if side == "lo"
                           else dd[:, :, n_ax - width:])
                c_eff = r[f"ceff_{axis}{side}"][:]
                if axis == 2:
                    dsl_st = jnp.transpose(dsl, (0, 2, 1))
                    c_eff_st = jnp.reshape(c_eff, (1, width, 1))
                    dpsi_st = c_eff_st * dsl_st
                    r[f"out_gz_{key}"] = _f32(r[f"gz_{key}"][:]) + dpsi_st
                    dpsi = jnp.transpose(dpsi_st, (0, 2, 1))
                else:
                    dpsi = c_eff * dsl
                    r[f"out_gz_{key}"] = _f32(r[f"gz_{key}"][:]) + dpsi
                contrib = -db_of("Hx") * sgn_t * dpsi
                if np.ndim(contrib) and contrib.shape[1:] != dpsi.shape[1:]:
                    pass
                if axis == 1:
                    if side == "lo":
                        nhx = jnp.concatenate(
                            [nhx[:, :width] + contrib, nhx[:, width:]],
                            axis=1)
                    else:
                        nhx = jnp.concatenate(
                            [nhx[:, :n_ax - width],
                             nhx[:, n_ax - width:] + contrib], axis=1)
                else:
                    if side == "lo":
                        nhx = jnp.concatenate(
                            [nhx[:, :, :width] + contrib, nhx[:, :, width:]],
                            axis=2)
                    else:
                        nhx = jnp.concatenate(
                            [nhx[:, :, :n_ax - width],
                             nhx[:, :, n_ax - width:] + contrib], axis=2)
            outs["newHx"] = nhx

            # ---- 3. psi_H_x on the corrected newE ---- #
            ey9 = jnp.concatenate(
                [outs["newEy"],
                 _f32(r["newEy_hi"][:]) + deltas_ext["Ey"]], axis=0)
            ez9 = jnp.concatenate(
                [outs["newEz"],
                 _f32(r["newEz_hi"][:]) + deltas_ext["Ez"]], axis=0)
            for hc, src9, sgn in (("Hz", ey9, 1.0), ("Hy", ez9, -1.0)):
                d = (src9[1:] - src9[:-1]) * iv_h
                # top-row forward diff against the boundary column (PEC
                # behind the PML -> zero column)
                d = jnp.where(grow == nx - 1, (0.0 - src9[:-1]) * iv_h, d)
                psi_new = b_h_r * _f32(r[f"psiP_{hc}"][:]) + c_h_r * d
                r[f"out_psiP_{hc}"] = psi_new
                outs[f"newH{hc[1]}"] = outs[f"newH{hc[1]}"] \
                    - db_of(hc) * sgn * psi_new

            # ---- stores ---- #
            for name in names_out:
                if name.startswith("psiP_"):
                    val = r[f"out_{name}"]
                elif name.startswith("gz_"):
                    val = r[f"out_{name}"]
                else:
                    val = outs[name]
                ref = r[name + "__out"]
                ref[:] = val.astype(ref.dtype)

        # rename output refs to avoid clashing with the aliased input names
        all_names = names + [n + "__out" for n in names_out]

        def kernel_entry(*refs):
            return kernel(*refs)

        out_shapes = []
        out_specs = []
        for name, arr, spec in aliased:
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(spec)

        results = pl.pallas_call(
            kernel_entry,
            out_shape=out_shapes,
            grid=(n_prog,),
            in_specs=specs,
            out_specs=out_specs,
            input_output_aliases={i: i for i in range(n_alias)},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=self.interpret,
        )(*arrays)

        newE = dict(newE)
        newH = dict(newH)
        psi = dict(psi)
        newE["Ey"], newE["Ez"] = results[0], results[1]
        newH["Hx"], newH["Hy"], newH["Hz"] = results[2], results[3], results[4]
        psi["Ey|0|packed"] = results[5]
        psi["Ez|0|packed"] = results[6]
        psi["Hy|0|packed"] = results[7]
        psi["Hz|0|packed"] = results[8]
        for gi, (key, axis, side, width) in enumerate(graze_meta):
            psi[key] = results[9 + gi]
        return newE, newH, psi
