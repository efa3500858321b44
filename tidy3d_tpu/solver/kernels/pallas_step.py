"""Fused Pallas TPU kernels for the FDTD half-step family updates.

Replaces the XLA region-concat assembly of ``FDTDRunner._update_field_family``
with one ``pallas_call`` per family (E or H) per step. Design (see
SURVEY.md §2.3 item 1-2; the reference keeps this engine server-side):

* **Grid over the leading (x) axis** in blocks of ``BX`` planes; y and z stay
  whole inside each block, so their stencil shifts are in-VMEM lane/sublane
  rotates (``pltpu.roll``) with a one-row boundary fix — no HBM re-reads.
  The x-shift needs one halo plane per differencing source component,
  supplied as an extra 1-plane block whose index_map points at the
  neighboring block's edge plane.
* **CPML psi memories for the y/z axes live inside the kernel**: the psi
  slabs are blocked along x exactly like the fields ((BX, w, nz) and
  (BX, ny, w) blocks — the tile-quantum rounding of slab widths to 8
  sublanes / 128 lanes in ``FDTDRunner`` makes these legal Mosaic block
  shapes), updated in place and folded into the output assembly. The x-axis
  psi slabs do NOT decompose along the x grid, so they are applied as a
  small XLA read-modify-write on the kernel output (x-slabs are
  leading-axis contiguous; the slab is ~3-8%% of the domain).
* All compute is f32; field storage may be bf16 (halves HBM traffic).
* Uniform material coefficients are embedded as static scalars (values read
  from the runner's host-side ``consts`` — identical to the traced copies);
  spatially varying coefficients stream as blocked inputs.

Traffic: 6 reads + 3 writes + 2 halo planes per family per step (~74 B/cell
f32, ~37 B/cell bf16) vs the XLA path's measured ~290 B/cell — 2.5-5x faster
on TPU v5e (real-chip measurements in this repo's PROGRESS notes).

Unsupported (runner falls back to the XLA path): complex/Bloch dual-copy
runs and multi-device sharded runs (GSPMD shards the XLA path).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fdtd import _bslice, _take
from ..lowering import E_COMPS, H_COMPS

# v5e VMEM is 128 MB total; the block-size estimate below ignores psi-slab,
# halo, and semaphore buffers, so budget conservatively
VMEM_BUDGET_BYTES = 52 * 1024 * 1024
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


class PallasStepper:
    """Builds and applies the fused family-update kernels for one runner."""

    def __init__(self, runner, interpret: bool = False):
        self.runner = runner
        self.plan = runner.plan
        self.shape = runner.shape
        self.dtype = runner.dtype
        self.interpret = interpret
        self.bx = self._pick_bx()

    # ------------------------------------------------------------------ #
    # support / sizing
    # ------------------------------------------------------------------ #

    @classmethod
    def supported(cls, runner, interpret: bool = False) -> bool:
        plan = runner.plan
        if plan.is_complex:
            return False  # Bloch dual-copy wrap mixing stays on the XLA path
        if runner.sharding is not None:
            return False  # GSPMD domain decomposition uses the XLA path
        nx, ny, nz = runner.shape
        if nx < 1 or ny < 1 or nz < 1:
            return False
        if not interpret:
            # Mosaic block-shape legality for the in-kernel psi slabs:
            # (BX, w, nz) needs w % 8 == 0 or w == ny; (BX, ny, w) needs
            # w % 128 == 0 or w == nz. The tile-quantum rounding guarantees
            # this unless overridden.
            for fam in ("dual", "primal"):
                for axis, quantum, n in ((1, 8, ny), (2, 8, nz)):
                    w_lo, w_hi = runner.pml_meta[(fam, axis)]
                    for w in (w_lo, w_hi):
                        if w and w % quantum and w != n:
                            return False
        return True

    def _pick_bx(self) -> int:
        nx, ny, nz = self.shape
        esize = 4 if self.dtype == jnp.float32 else 2
        plane = ny * nz * esize
        # blocked buffers: 3 src + 3 old + 3 out (+ 6 per pole: qr,qi x3) +
        # per-component coefficient arrays when spatially varying
        n_blocks = 9 + 6 * len(self.runner.pole_scalars)
        for fam_key in ("coeffs_E", "coeffs_H"):
            for _, (a, b) in self.runner.consts[fam_key].items():
                n_blocks += int(np.ndim(a) > 0) + int(np.ndim(b) > 0)
        for bx in (8, 4, 2, 1):
            if nx % bx:
                continue
            # double-buffered pipeline: x2
            if 2 * n_blocks * bx * plane <= VMEM_BUDGET_BYTES:
                return bx
        return 1

    # ------------------------------------------------------------------ #
    # the family update
    # ------------------------------------------------------------------ #

    def family_update(self, family: str, view: dict, consts: dict,
                      src_fields: dict):
        """Pallas-kernel equivalent of ``FDTDRunner._update_field_family``.

        Returns ``(new_fields, new_psi)`` with identical semantics: psi dict
        contains the updated slab memories for every axis (x handled by an
        XLA correction pass on the kernel output).
        """
        runner = self.runner
        plan = self.plan
        is_e = family == "E"
        out_comps = E_COMPS if is_e else H_COMPS
        src_comps = H_COMPS if is_e else E_COMPS
        fam = "dual" if is_e else "primal"
        coeffs = consts["coeffs_E"] if is_e else consts["coeffs_H"]
        host_coeffs = (runner.consts["coeffs_E"] if is_e
                       else runner.consts["coeffs_H"])
        inv = consts["inv_dual"] if is_e else consts["inv_primal"]
        nx, ny, nz = self.shape
        bx = self.bx
        dtype = self.dtype

        # -------------- assemble kernel inputs (order = names) ----------- #
        names: List[str] = []
        arrays: List = []
        specs: List = []

        def blk_spec():
            return pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def add(name, arr, spec):
            names.append(name)
            arrays.append(arr)
            specs.append(spec)

        for c in src_comps:
            add(f"src_{c}", src_fields[c], blk_spec())
        for c in out_comps:
            add(f"old_{c}", view[family][c], blk_spec())

        # x halo planes: E uses backward diffs (needs plane i*bx-1 of the two
        # source comps differenced along x); H uses forward diffs (plane
        # (i+1)*bx). comp->src mapping: E: Ey<-Hz, Ez<-Hy; H: Hy<-Ez, Hz<-Ey.
        halo_src = (("Hz", "Hy") if is_e else ("Ez", "Ey"))
        for c in halo_src:
            if is_e:
                spec = pl.BlockSpec(
                    (1, ny, nz),
                    lambda i: (jnp.maximum(i * bx - 1, 0), 0, 0),
                    memory_space=pltpu.VMEM)
            else:
                spec = pl.BlockSpec(
                    (1, ny, nz),
                    lambda i: (jnp.minimum(i * bx + bx, nx - 1), 0, 0),
                    memory_space=pltpu.VMEM)
            add(f"halo_{c}", src_fields[c], spec)
        # periodic wrap along x additionally needs the far edge plane
        x_lo_kind, x_hi_kind = plan.boundaries[0]
        wrap_kind = x_lo_kind if is_e else x_hi_kind
        if wrap_kind not in ("pec", "pmc"):
            wrap_plane = nx - 1 if is_e else 0
            for c in halo_src:
                add(f"wrap_{c}", src_fields[c],
                    pl.BlockSpec((1, ny, nz),
                                 lambda i, p=wrap_plane: (p, 0, 0),
                                 memory_space=pltpu.VMEM))

        # inverse-step vectors (kappa folded) per axis
        add("inv_x", inv[0], pl.BlockSpec((bx, 1, 1), lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
        add("inv_y", inv[1], pl.BlockSpec(memory_space=pltpu.VMEM))
        add("inv_z", inv[2], pl.BlockSpec(memory_space=pltpu.VMEM))

        # spatially-varying material coefficients (static scalars otherwise)
        static_coeffs: Dict[str, Tuple] = {}
        for c in out_comps:
            ca_h, cb_h = host_coeffs[c]
            ca_s = float(ca_h) if np.ndim(ca_h) == 0 else None
            cb_s = float(cb_h) if np.ndim(cb_h) == 0 else None
            static_coeffs[c] = (ca_s, cb_s)
            if ca_s is None:
                add(f"ca_{c}", coeffs[c][0], blk_spec())
            if cb_s is None:
                add(f"cb_{c}", coeffs[c][1], blk_spec())

        # dispersive pole currents (E family only)
        if is_e:
            for pi, Qp in enumerate(view["Q"]):
                for c in E_COMPS:
                    qr, qi = Qp[c]
                    add(f"q{pi}_{c}_re", qr, blk_spec())
                    add(f"q{pi}_{c}_im", qi, blk_spec())

        # psi slabs for y/z axes (+ b/c vectors); x-axis psi handled in XLA
        psi_meta = []  # (key, comp, axis, side, width, sgn) — sgn: +d1 / -d2
        out_psi_names = []
        for ci, comp in enumerate(out_comps):
            i_ax = ci
            j, k = (i_ax + 1) % 3, (i_ax + 2) % 3
            for axis, sgn in ((j, +1), (k, -1)):
                if axis == 0:
                    continue
                w_lo, w_hi = runner.pml_meta[(fam, axis)]
                for side, width in (("lo", w_lo), ("hi", w_hi)):
                    key = f"{comp}|{axis}|{side}"
                    if width == 0 or key not in view["psi"]:
                        continue
                    # z-psi is stored transposed as (x, z-slab, y); both
                    # layouts give a (bx, width, *) block over the x grid
                    w2 = nz if axis == 1 else ny
                    spec = pl.BlockSpec((bx, width, w2), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
                    add(f"psi_{key}", view["psi"][key], spec)
                    psi_meta.append((key, comp, axis, side, width, sgn))
                    out_psi_names.append(key)
        for axis in (1, 2):
            pml_c = consts["pml"].get(f"{fam}{axis}")
            if pml_c is None:
                continue
            w_lo, w_hi = runner.pml_meta[(fam, axis)]
            for side, width in (("lo", w_lo), ("hi", w_hi)):
                if width == 0:
                    continue
                add(f"b_{axis}{side}", pml_c[f"b_{side}"],
                    pl.BlockSpec(memory_space=pltpu.VMEM))
                add(f"c_{axis}{side}", pml_c[f"c_{side}"],
                    pl.BlockSpec(memory_space=pltpu.VMEM))

        # static metadata
        boundaries = plan.boundaries
        pole_scalars = runner.pole_scalars
        # wall-mask axes per comp (pec lo-side tangential zeroing)
        mask_axes: Dict[str, List[int]] = {}
        if is_e:
            for ci, comp in enumerate(out_comps):
                axes = [ax for ax in range(3)
                        if ax != ci and boundaries[ax][0] == "pec"]
                if comp in runner.consts["wall_masks"]:
                    mask_axes[comp] = axes
        n_prog = nx // bx
        pml_meta = runner.pml_meta

        # ---------------------------- kernel ----------------------------- #
        names_out = [f"out_{c}" for c in out_comps] \
            + [f"outpsi_{key}" for key in out_psi_names]
        all_names = names + names_out

        def kernel(*refs):
            r = dict(zip(all_names, refs))
            out_f = {c: r[f"out_{c}"] for c in out_comps}
            out_p = {key: r[f"outpsi_{key}"] for key in out_psi_names}
            i = pl.program_id(0)
            fld = {c: _f32(r[f"src_{c}"][:]) for c in src_comps}
            inv_b = {0: r["inv_x"][:], 1: r["inv_y"][:], 2: r["inv_z"][:]}

            iota_x = jax.lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0)
            iota_y = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
            iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
            iotas = {0: iota_x, 1: iota_y, 2: iota_z}

            def diff(comp_src, axis):
                """sign*(F - F_shift)*inv along axis (E: backward, H: fwd)."""
                f = fld[comp_src]
                if is_e:
                    prev = pltpu.roll(f, 1, axis)
                    kind = boundaries[axis][0]
                    if axis == 0:
                        hm1 = _f32(r[f"halo_{comp_src}"][:])
                        if kind == "pec":
                            edge = jnp.zeros_like(hm1)
                        elif kind == "pmc":
                            edge = f[:1]
                        else:
                            edge = _f32(r[f"wrap_{comp_src}"][:])
                        col = jnp.where(i == 0, edge, hm1)
                        prev = jnp.where(iota_x == 0, col, prev)
                    else:
                        if kind == "pec":
                            prev = jnp.where(iotas[axis] == 0, 0.0, prev)
                        elif kind == "pmc":
                            first = (f[:, :1] if axis == 1 else f[:, :, :1])
                            prev = jnp.where(iotas[axis] == 0, first, prev)
                        # periodic: roll wrap is already correct
                    return (f - prev) * inv_b[axis]
                nxt = pltpu.roll(f, f.shape[axis] - 1, axis)  # == shift -1
                kind = boundaries[axis][1]
                if axis == 0:
                    hp1 = _f32(r[f"halo_{comp_src}"][:])
                    if kind == "pec":
                        edge = jnp.zeros_like(hp1)
                    elif kind == "pmc":
                        edge = f[-1:]
                    else:
                        edge = _f32(r[f"wrap_{comp_src}"][:])
                    col = jnp.where(i == n_prog - 1, edge, hp1)
                    nxt = jnp.where(iota_x == bx - 1, col, nxt)
                else:
                    if kind == "pec":
                        nxt = jnp.where(iotas[axis] == nxt.shape[axis] - 1,
                                        0.0, nxt)
                    elif kind == "pmc":
                        last = (f[:, -1:] if axis == 1 else f[:, :, -1:])
                        nxt = jnp.where(iotas[axis] == nxt.shape[axis] - 1,
                                        last, nxt)
                return (nxt - f) * inv_b[axis]

            for ci, comp in enumerate(out_comps):
                j, k = (ci + 1) % 3, (ci + 2) % 3
                d1 = diff(src_comps[k], j)
                d2 = diff(src_comps[j], k)
                rhs = d1 - d2
                if is_e:
                    for pi, (A, Gc) in enumerate(pole_scalars):
                        qr = _f32(r[f"q{pi}_{comp}_re"][:])
                        qi = _f32(r[f"q{pi}_{comp}_im"][:])
                        rhs = rhs - (Gc.real * qr - Gc.imag * qi)
                ca_s, cb_s = static_coeffs[comp]
                ca = ca_s if ca_s is not None else _f32(r[f"ca_{comp}"][:])
                cb = cb_s if cb_s is not None else _f32(r[f"cb_{comp}"][:])
                old = _f32(r[f"old_{comp}"][:])
                out = ca * old + (cb * rhs if is_e else -(cb * rhs))
                cb_sign = cb if is_e else -cb

                # fold in the y/z psi slabs (slab pieces re-assembled by
                # concat — psi slabs span corners, like the XLA path)
                for key, c2, axis, side, width, sgn in psi_meta:
                    if c2 != comp:
                        continue
                    dvals = d1 if sgn > 0 else d2
                    n_ax = ny if axis == 1 else nz
                    if axis == 1:
                        dslab = (dvals[:, :width] if side == "lo"
                                 else dvals[:, n_ax - width:])
                    else:
                        dslab = (dvals[:, :, :width] if side == "lo"
                                 else dvals[:, :, n_ax - width:])
                        # transposed (x, z-slab, y) psi layout
                        dslab = jnp.transpose(dslab, (0, 2, 1))
                    b = r[f"b_{axis}{side}"][:]
                    c_ = r[f"c_{axis}{side}"][:]
                    if axis == 2:  # (1, 1, w) coefficient vectors -> (1, w, 1)
                        b = jnp.reshape(b, (1, width, 1))
                        c_ = jnp.reshape(c_, (1, width, 1))
                    psi_new = b * _f32(r[f"psi_{key}"][:]) + c_ * dslab
                    out_p[key][:] = psi_new.astype(out_p[key].dtype)
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
                                [out[:, :width] + contrib,
                                 out[:, width:]], axis=1)
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

                for ax in mask_axes.get(comp, ()):
                    if ax == 0:
                        out = jnp.where(iota_x + i * bx == 0, 0.0, out)
                    else:
                        out = jnp.where(iotas[ax] == 0, 0.0, out)
                out_f[comp][:] = out.astype(out_f[comp].dtype)

        # ------------------------- outputs ------------------------------- #
        out_shapes = [jax.ShapeDtypeStruct((nx, ny, nz), dtype)
                      for _ in out_comps]
        out_specs = [pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in out_comps]
        for key, comp, axis, side, width, sgn in psi_meta:
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

        new_fields = {c: results[ci] for ci, c in enumerate(out_comps)}
        new_psi = {}
        for oi, (key, *_rest) in enumerate(psi_meta):
            new_psi[key] = results[len(out_comps) + oi]

        # ------------- x-axis psi: XLA correction on the output ---------- #
        w_lo_x, w_hi_x = pml_meta[(fam, 0)]
        pml_x = consts["pml"].get(f"{fam}0")
        if pml_x is not None and (w_lo_x or w_hi_x):
            for ci, comp in enumerate(out_comps):
                j, k = (ci + 1) % 3, (ci + 2) % 3
                for axis, sgn in ((j, +1), (k, -1)):
                    if axis != 0:
                        continue
                    src_c = src_comps[k] if sgn > 0 else src_comps[j]
                    for side, width in (("lo", w_lo_x), ("hi", w_hi_x)):
                        key = f"{comp}|0|{side}"
                        if width == 0 or key not in view["psi"]:
                            continue
                        sl = runner._slab_slices(0, side, width)
                        F = src_fields[src_c]
                        shifted = runner._shift_take(F, None, sl, 0, is_e, 0)
                        sign_shift = 1.0 if is_e else -1.0
                        d = sign_shift * (_take(F, sl) - shifted) \
                            * _bslice(inv[0], sl)
                        psi_new = pml_x[f"b_{side}"] * view["psi"][key] \
                            + pml_x[f"c_{side}"] * d
                        new_psi[key] = psi_new
                        cb = coeffs[comp][1]
                        cb_sl = _take(cb, sl) if jnp.ndim(cb) else cb
                        contrib = sgn * cb_sl * psi_new
                        if not is_e:
                            contrib = -contrib
                        contrib = self._apply_masks(comp, contrib, sl, consts)
                        new_fields[comp] = new_fields[comp].at[sl].add(
                            contrib.astype(new_fields[comp].dtype))
        return new_fields, new_psi

    def _apply_masks(self, comp, contrib, sl, consts):
        masks = consts["wall_masks"].get(comp)
        if not masks:
            return contrib
        for m in masks:
            contrib = contrib * _bslice(m, sl)
        return contrib
