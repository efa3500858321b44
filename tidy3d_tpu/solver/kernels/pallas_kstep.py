"""Temporal-blocked Pallas TPU kernel: k leapfrog steps per HBM round trip.

The FDTD update is bandwidth-bound at one step per round trip (the 1-step
fused kernel runs at 86% of a pure field copy). This kernel holds a
(bx+2hwx, by+2hwy, nz) working set in VMEM and advances it k full
leapfrog steps before writing the (bx, by, nz) core back — temporal
wavefront blocking mapped to the TPU memory hierarchy. Halo widths cover
the leapfrog dependency cone (hwx >= k; hwy is rounded up to 8 for
Mosaic's sublane tiling); halo cells recompute their intermediate values
redundantly and are discarded. Fields are fed through 9 modular BlockSpec
pieces (l/m/h per blocked axis) whose index maps give periodic wrap for
free; outputs are core blocks. Measured on v5e at 384^3 + CPML:
5.05 (1-step fused) -> 12.9-13.9 Gcell*steps/s (k=2, f32).

Design notes (each item measured on hardware, see commit history):

* **Ping-pong buffer aliasing.** Every output (fields, psi) is aliased
  onto a stale second buffer set via input_output_aliases, and the time
  loop advances two groups per lax.fori_loop iteration so buffers return
  to their carry slots — without this XLA inserts a full copy of every
  field array per group to thread the while-loop carry (~40% of
  runtime).
* **VMEM-pressure-aware blocking.** Smaller windows (16, 64) beat
  larger ones: Mosaic's pipelining degrades as the in/out/scratch
  buffers approach the VMEM limit.
* **CPML psi state, 4D-packed.** One state array per direction family
  packs all component slabs: x -> (rows, 4, ny+2hwy, nz) with a unified
  lo|hi row space (a program participates in at most one side, enforced
  at config time); y -> (nx+2hwx, 4, w, nz) per side; z -> a lane-packed
  (nx, ny, L) array per E/H family fed through the same BlockSpec pieces
  as the fields (Mosaic cannot DMA-slice a lane dim at unaligned
  offsets). Packing cuts the guarded psi DMAs per program from 16 to
  2-3; the b/c profile vectors live in the same packed row space with
  zeros on pad/off-slab rows so the recursion is self-neutralizing
  there. The z recursion for a whole family is two fused VPU ops.
* **Core-only psi writes.** Block cores tile the domain, so writing
  only core rows makes every real psi cell single-writer with
  full-cone values (full-window writes raced on halo rows whose values
  are wrong after k substeps — a 1e-5-level error). Never-written pad
  regions are neutralized at read time by SELECTS against participation
  and the b != 0 row mask (never multiplies — 0*NaN is NaN); wrap pads
  on periodic axes are refreshed by edge programs.
* **Guarded DMAs beat branch-free.** Redirecting non-participant DMAs
  into dump rows (branch-free) costs more in wasted traffic than the
  scf.if guards cost in scheduling (measured 7.4 vs 12.9).
* **Hoisted source injection.** Profile reads, masks and the b
  coefficient are time-independent: precomputed once per program, one
  fused mul-sub per (component, waveform) per substep. Thin-z profiles
  are pre-tiled host-side into per-program (Wx, ze, Wy) windows
  (dynamic lane windows are not loadable).
* **Boundary fixes as mask-vector multiplies** precomputed per program
  instead of per-call iota compare + select.

Monitors accumulate OUTSIDE the kernel at group boundaries; the runner
builds Nyquist-strided DFT tables whose sampled steps land on group ends
(reference behavior: tidy3d samples its running DFT at the Nyquist
stride, tidy3d/components/simulation.py:4414).

* **Dispersive ADE poles in-kernel.** Pole-residue auxiliary currents
  Q ride the same l/m/h piece machinery as the fields (one packed
  (nx, 6P, ny, zq) state array, channels [qr_x..z, qi_x..z] per pole)
  and advance every substep inside the kernel — the semi-implicit
  recursion is local, so halo Q cells recompute redundantly under the
  exact E dependency cone and only cores write back. Residue maps ship
  as packed channels: 3 mask channels per pole (f32 0/1 indicator +
  static complex B0 per comp) when the lowered map is two-valued (any
  non-Custom medium), 6 full re/im channels otherwise. The whole pole
  machinery is restricted to the z-support of the union of residue
  maps (a half-domain dispersive slab pays only its own HBM traffic);
  the E-coupling splices in via one z-segment concat per component.

Unsupported (the runner falls back to the 1-step kernels / XLA path):
more than 8 dispersive pole slots, nonlinear media, time modulation,
Bloch (complex) boundaries, volume sources thick in both x and y,
grids not 8-aligned in z, > 64 packed z-psi lanes per family, and
time-monitors whose sampling steps cannot align to group ends.

Reference parity: SURVEY.md §2.3 items 1-2, 5-6 (the engine the
reference keeps server-side behind web.run, web/api/webapi.py:49).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lowering import E_COMPS, H_COMPS

VMEM_LIMIT_BYTES = 126 * 1024 * 1024
PROFILE_BYTES_CAP = 8 * 1024 * 1024
WAVEFORM_BYTES_CAP = 8 * 1024 * 1024
VMEM_BUDGET = 108 * 1024 * 1024


def _f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


class PallasKStepper:
    """One pallas_call advancing the full state by k leapfrog steps.

    With ``shard`` set (a dict with keys ``ndev``/``nx_loc``), the stepper
    compiles the SPMD-uniform per-shard program for an x-axis domain
    decomposition under ``shard_map``: each shard holds a padded local
    row space [bx halo | nx_loc core | bx halo]; k-wide field/psi halos
    are ring-exchanged (lax.ppermute) once per group; CPML x-strips run
    on every shard with per-shard b/c tables (zeroed off the global
    edges) so the program is identical across shards. This is the
    reference's server-side spatial decomposition (SURVEY §2.2 P1) on
    the fast kernel path instead of the XLA/GSPMD fallback.
    """

    def __init__(self, runner, k: int, interpret: bool = False,
                 shard: Optional[dict] = None):
        self.runner = runner
        self.plan = runner.plan
        self.shard = shard
        if shard is not None:
            self.gshape = runner.shape
            nx_loc = shard["nx_loc"]
            self.shape = (nx_loc, runner.shape[1], runner.shape[2])
        else:
            self.gshape = runner.shape
            self.shape = runner.shape
        self.dtype = runner.dtype
        self.interpret = interpret
        self.k = k
        # Bloch (complex) runs step TWO real copies packed on the channel
        # dim; they couple ONLY through phase rotation of wrapped halo
        # data (applied once at window assembly for x/y, per-roll for z)
        # and through source injection — away from the wrap the updates
        # are copy-independent, so the whole piece machinery just runs
        # with doubled channel counts. Copy-1 components are named with
        # a '#' suffix (e.g. "Ex#").
        self.n_copies = 2 if self.plan.is_complex else 1
        self.e_comps = E_COMPS if self.n_copies == 1 else \
            E_COMPS + tuple(c + "#" for c in E_COMPS)
        self.h_comps = H_COMPS if self.n_copies == 1 else \
            H_COMPS + tuple(c + "#" for c in H_COMPS)
        self.bloch_cs = [None, None, None]
        for ax, ph in enumerate(self.plan.bloch_phases):
            if abs(ph - 1.0) > 1e-12:
                self.bloch_cs[ax] = (float(np.real(ph)),
                                     float(np.imag(ph)))
        cfg = self._pick_config_static(runner, k, shard=shard)
        if cfg is None:
            raise ValueError("no feasible (bx, by) for this grid")
        self.bx, self.by, self.hwx, self.hwy = cfg
        self.Wx = self.bx + 2 * self.hwx
        self.Wy = self.by + 2 * self.hwy
        import os as _os
        _psi_env = _os.environ.get("TIDY3D_TPU_PSI_DTYPE", "")
        # reduced-precision psi STORAGE (compute stays f32): bf16 halves
        # the psi DMA traffic (+2.4 Gcell*steps/s on v5e) but floors the
        # CPML at ~-40 dB vs f32's -73 dB — opt-in for speed-over-accuracy
        # runs. (float16 storage crashes Mosaic on v5e; not offered.)
        self.psi_dtype = jnp.bfloat16 if _psi_env == "bfloat16" \
            else self.dtype
        # reduced-precision ADE pole-state STORAGE (compute stays f32):
        # halves the Q piece VMEM windows AND HBM traffic — the VMEM
        # relief lets the config search keep large by blocks on multi-
        # pole metals (7-pole Au at 257^3 otherwise drops to by<=32,
        # tripling the halo-recompute overhead). Group-boundary rounding
        # at bf16 (~4e-3 relative) feeds back through a contracting
        # recursion; measured end-to-end monitor error ~1e-3 — opt-in
        # for speed-over-accuracy runs via TIDY3D_TPU_Q_DTYPE=bfloat16.
        _q_env = _os.environ.get("TIDY3D_TPU_Q_DTYPE", "")
        self.q_dtype = jnp.bfloat16 if _q_env == "bfloat16" else self.dtype
        self.pole_metas, (self.q_z0, self.q_zn) = self._pole_layout(runner)
        self._build_kconsts()

    # ------------------------------------------------------------------ #
    # feasibility / configuration
    # ------------------------------------------------------------------ #

    @classmethod
    def _pole_layout(cls, runner):
        """Static packing info for the in-kernel ADE pole machinery.

        Consumes the runner's compressed pole coupling (pole_B_meta +
        plan.pole_masks). Returns ``(metas, (z0, zn))``: one meta per pole
        slot with the semi-implicit scalars (A, Gc), per-comp static
        complex B0 ('mask' kind: residue = B0 * shared indicator), and
        per-comp channel KEYS into the B-channel table — multiple poles
        of one structure reference the SAME mask channel, so a 7-pole
        metal ships 3 indicator channels total instead of 21 (or 42
        dense). 'dense' comps reference re/im channel pairs. (z0, zn) is
        the z-support of the union of all residues: all Q state, B
        channels, and the E-coupling are restricted to this slab
        (semantics spec: fdtd._update_poles).

        su-FORM: the in-kernel state is NOT the raw pole current Q but
        its pre-scaled coupling image (s, u) = (Re(Gc Q), Im(Gc Q)) —
        mathematically exact (multiply the linear recursion by the
        constant Gc: B0 here is the TRANSFORMED Gc*B0). The E-coupling
        then needs only channel SUMS (no Gc multiplies): ~30 fewer
        window multiplies per substep on a 7-pole metal whose pole math
        is VPU-arithmetic-bound (pole_lab: the mix runs at ~1.3 Tflop/s
        against a ~1.6 Tflop/s curl-mix ceiling, so op-count IS time).
        The XLA path keeps the raw-Q form; the two never exchange
        state."""
        if not runner.pole_scalars:
            return [], (0, 0)
        plan = runner.plan
        nz = runner.shape[2]
        z_lo, z_hi = nz, 0
        mask_zspan: dict = {}

        def zspan_of(sup):
            zs = np.nonzero(sup.any(axis=(0, 1)))[0]
            return (int(zs[0]), int(zs[-1]) + 1) if len(zs) else None

        metas = []
        for pi, ((A, Gc), comp_metas) in enumerate(
                zip(runner.pole_scalars, runner.pole_B_meta)):
            mode = "mask"
            B0 = []
            chans = []
            for ci, m in enumerate(comp_metas):
                if m["kind"] == "dense":
                    mode = "full"
                    br, bi = runner.consts["pole_B_dense"][f"{pi}_{ci}"]
                    sp = zspan_of(np.logical_or(br != 0, bi != 0))
                    if sp:
                        z_lo, z_hi = min(z_lo, sp[0]), max(z_hi, sp[1])
                    B0.append((0.0, 0.0))
                    chans.append(("d", pi, ci))
                elif m["kind"] == "mask":
                    mid = m["mask_id"]
                    if mid not in mask_zspan:
                        mask_zspan[mid] = zspan_of(
                            np.asarray(plan.pole_masks[mid], bool))
                    sp = mask_zspan[mid]
                    if sp:
                        z_lo, z_hi = min(z_lo, sp[0]), max(z_hi, sp[1])
                    # su-form: ship the TRANSFORMED Gc*B0 (state = Gc Q)
                    Bp = complex(Gc) * complex(m["B0"][0], m["B0"][1])
                    B0.append((Bp.real, Bp.imag))
                    chans.append(("m", mid) if sp else None)
                else:
                    B0.append((0.0, 0.0))
                    chans.append(None)
            # purely-real poles (Drude / relaxation terms — e.g. 4 of the
            # 7 poles of the library's Au Rakic/Brendel-Bormann fit) keep
            # the state real forever: u' = A.re*u + Im(Gc B0)*E with
            # A.im = Im(Gc B0) = 0 and u(0) = 0. They occupy 3 packed
            # channels instead of 6, cutting Q VMEM windows and HBM
            # traffic by the same ratio.
            is_real = (A.imag == 0.0) and all(abs(b[1]) < 1e-300
                                              for b in B0)
            if is_real:
                for ci, m in enumerate(comp_metas):
                    if m["kind"] == "dense":
                        br, bi = runner.consts["pole_B_dense"][f"{pi}_{ci}"]
                        if np.any(complex(Gc).real * bi
                                  + complex(Gc).imag * br):
                            is_real = False
                            break
            metas.append(dict(A=complex(A), Gc=complex(Gc), mode=mode,
                              B0=B0, chans=chans, real=is_real))
        if z_hi <= z_lo:
            return [], (0, 0)  # all maps zero: poles are inert
        # lane-tile-align the support slab START (and keep the exact end):
        # a misaligned z0 makes every per-substep esum slice and coupling
        # splice a lane-relayout op on the full window. Widening down to
        # the 128 boundary costs only extra zero-B rows whose state stays
        # identically zero (self-neutralizing), and the op tile count
        # ceil((z0 % 128 + zn)/128) never grows by the alignment.
        z_lo_a = (z_lo // 128) * 128
        if -(-(z_hi - z_lo_a) // 128) <= -(-(z_hi - z_lo) // 128):
            z_lo = z_lo_a
        ch0 = 0
        for m in metas:
            m["ch0"] = ch0
            ch0 += 3 if m["real"] else 6
        return metas, (z_lo, z_hi - z_lo)

    @classmethod
    def supported(cls, runner, k: int) -> bool:
        plan = runner.plan
        if runner.sharding is not None:
            return False
        if plan.is_complex and runner.pole_scalars:
            # Bloch dual-copy + dispersive poles: not yet on this kernel
            return False
        if plan.nonlinear is not None or plan.modulation:
            return False
        if len(runner.pole_scalars) > 8:
            # 8 pole slots = 48 Q channels; beyond that no (bx, by) fits
            # VMEM. Within the cap feasibility is decided by the config
            # search below (returns None when the Q windows don't fit).
            return False
        nx, ny, nz = runner.shape
        if nz % 8:
            return False
        prof_bytes = 0
        for sp in plan.sources:
            xs, ys, zs = sp.slices
            xe = (xs.stop if xs.stop is not None else nx) - (xs.start or 0)
            ye = (ys.stop if ys.stop is not None else ny) - (ys.start or 0)
            ze = (zs.stop if zs.stop is not None else nz) - (zs.start or 0)
            if xe > 8 and ye > 8 and ze > 8:
                return False
            if xe <= 8:
                prof_bytes += xe * (ny + 2 * k) * nz * 4
            elif ye <= 8:
                prof_bytes += (nx + 2 * k) * ye * nz * 4
            else:
                prof_bytes += (nx + 2 * k) * ze * (ny + 2 * k) * 4
        if prof_bytes > PROFILE_BYTES_CAP:
            return False
        wf = np.asarray(plan.waveforms)
        if wf.nbytes > WAVEFORM_BYTES_CAP or np.iscomplexobj(wf):
            return False
        if len(cls._coeff_layout(runner)[0]) > 12:
            return False
        # packed z-psi lanes per family must fit one vreg row
        ncop_g = 2 if plan.is_complex else 1
        for fam in ("dual", "primal"):
            w_lo, w_hi = runner.pml_meta[(fam, 2)]
            if 2 * (w_lo + w_hi) * ncop_g > 128:
                return False
        return cls._pick_config_static(runner, k) is not None

    @classmethod
    def supported_sharded(cls, runner, k: int, ndev: int) -> bool:
        """Gate for the shard_map x-decomposed kernel path."""
        plan = runner.plan
        if plan.is_complex or plan.nonlinear is not None or plan.modulation:
            return False
        if len(runner.pole_scalars) > 8:
            # 8 pole slots = 48 Q channels; beyond that no (bx, by) fits
            # VMEM. Within the cap feasibility is decided by the config
            # search below (returns None when the Q windows don't fit).
            return False
        nx, ny, nz = runner.shape
        if nz % 8 or nx % ndev:
            return False
        nx_loc = nx // ndev
        shard = dict(ndev=ndev, nx_loc=nx_loc)
        cfg = cls._pick_config_static(runner, k, shard=shard)
        if cfg is None:
            return False
        bx, by, hwx, hwy = cfg
        if nx_loc % bx:
            return False
        # the split-region program must be clean on the local grid:
        # strips + interior must fit (uniform across shards), and the
        # whole PML cone must live inside the edge shard
        w_lo_x = max(runner.pml_meta[("dual", 0)][0],
                     runner.pml_meta[("primal", 0)][0])
        w_hi_x = max(runner.pml_meta[("dual", 0)][1],
                     runner.pml_meta[("primal", 0)][1])
        kx_lo = ((w_lo_x + hwx - 1) // bx) + 1 if w_lo_x else 0
        kx_hi = (nx_loc // bx) - (max(
            (((nx_loc - w_hi_x - hwx - bx) // bx) + 1), 0)) if w_hi_x else 0
        ni_loc = nx_loc // bx
        if ni_loc - kx_lo - kx_hi <= 0:
            return False
        psiy_geom = cls._psiy_geometry(runner)
        if psiy_geom and ny // by - len(psiy_geom) < 1:
            return False
        # source/profile/waveform caps as in supported()
        prof_bytes = 0
        for sp in plan.sources:
            xs, ys, zs = sp.slices
            xe = (xs.stop if xs.stop is not None else nx) - (xs.start or 0)
            ye = (ys.stop if ys.stop is not None else ny) - (ys.start or 0)
            ze = (zs.stop if zs.stop is not None else nz) - (zs.start or 0)
            if xe > 8 and ye > 8 and ze > 8:
                return False
            prof_bytes += nx * max(ye, ze, 8) * nz * 4
        if prof_bytes > PROFILE_BYTES_CAP:
            return False
        wf = np.asarray(plan.waveforms)
        if wf.nbytes > WAVEFORM_BYTES_CAP or np.iscomplexobj(wf):
            return False
        if len(cls._coeff_layout(runner)[0]) > 12:
            return False
        for fam in ("dual", "primal"):
            w_lo, w_hi = runner.pml_meta[(fam, 2)]
            if 2 * (w_lo + w_hi) > 128:
                return False
        return True

    @staticmethod
    def _classify_profile(arr, boundaries):
        """Factor a 3D array into broadcast structure if possible.

        Returns one of
        * ``("const", v0)``
        * ``("vec", axis, vec1d, gates)`` — ``arr == broadcast(vec) *
          box`` where ``box`` is 1 on ``[0, n_t)`` and 0 on trailing rows
          of each gate axis: ``gates = ((axis_j, n_t_j), ...)``. Plain
          single-axis variation has ``gates == ()``. Trailing-zero boxes
          arise from the frozen alignment padding (pad_plan_for_kernels)
          — without this factoring a padded layered medium degrades to
          full-grid piece streams. Gate axes must be hi-clamped (PEC/PMC):
          on a wrap axis the halo beyond the array is REAL low-row data
          and a trailing-zero gate would corrupt it.
        * ``("full",)``
        """
        v0 = arr.flat[0]
        if np.all(arr == v0):
            return ("const", float(v0))
        shape = arr.shape
        # trailing all-zero widths per axis (only meaningful on clamped)
        n_t = []
        for ax in range(3):
            if boundaries[ax][1] in ("pec", "pmc"):
                other = tuple(j for j in range(3) if j != ax)
                prof = np.any(arr != 0.0, axis=other)
                nz_idx = np.nonzero(prof)[0]
                n_t.append(int(nz_idx[-1]) + 1 if len(nz_idx) else 0)
            else:
                n_t.append(shape[ax])
        for ax in range(3):
            gates = tuple((j, n_t[j]) for j in range(3)
                          if j != ax and n_t[j] < shape[j])
            core = arr[tuple(slice(0, shape[j] if j == ax else n_t[j])
                             for j in range(3))]
            sl = [slice(0, 1)] * 3
            sl[ax] = slice(None)
            prof = core[tuple(sl)]
            if np.array_equal(core, np.broadcast_to(prof, core.shape)):
                return ("vec", ax, prof.reshape(-1).copy(), gates)
        return ("full",)

    @staticmethod
    def _coeff_layout(runner):
        """Classify spatially-varying ca/cb update coefficients by their
        variation structure (cached on the runner — full-volume scans).

        Returns ``(full, vecs, consts)``:

        * ``full``  — ``[(name, arr3d)]`` genuinely 3D, need piece streams
        * ``vecs``  — ``[(name, axis, vec1d, gates)]`` varying along ONE
          axis (layered stacks / slab structures), possibly windowed by a
          trailing-zero interior box (see _classify_profile): shipped as
          broadcast vectors + in-kernel iota gates
        * ``consts``— ``[(name, scalar)]`` uniform arrays folded to static
        """
        cached = getattr(runner, "_kstep_coeff_layout", None)
        if cached is not None:
            return cached
        bnd = runner.plan.boundaries
        full, vecs, consts = [], [], []
        for fam_key, comps in (("coeffs_E", E_COMPS), ("coeffs_H", H_COMPS)):
            host = runner.consts[fam_key]
            for c in comps:
                for which, v in zip("ab", host[c]):
                    if np.ndim(v) == 0:
                        continue
                    name = f"cf_{which}_{c}"
                    arr = np.asarray(v, np.float32)
                    kind = PallasKStepper._classify_profile(arr, bnd)
                    if kind[0] == "const":
                        consts.append((name, kind[1]))
                    elif kind[0] == "vec":
                        vecs.append((name,) + kind[1:])
                    else:
                        full.append((name, arr))
        runner._kstep_coeff_layout = (full, vecs, consts)
        return full, vecs, consts

    @staticmethod
    def _poleB_layout(runner):
        """Classify the packed ADE pole B channels like _coeff_layout
        (cached). Returns ``(vec_specs, packed)``: ``vec_specs`` maps a
        channel KEY to a scalar or ``(axis, vec1d)``; ``packed`` is
        ``[(key, arr3d)]`` for genuinely 3D channels. Keys come from the
        pole metas' ``chans``: ``("m", mask_id)`` indicator channels
        (shared across every pole/comp referencing that mask) and
        ``("d", pi, ci, 0|1)`` dense re/im channels. Inside the
        z-restricted support slab a mask channel is OFTEN all-ones
        (single dispersive structure spanning the slab) — it folds to the
        scalar 1.0 and ships nothing."""
        cached = getattr(runner, "_kstep_poleB_layout", None)
        if cached is not None:
            return cached
        metas, (z0q, zqn) = PallasKStepper._pole_layout(runner)
        chans = {}
        for pi, meta in enumerate(metas):
            for ci, ch in enumerate(meta["chans"]):
                if ch is None:
                    continue
                if ch[0] == "m":
                    if ch not in chans:
                        chans[ch] = np.asarray(
                            runner.plan.pole_masks[ch[1]],
                            np.float32)[:, :, z0q:z0q + zqn]
                else:
                    br, bi = runner.consts["pole_B_dense"][f"{pi}_{ci}"]
                    # su-form: ship Gc*B (the state is Gc Q; _pole_layout)
                    Gc = complex(runner.pole_scalars[pi][1])
                    brp = Gc.real * np.asarray(br, np.float64) \
                        - Gc.imag * np.asarray(bi, np.float64)
                    bip = Gc.real * np.asarray(bi, np.float64) \
                        + Gc.imag * np.asarray(br, np.float64)
                    chans[ch + (0,)] = brp.astype(
                        np.float32)[:, :, z0q:z0q + zqn]
                    chans[ch + (1,)] = bip.astype(
                        np.float32)[:, :, z0q:z0q + zqn]
        vec_specs, packed = {}, []
        bnd = runner.plan.boundaries
        for ch in sorted(chans, key=str):
            arr = chans[ch]
            kind = PallasKStepper._classify_profile(arr, bnd)
            if kind[0] == "const":
                vec_specs[ch] = kind[1]
            elif kind[0] == "vec":
                vec_specs[ch] = kind[1:]  # (ax, vec, gates)
            else:
                packed.append((ch, arr))
        runner._kstep_poleB_layout = (vec_specs, packed)
        return vec_specs, packed

    @staticmethod
    def _psiy_geometry(runner):
        """Active y-CPML slab geometry per side: ``{side: (s0, w_act)}``.

        ``s0`` is the grid row where the stored slab starts; ``w_act`` is
        the 8-rounded count of rows actually carrying nonzero b/c. The
        alignment padding grows the hi slab to stay anchored at the (new)
        array edge with self-neutralizing zero rows at its tail
        (pad_plan_for_kernels); trimming to the active rows lets the
        config search place the slab in a SMALL block row instead of
        demanding ``by >= grown width`` (a 7-pole metal at 256^3 padded
        y 257->288 grew the slab to 48, forcing by=96 and a VMEM
        blow-up)."""
        cached = getattr(runner, "_kstep_psiy_geom", None)
        if cached is not None:
            return cached
        ny = runner.shape[1]
        out = {}
        for side in ("lo", "hi"):
            si = 0 if side == "lo" else 1
            w_max = max(runner.pml_meta[("dual", 1)][si],
                        runner.pml_meta[("primal", 1)][si])
            if not w_max:
                continue
            end = 1
            for fam in ("dual", "primal"):
                w_f = runner.pml_meta[(fam, 1)][si]
                if not w_f:
                    continue
                pml_c = runner.consts["pml"].get(f"{fam}1")
                bv = np.asarray(pml_c[f"b_{side}"]).reshape(-1)
                cv = np.asarray(pml_c[f"c_{side}"]).reshape(-1)
                nzs = np.nonzero((bv != 0) | (cv != 0))[0]
                if len(nzs):
                    # lo slabs pack left-aligned (b[0, ci, :w_f]); only hi
                    # slabs anchor at the far edge with offset w_max - w_f
                    off = 0 if side == "lo" else w_max - w_f
                    end = max(end, off + int(nzs[-1]) + 1)
            w_act = min(-(-end // 8) * 8, w_max)
            s0 = 0 if side == "lo" else ny - w_max
            out[side] = (s0, w_act)
        runner._kstep_psiy_geom = out
        return out

    @staticmethod
    def _pick_config_static(runner, k: int, shard: Optional[dict] = None):
        import os
        force = os.environ.get("TIDY3D_TPU_KSTEP_CFG")
        if force:
            bx, by, hwx, hwy = (int(v) for v in force.split(","))
            return (bx, by, hwx, hwy)
        nx, ny, nz = runner.shape
        if shard is not None:
            nx = shard["nx_loc"]
        esize = 2 if runner.dtype == jnp.bfloat16 else 4
        pole_metas, (_, q_zn) = PallasKStepper._pole_layout(runner)
        n_qch = sum(3 if m["real"] else 6 for m in pole_metas)
        n_bch = len(PallasKStepper._poleB_layout(runner)[1]) \
            if pole_metas else 0
        psiy_geom = PallasKStepper._psiy_geometry(runner)
        n_var = len(PallasKStepper._coeff_layout(runner)[0])
        n_psi_x = sum(
            1 for fam in ("dual", "primal")
            for w in runner.pml_meta[(fam, 0)] if w) * 2  # 2 comps per fam
        # preference measured on v5e (bench 360^3+PML): bx=16 beats 8 and
        # 32 (32,32 and 16,64 both exceed VMEM at k=4). At k=2 by=64 wins
        # (15.4 vs 12.6); at k=4 the larger windows tip Mosaic's pipeline
        # over VMEM pressure and by=48 wins (22.6 vs 21.2 at by=32).
        best = None
        w_lo_x = max(runner.pml_meta[("dual", 0)][0],
                     runner.pml_meta[("primal", 0)][0])
        w_hi_x = max(runner.pml_meta[("dual", 0)][1],
                     runner.pml_meta[("primal", 0)][1])
        # hwy: Mosaic requires sublane-dim blocks divisible by 8
        hwy = -(-k // 8) * 8
        for allow_collide in (False, True):
          for bx in (16, 8):
            if nx % bx:
                continue
            hwx = k
            while bx % hwx:
                hwx += 1
            if hwx > bx or nx % hwx:
                continue
            if w_lo_x and w_hi_x:
                # packed x-psi: a program may participate in at most one
                # side (single side-resolved row offset per DMA)
                s_clamp_lo = ((w_lo_x + hwx - 1) // bx) * bx
                s_min_hi = max(
                    (((nx - w_hi_x - hwx - bx) // bx) + 1) * bx, 0)
                if s_clamp_lo >= s_min_hi:
                    continue
            if shard is not None:
                # shard mode requires a clean split-region program on the
                # local grid: x strips + non-empty interior
                kx_lo = (((w_lo_x + hwx - 1) // bx) + 1) if w_lo_x else 0
                kx_hi = (nx // bx - max(
                    ((nx - w_hi_x - hwx - bx) // bx) + 1, 0)) \
                    if w_hi_x else 0
                if nx // bx - kx_lo - kx_hi <= 0:
                    continue
            by_order = (48, 64, 32, 24, 96, 128, 192, 256, 16) if k >= 4 \
                else (64, 48, 96, 128, 192, 256, 32, 24, 16)
            # fallback: any other divisor of ny (descending, hwy-aligned)
            # — grids whose ny has no divisor in the preference list
            # (e.g. ny=40 after an axis rotation) still get a config
            extra = tuple(b for b in range(min(ny, 256), hwy - 1, -hwy)
                          if ny % b == 0 and b not in by_order)
            by_order = by_order + extra
            for by in by_order:
                if ny % by or by % hwy or ny % hwy:
                    continue
                # each active y-slab must live entirely inside ONE block
                # row (static in-window offset per psiy region; applies
                # to both split and manual modes); a shared row is only
                # legal in the single-program manual fallback (pass 2)
                rows_used = set()
                ok_slabs = True
                for side, (s0, w_act) in psiy_geom.items():
                    j_row = s0 // by
                    if (s0 % by) + w_act > by:
                        ok_slabs = False
                        break
                    rows_used.add(j_row)
                if not ok_slabs:
                    continue
                if len(rows_used) < len(psiy_geom) \
                        and (not allow_collide or shard is not None):
                    # colliding slabs need the single-program manual path,
                    # which the sharded kernel never runs (its program
                    # must be the SPMD-uniform split-region form)
                    continue
                if shard is not None and psiy_geom \
                        and ny // by - len(rows_used) < 1:
                    # psiy strip rows + interior must all exist
                    continue
                Wx, Wy = bx + 2 * hwx, by + 2 * hwy
                win = Wx * Wy * nz
                ncop = 2 if runner.plan.is_complex else 1  # Bloch copies
                vmem = 6 * ncop * win * esize * 2    # field windows, 2-buf
                vmem += 6 * ncop * bx * by * nz * esize * 2  # outputs, 2-buf
                # f32 live temporaries: 16 windows measured (10 under-
                # predicted by ~40 MB at k=4: (16,64) compiled to 139.9M
                # against the 128M budget)
                vmem += 16 * ncop * win * 4
                vmem += n_psi_x * ncop * win * esize  # psi_x scratch
                # coeff pieces: double-buffered inputs + assembled window
                vmem += n_var * win * 4 * 3
                if n_qch:
                    # measured on v5e (384^3 half-domain Lorentz): the
                    # (16,32) config under-predicted by ~35M and compiled
                    # to 136.4M against the 128M cap — the assembled Q/B
                    # window values and the per-substep esum/oldE slabs
                    # are live on top of the double-buffered piece inputs.
                    # Lane-tile-aware: VMEM allocates the lane (last) dim
                    # in 128-wide tiles, so a 129-deep Q support slab
                    # costs 256 lanes per window (observed: 7-pole Au at
                    # 256^3 compiled to 131M against an 81M estimate)
                    q_esize = 2 if os.environ.get(
                        "TIDY3D_TPU_Q_DTYPE", "") == "bfloat16" else esize
                    lq = -(-q_zn // 128) * 128
                    winq = Wx * Wy * lq
                    vmem += n_qch * winq * q_esize * 2    # Q piece in, 2-buf
                    vmem += n_qch * winq * 4              # assembled Q values
                    vmem += n_qch * bx * by * lq * q_esize * 2  # Q outputs
                    vmem += n_bch * winq * 4 * 2          # B piece in, 2-buf
                    vmem += n_bch * winq * 4              # assembled B values
                    vmem += 15 * winq * 4                 # oldE/esum/pt temps
                if vmem <= VMEM_BUDGET:
                    best = (bx, by, hwx, hwy)
                    break
            if best is not None:
                break
          if best is not None:
              break
        return best

    # ------------------------------------------------------------------ #
    # host-side constants — stored under runner.consts["kstep"]
    # ------------------------------------------------------------------ #

    def _build_kconsts(self):
        runner = self.runner
        plan = self.plan
        nx, ny, nz = self.shape
        hwx, hwy, bx, by = self.hwx, self.hwy, self.bx, self.by
        Wx = self.Wx
        f32 = np.float32
        kc: dict = {}
        # keys whose leading dim is the shard axis (per-shard stacked);
        # the sharded driver ships them with P("gx") in_specs
        self.sharded_keys: set = set()
        shard = self.shard
        ndev = shard["ndev"] if shard is not None else 1
        # manual (non-BlockSpec) DMAs require the lane extent to be a
        # multiple of 128 when another dim is sliced; slab/coeff arrays
        # carry zero-padded lanes (no-op when nz is already aligned)
        self.nz_p = -(-nz // 128) * 128

        def _xpad_mode():
            return "wrap" if plan.boundaries[0][0] not in ("pec", "pmc") \
                else "edge"

        def _xslice_stack(arr_glob_ext, pad):
            """Per-shard slices of a globally x-extended array.

            ``arr_glob_ext`` has x extent nx_glob + 2*pad (pad = bx + hwx
            in shard mode) so that local padded row p of shard s reads
            row x0(s) + p of the extended array; stacked on a leading
            shard dim."""
            nx_loc = shard["nx_loc"]
            span = nx_loc + 2 * pad
            return np.stack([arr_glob_ext[s * nx_loc:s * nx_loc + span]
                             for s in range(ndev)])

        def ext_vec(vec3d, axis):
            v = np.asarray(vec3d).reshape(-1)
            mode = "wrap" if plan.boundaries[axis][0] not in ("pec", "pmc") \
                else "edge"
            pad = hwx if axis == 0 else hwy
            if axis == 0 and shard is not None:
                pad = bx + hwx
                ve = np.pad(v, (pad, pad), mode=mode).astype(f32)
                st = _xslice_stack(ve, pad)
                return st.reshape(ndev, -1, 1, 1)
            ve = np.pad(v, (pad, pad), mode=mode)
            shape = [1, 1, 1]
            shape[axis] = len(ve)
            return ve.reshape(shape).astype(f32)

        kc["inv_e_x"] = ext_vec(runner.consts["inv_dual"][0], 0)
        kc["inv_e_y"] = ext_vec(runner.consts["inv_dual"][1], 1)
        kc["inv_e_z"] = np.asarray(runner.consts["inv_dual"][2], f32) \
            * np.ones((1, 1, 1), f32)
        kc["inv_h_x"] = ext_vec(runner.consts["inv_primal"][0], 0)
        kc["inv_h_y"] = ext_vec(runner.consts["inv_primal"][1], 1)
        kc["inv_h_z"] = np.asarray(runner.consts["inv_primal"][2], f32) \
            * np.ones((1, 1, 1), f32)
        if shard is not None:
            self.sharded_keys.update({"inv_e_x", "inv_h_x"})
            # per-shard global-row offset of padded local row 0 minus
            # bx: gx_glob = gx_local + xoff (masks, thin-x sources)
            kc["xoff"] = np.array(
                [[[s * shard["nx_loc"] - bx]] for s in range(ndev)],
                np.int32)
            self.sharded_keys.add("xoff")

        # x-axis psi: ONE 4D-packed state array for all four components
        # and both sides. Row space = [0, xpad_lo) lo region then
        # [xpad_lo, xpad_lo+xpad_hi) hi region; a program participates in
        # at most one side (enforced in supported()), so a single
        # window-aligned DMA with a side-resolved row offset serves every
        # participant. dim1 packs the components [Ey, Ez, Hy, Hz]; b/c
        # vectors live in the same (row, comp) space with zeros on
        # pad/off-slab rows (self-neutralizing recursion). Packing cuts
        # the per-program psi DMA+semaphore count from 16 to 2.
        # Bloch runs double the channel dim (copy-1 slots after copy-0,
        # same b/c values).
        nc = self.n_copies

        def _tile_copies(tbl, ch_axis=1):
            """Repeat a psi b/c table's channel dim for the Bloch copy."""
            if nc == 1:
                return tbl
            return np.concatenate([tbl, tbl], axis=ch_axis)

        def _ext_comps(comps):
            if nc == 1:
                return comps
            return comps + [(c + "#", fam, sgn) for c, fam, sgn in comps]

        PX_COMPS = _ext_comps([("Ey", "dual", -1.0), ("Ez", "dual", 1.0),
                               ("Hy", "primal", -1.0), ("Hz", "primal", 1.0)])
        w_lo_x = max(runner.pml_meta[("dual", 0)][0],
                     runner.pml_meta[("primal", 0)][0])
        w_hi_x = max(runner.pml_meta[("dual", 0)][1],
                     runner.pml_meta[("primal", 0)][1])
        self.psix_pack = None
        if w_lo_x or w_hi_x:
            xpad_lo = xpad_hi = 0
            s_clamp_lo = -1
            s_min_hi = nx + 1
            if w_lo_x:
                s_clamp_lo = ((w_lo_x + hwx - 1) // bx) * bx
                xpad_lo = s_clamp_lo + Wx
            if w_hi_x:
                s_min_hi = max((((nx - w_hi_x - hwx - bx) // bx) + 1) * bx,
                               0)
                xpad_hi = (nx - bx - s_min_hi) + Wx
            rows = xpad_lo + xpad_hi
            if shard is None:
                b = np.zeros((rows, len(PX_COMPS), 1, 1), f32)
                c = np.zeros((rows, len(PX_COMPS), 1, 1), f32)
                for ci, (comp, fam, sgn) in enumerate(PX_COMPS):
                    wl, wh = runner.pml_meta[(fam, 0)]
                    pml_c = runner.consts["pml"].get(f"{fam}0")
                    if wl:
                        b[hwx:hwx + wl, ci] = pml_c["b_lo"].reshape(-1, 1, 1)
                        c[hwx:hwx + wl, ci] = pml_c["c_lo"].reshape(-1, 1, 1)
                    if wh:
                        lo_row = xpad_lo + (nx - wh) - (s_min_hi - hwx)
                        b[lo_row:lo_row + wh, ci] = \
                            pml_c["b_hi"].reshape(-1, 1, 1)
                        c[lo_row:lo_row + wh, ci] = \
                            pml_c["c_hi"].reshape(-1, 1, 1)
                kc["bx_pk"] = b
                kc["cx_pk"] = c
            self.psix_pack = dict(
                comps=PX_COMPS, xpad_lo=xpad_lo, xpad_hi=xpad_hi,
                s_clamp_lo=s_clamp_lo, s_min_hi=s_min_hi,
                has_lo=bool(w_lo_x), has_hi=bool(w_hi_x))

        # y-axis psi: one 4D-packed state array per side, components
        # [Ex, Ez, Hx, Hz] on dim1, slab width = max over families with
        # zero-padded b/c (lo slabs left-aligned, hi slabs right-aligned)
        PY_COMPS = _ext_comps([("Ex", "dual", 1.0), ("Ez", "dual", -1.0),
                               ("Hx", "primal", 1.0), ("Hz", "primal", -1.0)])
        self.psiy_pack: Dict[str, dict] = {}
        for side in ("lo", "hi"):
            si = 0 if side == "lo" else 1
            w_max = max(runner.pml_meta[("dual", 1)][si],
                        runner.pml_meta[("primal", 1)][si])
            if not w_max:
                continue
            b = np.zeros((1, len(PY_COMPS), w_max, 1), f32)
            c = np.zeros((1, len(PY_COMPS), w_max, 1), f32)
            for ci, (comp, fam, sgn) in enumerate(PY_COMPS):
                w_f = runner.pml_meta[(fam, 1)][si]
                if not w_f:
                    continue
                pml_c = runner.consts["pml"].get(f"{fam}1")
                bv = np.asarray(pml_c[f"b_{side}"], f32).reshape(-1)
                cv = np.asarray(pml_c[f"c_{side}"], f32).reshape(-1)
                if side == "lo":
                    b[0, ci, :w_f, 0] = bv
                    c[0, ci, :w_f, 0] = cv
                else:
                    b[0, ci, w_max - w_f:, 0] = bv
                    c[0, ci, w_max - w_f:, 0] = cv
            # trim to the active rows: the alignment padding grows the hi
            # slab with self-neutralizing zero tail rows (they'd force
            # by >= grown width); the slab may therefore sit NON-FLUSH
            # inside its block row — s0 records its grid start
            s0, w_act = self._psiy_geometry(runner)[side]
            kc[f"by_pk_{side}"] = b[:, :, :w_act]
            kc[f"cy_pk_{side}"] = c[:, :, :w_act]
            self.psiy_pack[side] = dict(comps=PY_COMPS, w=w_act, s0=s0)

        # z-axis psi: all slabs of a family lane-packed into one
        # (nx, ny, L) array fed through the same modular BlockSpec piece
        # machinery as the fields (Mosaic cannot DMA-slice a lane dim at
        # unaligned offsets, which ruled out the per-slab transposed
        # layout). b/c become (1, 1, L) lane vectors; the recursion for a
        # whole family is two fused VPU ops.
        self.psiz_meta: Dict[str, list] = {"dual": [], "primal": []}
        for fam, comps in (("dual", self.e_comps), ("primal", self.h_comps)):
            w_lo, w_hi = runner.pml_meta[(fam, 2)]
            pml_c = runner.consts["pml"].get(f"{fam}2")
            lane = 0
            bvec: List[np.ndarray] = []
            cvec: List[np.ndarray] = []
            for comp in comps:
                i_ax = "xyz".index(comp[1])
                jx, kx = (i_ax + 1) % 3, (i_ax + 2) % 3
                for axis, sgn in ((jx, +1), (kx, -1)):
                    if axis != 2:
                        continue
                    for side, width in (("lo", w_lo), ("hi", w_hi)):
                        if not width:
                            continue
                        z0 = 0 if side == "lo" else nz - width
                        self.psiz_meta[fam].append(dict(
                            comp=comp, side=side, width=width, sgn=sgn,
                            z0=z0, off=lane))
                        # flatten: the stored slabs are axis-reshaped
                        # (1, 1, w) and lo/hi widths may differ (the
                        # alignment padding grows the hi slab)
                        bvec.append(
                            np.asarray(pml_c[f"b_{side}"], f32).reshape(-1))
                        cvec.append(
                            np.asarray(pml_c[f"c_{side}"], f32).reshape(-1))
                        lane += width
            if lane:
                kc[f"bz_pk_{fam}"] = np.concatenate(bvec).reshape(1, 1, lane)
                kc[f"cz_pk_{fam}"] = np.concatenate(cvec).reshape(1, 1, lane)
        self.psiz_L = {fam: (m[-1]["off"] + m[-1]["width"]) if m else 0
                       for fam, m in self.psiz_meta.items()}
        # both families lane-packed into ONE state array [dual | primal]:
        # halves the z-psi piece streams (18 -> 9 per program)
        self.psiz_off = {"dual": 0, "primal": self.psiz_L["dual"]}
        self.psiz_Ltot = self.psiz_L["dual"] + self.psiz_L["primal"]
        if self.psiz_Ltot:
            zeros = np.zeros((1, 1, 0), f32)
            ball = [kc.get("bz_pk_dual", zeros), kc.get("bz_pk_primal", zeros)]
            call = [kc.get("cz_pk_dual", zeros), kc.get("cz_pk_primal", zeros)]
            kc["bz_pk_all"] = np.concatenate(
                [np.asarray(a, f32).reshape(1, 1, -1) for a in ball], axis=2)
            kc["cz_pk_all"] = np.concatenate(
                [np.asarray(a, f32).reshape(1, 1, -1) for a in call], axis=2)
            for fam in ("dual", "primal"):
                kc.pop(f"bz_pk_{fam}", None)
                kc.pop(f"cz_pk_{fam}", None)

        # spatially varying coefficients, hw-padded in x and y for
        # window-aligned DMA. Periodic axes wrap (halo cells are real
        # wrapped cells and their intermediate updates must use the true
        # coefficients); clamped axes edge-pad (halo values never propagate
        # past the boundary fix).
        x_mode = "wrap" if plan.boundaries[0][0] not in ("pec", "pmc") \
            else "edge"
        y_mode = "wrap" if plan.boundaries[1][0] not in ("pec", "pmc") \
            else "edge"

        # spatially-varying update coefficients, by variation structure:
        # * constant arrays fold back to static scalars;
        # * single-axis variation (layered stacks, slab structures — the
        #   common photonics case after subpixel averaging of xy-uniform
        #   layers) ships as a broadcast VECTOR like the inv_d tables:
        #   ~zero HBM traffic (measured on v5e 384^3 half-domain
        #   dielectric: full 3D streams cost 22.9 -> 13.9 Gcell*steps/s;
        #   z-vectors are free);
        # * genuinely 3D coefficients ride the SAME pipelined l/m/h piece
        #   machinery as the fields, packed on dim1 (one array, 9 streams
        #   regardless of count). The round-2 design DMA'd each window
        #   manually into scratch per program: 0.5 Gcell*steps/s — manual
        #   DMAs serialize against compute; pieces pipeline through
        #   Mosaic like everything else.
        self.var_coeffs: List[str] = []
        self.vec_coeffs: Dict[str, int] = {}
        self.static_coeffs: Dict[str, Tuple[Optional[float], Optional[float]]] = {}
        self.var_coeff_mean: Dict[str, float] = {}
        vc_arrays: List[np.ndarray] = []
        full_c, vec_c, const_c = self._coeff_layout(runner)
        consts_by = {}
        for fam_key, comps in (("coeffs_E", E_COMPS), ("coeffs_H", H_COMPS)):
            for c in comps:
                a_h, b_h = runner.consts[fam_key][c]
                consts_by[f"cf_a_{c}"] = a_h
                consts_by[f"cf_b_{c}"] = b_h
        for name, val in const_c:
            consts_by[name] = val  # uniform array folded to scalar
        for c in E_COMPS + H_COMPS:
            a_v, b_v = consts_by[f"cf_a_{c}"], consts_by[f"cf_b_{c}"]
            self.static_coeffs[c] = (
                float(a_v) if np.ndim(a_v) == 0 else None,
                float(b_v) if np.ndim(b_v) == 0 else None)
        for name, arr in full_c:
            self.var_coeffs.append(name)
            vc_arrays.append(arr)
            self.var_coeff_mean[name] = float(np.mean(arr))
        for name, ax, vec, gates in vec_c:
            self.vec_coeffs[name] = (ax, gates)
            self.var_coeff_mean[name] = float(np.mean(vec))
            if ax == 2:
                kc[f"cfv_{name}"] = np.asarray(vec, f32).reshape(1, 1, -1)
            else:
                kc[f"cfv_{name}"] = ext_vec(vec, ax)
                if ax == 0 and shard is not None:
                    self.sharded_keys.add(f"cfv_{name}")
        self.n_vch = len(self.var_coeffs)
        if vc_arrays:
            Cg = np.stack(vc_arrays, axis=1)  # (nx_glob, n_var, ny, nz)
            if shard is not None:
                Ce = np.pad(Cg, ((bx, bx), (0, 0), (0, 0), (0, 0)),
                            mode=x_mode)
                kc["coef_pk"] = np.stack(
                    [Ce[sd * shard["nx_loc"]:
                        sd * shard["nx_loc"] + shard["nx_loc"] + 2 * bx]
                     for sd in range(ndev)])
                self.sharded_keys.add("coef_pk")
            else:
                kc["coef_pk"] = Cg

        # packed ADE pole residue channels, z-restricted to the support
        # slab (see _pole_layout): mask-mode poles ship one 0/1 indicator
        # channel per comp (+ static complex B0), full-mode poles ship
        # re/im channel pairs [br_x..z, bi_x..z]. Channels factor like the
        # update coefficients: constant -> scalar, single-axis -> broadcast
        # vector, genuinely 3D -> the same l/m/h piece machinery as the
        # fields (read-only).
        self.n_qch = sum(3 if m["real"] else 6 for m in self.pole_metas)
        self.pole_b_vec: Dict[tuple, object] = {}
        self.pole_b_pos: Dict[tuple, int] = {}
        self.n_bch = 0
        if self.pole_metas:
            vec_specs, packed = self._poleB_layout(runner)
            for vi, (ch, spec) in enumerate(vec_specs.items()):
                if isinstance(spec, float):
                    self.pole_b_vec[ch] = spec
                    continue
                ax, vec, gates = spec
                name = f"pbv_{vi}"
                self.pole_b_vec[ch] = ("vec", ax, name, gates)
                if ax == 2:
                    kc[name] = np.asarray(vec, f32).reshape(1, 1, -1)
                else:
                    kc[name] = ext_vec(vec, ax)
                    if ax == 0 and shard is not None:
                        self.sharded_keys.add(name)
            self.n_bch = len(packed)
            if packed:
                Bg = np.stack([arr for _, arr in packed], axis=1)
                for pos, (ch, _) in enumerate(packed):
                    self.pole_b_pos[ch] = pos
                if shard is not None:
                    Be = np.pad(Bg, ((bx, bx), (0, 0), (0, 0), (0, 0)),
                                mode=x_mode)
                    kc["poleB_pk"] = np.stack(
                        [Be[sd * shard["nx_loc"]:
                            sd * shard["nx_loc"] + shard["nx_loc"] + 2 * bx]
                         for sd in range(ndev)])
                    self.sharded_keys.add("poleB_pk")
                else:
                    kc["poleB_pk"] = Bg

        # source profiles in window-aligned layouts (built in GLOBAL x
        # coordinates; shard mode slices per shard afterwards).
        # Complex (Bloch) runs: lowering splits a complex profile into a
        # (re, im) plan PAIR sharing slices (the im plan's waveform_key_im
        # equals the re plan's waveform_key); the kernel regroups the pair
        # into ONE complex profile so wrap pads on Bloch axes can carry
        # the phase factor (virtual profile e^{-i phi} P at the lo pads,
        # e^{+i phi} at the hi pads). Injection drives both copies:
        #   copy0 -= cb (Pr wf[kr] - Pi wf[ki]);  copy1 -= cb (Pr wf[ki]
        #   + Pi wf[kr])  — exactly Re/Im of P w(t).
        nxg = self.gshape[0]
        self.src_meta = []
        groups = []
        si = 0
        n_src = len(plan.sources)
        while si < n_src:
            sp = plan.sources[si]
            if self.n_copies == 2 and si + 1 < n_src:
                nxt = plan.sources[si + 1]
                if nxt.comp == sp.comp and nxt.slices == sp.slices \
                        and nxt.waveform_key_im == sp.waveform_key:
                    groups.append((si, si + 1))
                    si += 2
                    continue
            groups.append((si, None))
            si += 1

        cdtype = np.complex64 if self.n_copies == 2 else f32
        for gi, (i_re, i_im) in enumerate(groups):
            sp = plan.sources[i_re]
            prof = np.asarray(runner.consts["src_profiles"][i_re], cdtype)
            if i_im is not None:
                prof = prof + 1j * np.asarray(
                    runner.consts["src_profiles"][i_im], f32)
            box = tuple((s.stop if s.stop is not None else n) - (s.start or 0)
                        for s, n in zip(sp.slices, self.gshape))
            prof = np.broadcast_to(prof, box)
            xs, ys, zs = sp.slices
            x0, y0, z0 = (xs.start or 0), (ys.start or 0), (zs.start or 0)
            xe, ye, ze = prof.shape

            def wrap_pads(padded, axes):
                """Fill pads from the opposite core edge on periodic
                axes (halo cells are real wrapped cells); on Bloch axes
                the pads carry the phase factor (virtual profile)."""
                for ax, grid_ax, n_core, pad, per in axes:
                    if not per:
                        continue
                    cs = self.bloch_cs[grid_ax]
                    e_lo = complex(cs[0], -cs[1]) if cs is not None else 1.0
                    e_hi = complex(cs[0], cs[1]) if cs is not None else 1.0
                    sl_lo = [slice(None)] * 3
                    sl_lo[ax] = slice(0, pad)
                    sl_lo_src = [slice(None)] * 3
                    sl_lo_src[ax] = slice(n_core, n_core + pad)
                    padded[tuple(sl_lo)] = e_lo * padded[tuple(sl_lo_src)]
                    sl_hi = [slice(None)] * 3
                    sl_hi[ax] = slice(n_core + pad, n_core + 2 * pad)
                    sl_hi_src = [slice(None)] * 3
                    sl_hi_src[ax] = slice(pad, 2 * pad)
                    padded[tuple(sl_hi)] = e_hi * padded[tuple(sl_hi_src)]
                return padded

            if xe <= 8:
                padded = np.zeros((xe, ny + 2 * hwy, nz), cdtype)
                padded[:, y0 + hwy:y0 + hwy + ye, z0:z0 + ze] = prof
                padded = wrap_pads(padded,
                                   [(1, 1, ny, hwy, y_mode == "wrap")])
                meta = dict(kind="thin_x", x0=x0, xe=xe, comp=sp.comp,
                            wf=sp.waveform_key)
            elif ye <= 8:
                xpad = (bx + hwx) if shard is not None else hwx
                padded = np.zeros((nxg + 2 * xpad, ye, nz), cdtype)
                padded[x0 + xpad:x0 + xpad + xe, :, z0:z0 + ze] = prof
                padded = wrap_pads(padded, [(0, 0, nxg, xpad,
                                             x_mode == "wrap")])
                if shard is not None:
                    padded = _xslice_stack(padded, xpad)
                    self.sharded_keys.add(f"src_{gi}")
                meta = dict(kind="wide_x", y0=y0, ye=ye, comp=sp.comp,
                            wf=sp.waveform_key)
            else:
                # thin in z (e.g. z-normal plane waves): Mosaic cannot
                # load a dynamic lane window, so pre-tile the per-program
                # (Wx, ze, Wy) windows host-side into a grid-indexed array
                padded = np.zeros((nxg + 2 * hwx, ze, ny + 2 * hwy), cdtype)
                padded[x0 + hwx:x0 + hwx + xe, :, y0 + hwy:y0 + hwy + ye] = \
                    np.transpose(prof, (0, 2, 1))
                padded = wrap_pads(
                    padded, [(0, 0, nxg, hwx, x_mode == "wrap"),
                             (2, 1, ny, hwy, y_mode == "wrap")])
                ni, nj = nxg // bx, ny // by
                Wy = self.Wy
                tiled = np.zeros((ni, nj, Wx, ze, Wy), cdtype)
                for ti in range(ni):
                    for tj in range(nj):
                        tiled[ti, tj] = padded[ti * bx:ti * bx + Wx, :,
                                               tj * by:tj * by + Wy]
                padded = tiled
                if shard is not None:
                    ni_loc = self.shape[0] // bx
                    padded = np.stack(
                        [tiled[s * ni_loc:(s + 1) * ni_loc]
                         for s in range(ndev)])
                    self.sharded_keys.add(f"src_{gi}")
                meta = dict(kind="thin_z", z0=z0, ze=ze, comp=sp.comp,
                            wf=sp.waveform_key)
            if self.n_copies == 2:
                meta["wf_im"] = sp.waveform_key_im
                pim = np.ascontiguousarray(np.imag(padded)).astype(f32)
                meta["has_im"] = bool(np.any(pim))
                if meta["has_im"]:
                    kc[f"src_{gi}_im"] = pim
                    if f"src_{gi}" in self.sharded_keys:
                        self.sharded_keys.add(f"src_{gi}_im")
                kc[f"src_{gi}"] = np.ascontiguousarray(
                    np.real(padded)).astype(f32)
            else:
                kc[f"src_{gi}"] = np.asarray(padded, f32)
            self.src_meta.append(meta)

        # split-mode b/c tables for the piece-plumbed psi x layout: per
        # side, rows = strip x-extent plus hwx zero pads on both ends so
        # the kernel slices [b_i*bx, +Wx) windows without clamping
        PXS = [("Ey", "dual"), ("Ez", "dual"), ("Hy", "primal"),
               ("Hz", "primal")]
        if nc == 2:
            PXS = PXS + [(c + "#", fam) for c, fam in PXS]
        for side, kx_blocks in self._psix_strip_blocks().items():
            rows = kx_blocks * bx + 2 * hwx
            b = np.zeros((rows, len(PXS), 1, 1), f32)
            c = np.zeros((rows, len(PXS), 1, 1), f32)
            x_base = 0 if side == "lo" else nx - kx_blocks * bx
            for ci, (comp, fam) in enumerate(PXS):
                wl, wh = runner.pml_meta[(fam, 0)]
                pml_c = runner.consts["pml"].get(f"{fam}0")
                if side == "lo" and wl:
                    b[hwx:hwx + wl, ci] = pml_c["b_lo"].reshape(-1, 1, 1)
                    c[hwx:hwx + wl, ci] = pml_c["c_lo"].reshape(-1, 1, 1)
                if side == "hi" and wh:
                    r0 = hwx + (nx - wh) - x_base
                    b[r0:r0 + wh, ci] = pml_c["b_hi"].reshape(-1, 1, 1)
                    c[r0:r0 + wh, ci] = pml_c["c_hi"].reshape(-1, 1, 1)
            if shard is not None:
                # strips run on EVERY shard (SPMD-uniform program);
                # off-edge shards get zero tables -> psi stays 0 and
                # contributes nothing
                edge = 0 if side == "lo" else ndev - 1
                zb = np.zeros_like(b)
                kc[f"bxs_{side}"] = np.stack(
                    [b if s == edge else zb for s in range(ndev)])
                kc[f"cxs_{side}"] = np.stack(
                    [c if s == edge else zb for s in range(ndev)])
                self.sharded_keys.update({f"bxs_{side}", f"cxs_{side}"})
            else:
                kc[f"bxs_{side}"] = b
                kc[f"cxs_{side}"] = c

        runner.consts["kstep"] = kc

    # ------------------------------------------------------------------ #
    # psi state layout (created by runner.init_state)
    # ------------------------------------------------------------------ #

    def field_shape(self) -> Tuple[int, ...]:
        """Shape of one component-packed field state array (per shard in
        shard mode: padded local rows; Bloch runs pack the imaginary
        copy as channels 3-5)."""
        nx, ny, nz = self.shape
        if self.shard is not None:
            nx += 2 * self.bx
        return (nx, 3 * self.n_copies, ny, nz)

    def q_shape(self) -> Optional[Tuple[int, ...]]:
        """Shape of the packed ADE pole-current state array (None when
        the plan has no active poles): 6 channels per complex pole
        [qr_x, qr_y, qr_z, qi_x, qi_y, qi_z] at meta["ch0"], 3 channels
        [qr_x, qr_y, qr_z] per purely-real pole (Drude/relaxation terms
        keep Q real), z-restricted to the residue-map support slab."""
        if not self.pole_metas:
            return None
        nx, ny, _ = self.shape
        if self.shard is not None:
            nx += 2 * self.bx
        return (nx, self.n_qch, ny, self.q_zn)

    def psi_shapes(self) -> Dict[str, Tuple[int, ...]]:
        """Shapes for every psi state array.

        Split (piece-plumbed) mode: per-side true-wrap layouts fed
        through l/m/h BlockSpec pieces exactly like the fields — x-side
        slabs (kx*bx, 4, ny, nz), y-side slabs (nx, 4, w, nz); no stored
        halo pads (wrap/clamp handled by the piece index maps).
        Single-call fallback: the round-1 packed layouts with manual
        guarded DMAs (see _build_kconsts).
        z: one lane-packed (nx, ny, L) array per family in both modes.
        """
        nx, ny, nz = self.shape
        hwx, hwy = self.hwx, self.hwy
        shapes = {}
        nch = 4 * self.n_copies
        if self.shard is not None:
            nx_pad = nx + 2 * self.bx
            for side, kx in self._psix_strip_blocks().items():
                shapes[f"psix_{side}"] = (kx * self.bx, nch, ny, nz)
            for side, pk in self.psiy_pack.items():
                shapes[f"psiy_{side}"] = (nx_pad, nch, pk["w"], nz)
            if self.psiz_Ltot:
                shapes["psizp"] = (nx_pad, ny, self.psiz_Ltot)
            return shapes
        if len(self._regions()) > 1:
            for side, kx in self._psix_strip_blocks().items():
                shapes[f"psix_{side}"] = (kx * self.bx, nch, ny, nz)
            for side, pk in self.psiy_pack.items():
                shapes[f"psiy_{side}"] = (nx, nch, pk["w"], nz)
        else:
            if self.psix_pack is not None:
                px = self.psix_pack
                shapes["psix"] = (px["xpad_lo"] + px["xpad_hi"], nch,
                                  ny + 2 * hwy, self.nz_p)
            for side, pk in self.psiy_pack.items():
                shapes[f"psiy_{side}"] = (nx + 2 * hwx, nch, pk["w"],
                                          self.nz_p)
        if self.psiz_Ltot:
            shapes["psizp"] = (nx, ny, self.psiz_Ltot)
        return shapes

    def _psix_strip_blocks(self) -> Dict[str, int]:
        """x-slab strip width per side in bx blocks (split mode)."""
        nx, _, _ = self.shape
        ni = nx // self.bx
        out = {}
        if self.psix_pack is not None:
            px = self.psix_pack
            if px["has_lo"]:
                out["lo"] = px["s_clamp_lo"] // self.bx + 1
            if px["has_hi"]:
                out["hi"] = ni - px["s_min_hi"] // self.bx
        return out

    # ------------------------------------------------------------------ #
    # the pallas call
    # ------------------------------------------------------------------ #

    # ------------------------------------------------------------------ #
    # static grid partition: interior programs never see psi x/y machinery
    # ------------------------------------------------------------------ #

    def _regions(self):
        """Static partition of the (ni, nj) program grid by CPML
        participation. psi x/y participation is a STATIC function of the
        block index, so the grid splits into an interior region whose
        pallas kernel contains NO psi x/y machinery at all (it compiles
        to the tight vacuum kernel), thin boundary strips, and corner
        blocks. In split mode the psi x/y state uses the same true-wrap
        l/m/h BlockSpec piece plumbing as the fields — fully pipelined
        by Mosaic, no manual DMAs, no sanitize, no guards (measured on
        v5e 384^3+CPML: manual psi DMAs serialize against compute and
        strip programs ran 1.7-2.5x slower per cell than interior).

        Region dicts: i0/ni_r/j0/nj_r in bx/by block units, psix in
        {None, "lo", "hi", "manual"}, psiy_sides tuple with psiy_mode in
        {None, "pieces", "manual"}.
        """
        if getattr(self, "_regions_cache", None) is not None:
            return self._regions_cache
        nx, ny, _ = self.shape
        ni, nj = nx // self.bx, ny // self.by
        import os as _os
        force_single = _os.environ.get("TIDY3D_TPU_KSTEP_SPLIT", "1") == "0" \
            and self.shard is None
        if self.n_copies == 2 and self.shard is None \
                and _os.environ.get("TIDY3D_TPU_BLOCH_SPLIT", "0") != "1":
            # Bloch dual-copy runs default to the single-program
            # (manual-psi) region: the split-region kernels tripped a
            # Mosaic compiler bug (vector.broadcast of a lane-offset-
            # sliced z-vector inside the copy-doubled psi windows —
            # "#tpu.vpad<32,{*,264},(8,128)>", remote_compile HTTP 500).
            # bcast_slice now roll-rebases those slices; the split path
            # is available behind TIDY3D_TPU_BLOCH_SPLIT=1 pending more
            # hardware soak (bench fdtd_bloch: manual 9.1 Gcell*steps/s
            # at 256^3).
            force_single = True
        kx_lo = kx_hi = 0
        if self.psix_pack is not None:
            px = self.psix_pack
            if px["has_lo"]:
                kx_lo = px["s_clamp_lo"] // self.bx + 1
            if px["has_hi"]:
                kx_hi = ni - px["s_min_hi"] // self.bx
        # psiy slab rows: each active slab lives in ONE block row (gated
        # by the config search); a NON-flush hi slab (alignment padding
        # appends frozen rows past the PML) may sit at an interior row,
        # splitting the y-interior into up to two bands
        psi_rows: Dict[int, str] = {}
        for side, pk in self.psiy_pack.items():
            psi_rows[pk["s0"] // self.by] = side
        if len(psi_rows) < len(self.psiy_pack):
            # both slabs in one block row: only the manual path handles
            # two sides per program (split corners would double-step)
            force_single = True
        y_rows = sorted(psi_rows.items())  # [(j0y, side)]
        bands = []  # maximal runs of non-psi rows: [(j0, nj_r)]
        j = 0
        while j < nj:
            if j in psi_rows:
                j += 1
                continue
            j0b = j
            while j < nj and j not in psi_rows:
                j += 1
            bands.append((j0b, j - j0b))
        ni_int = ni - kx_lo - kx_hi
        nj_int = sum(njb for _, njb in bands)
        full = dict(i0=0, ni_r=ni, j0=0, nj_r=nj, psix="manual",
                    psiy_mode="manual", psiy_sides=("lo", "hi"),
                    x_static=False, y_static=False)
        if force_single or (kx_lo + kx_hi + len(psi_rows) == 0) \
                or ni_int <= 0 or nj_int <= 0:
            self._regions_cache = [full]
            return self._regions_cache
        regions = []
        x_sides = [(side, kx, i0x) for side, kx, i0x in
                   (("lo", kx_lo, 0), ("hi", kx_hi, ni - kx_hi)) if kx]
        # corners: psix + psiy pieces, one j-row each
        for xs, kx, i0x in x_sides:
            for j0y, ys in y_rows:
                regions.append(dict(i0=i0x, ni_r=kx, j0=j0y, nj_r=1,
                                    psix=xs, psiy_mode="pieces",
                                    psiy_sides=(ys,)))
        # x mid strips: psix only (their y windows never touch y slabs)
        for xs, kx, i0x in x_sides:
            for j0b, njb in bands:
                regions.append(dict(i0=i0x, ni_r=kx, j0=j0b, nj_r=njb,
                                    psix=xs, psiy_mode=None, psiy_sides=()))
        # y mid strips: psiy pieces only
        for j0y, ys in y_rows:
            regions.append(dict(i0=kx_lo, ni_r=ni_int, j0=j0y, nj_r=1,
                                psix=None, psiy_mode="pieces",
                                psiy_sides=(ys,)))
        for j0b, njb in bands:
            regions.append(dict(i0=kx_lo, ni_r=ni_int, j0=j0b, nj_r=njb,
                                psix=None, psiy_mode=None, psiy_sides=()))
        self._regions_cache = regions
        return regions

    def _exchange_halos(self, view: dict) -> dict:
        """Ring-exchange k-wide x halos of the dynamic state over the
        "gx" shard_map axis: fields (both packed families) plus the
        x-spanning psi arrays (psiy sides, packed z) — SURVEY §7 hard
        part 2: the halo must include the CPML auxiliary fields. Only
        the k rows adjacent to the core are ever read by the l/h piece
        maps, so the rest of the bx-wide halo block stays stale.
        For non-periodic global x the wrapped edge data is garbage but
        harmless: the global-wall masks zero every derivative that
        crosses the boundary."""
        k, bx = self.k, self.bx
        nx_loc = self.shape[0]
        ndev = self.shard["ndev"]
        fwd_perm = [(i, (i + 1) % ndev) for i in range(ndev)]
        bwd_perm = [(i, (i - 1) % ndev) for i in range(ndev)]

        def ex(arr):
            hi_edge = lax.slice_in_dim(arr, bx + nx_loc - k, bx + nx_loc,
                                       axis=0)
            lo_edge = lax.slice_in_dim(arr, bx, bx + k, axis=0)
            from_left = lax.ppermute(hi_edge, "gx", fwd_perm)
            from_right = lax.ppermute(lo_edge, "gx", bwd_perm)
            arr = lax.dynamic_update_slice_in_dim(arr, from_left.astype(
                arr.dtype), bx - k, axis=0)
            return lax.dynamic_update_slice_in_dim(
                arr, from_right.astype(arr.dtype), bx + nx_loc, axis=0)

        out = {"E": ex(view["E"]), "H": ex(view["H"])}
        if view.get("Q") is not None:
            out["Q"] = ex(view["Q"])
        new_psi = dict(view["psi"])
        for key, arr in view["psi"].items():
            if key.startswith("psiy") or key == "psizp":
                new_psi[key] = ex(arr)
        out["psi"] = new_psi
        return out

    _SKIP_EXCH = False  # profiling knob (scripts/shard_probe.py)

    def step_group(self, t0, view: dict, consts: dict, alt=None):
        """Advance (E, H, psi) by k steps starting at global step t0.

        `alt` (the ping-pong buffer set) supplies donation targets: each
        output is aliased onto the corresponding stale buffer so the
        outer time loop runs in-place (without this XLA copies every
        field array per group to thread the while-loop carry). With the
        static partition active, one pallas_call per region runs against
        the same pre-group field state; outputs chain through the
        donation targets (each call overwrites only its region's blocks).
        """
        regions = self._regions()
        if self.shard is not None and not PallasKStepper._SKIP_EXCH:
            # refresh this buffer set's halo rows from the neighbours'
            # fresh core edges (the kernel writes core blocks only; each
            # group exchanges its own input buffers, so the ping-pong
            # partner is refreshed when its turn comes)
            view = dict(view, **self._exchange_halos(view))
            # the caller must chain THESE (exchanged) arrays as the next
            # ping-pong alt — carrying the pre-exchange buffers keeps
            # them live past the halo update, so XLA cannot apply the
            # dynamic-update-slices in place and copies the FULL field
            # arrays every group (measured on v5e 384^3: 11.9 vs 24.8
            # Gcell*steps/s with the exchange skipped; scripts/
            # shard_probe.py). Halo rows of the alt are don't-care:
            # every group re-exchanges before reading.
        self._last_view = view
        # host-side per-group scalars are shared by every region call
        t0_arr = jnp.reshape(jnp.asarray(t0, jnp.int32), (1, 1))
        wf_all = _f32(jnp.asarray(consts["waveforms"]))
        wf_win = lax.dynamic_slice_in_dim(
            wf_all, jnp.asarray(t0, jnp.int32), self.k, axis=1)
        cur_alias = alt
        newE = newH = None
        newQ = view.get("Q")
        new_psi = dict(view["psi"])
        for region in regions:
            newE, newH, newQ, psi_out = self._region_call(
                (t0_arr, wf_win), view, consts, cur_alias, region)
            new_psi.update(psi_out)
            cur_alias = {"E": newE, "H": newH, "Q": newQ, "psi": new_psi}
        return newE, newH, newQ, new_psi

    def _region_call(self, t0_pack, view: dict, consts: dict, alt, region):
        t0_arr, wf_win = t0_pack
        import os as _os
        _sk = set(_os.environ.get("TIDY3D_TPU_KSTEP_SKIP", "").split(","))
        _skip_psi = "psi" in _sk
        runner = self.runner
        plan = self.plan
        nx, ny, nz = self.shape
        bx, by = self.bx, self.by
        hwx, hwy = self.hwx, self.hwy
        Wx, Wy = self.Wx, self.Wy
        dtype = self.dtype
        kc = consts["kstep"]
        i0, j0 = region["i0"], region["j0"]
        ni, nj = region["ni_r"], region["nj_r"]
        rbx, rby = bx // hwx, by // hwy
        nbx_h, nby_h = nx // hwx, ny // hwy
        x_per = plan.boundaries[0][0] not in ("pec", "pmc")
        y_per = plan.boundaries[1][0] not in ("pec", "pmc")

        names: List[str] = []
        arrays: List = []
        specs: List = []

        def add(name, arr, spec):
            names.append(name)
            arrays.append(arr)
            specs.append(spec)

        # x-block offset for the padded shard-local row space (one bx
        # halo block each side; halos ring-exchanged per group)
        xpb = 1 if self.shard is not None else 0

        def xmap(xk):
            # region offset i0 is in bx-block units; l/h pieces index in
            # hwx units, m pieces in bx units
            if self.shard is not None:
                # padded local rows: never wraps/clamps — the halo pads
                # cover the full dependency cone
                if xk == "m":
                    return lambda b: b + i0 + xpb
                if xk == "l":
                    return lambda b: (b + i0 + xpb) * rbx - 1
                return lambda b: (b + i0 + xpb) * rbx + rbx
            if xk == "m":
                return lambda b: b + i0
            if xk == "l":
                return (lambda b: ((b + i0) * rbx - 1) % nbx_h) if x_per \
                    else (lambda b: jnp.maximum((b + i0) * rbx - 1, 0))
            return (lambda b: ((b + i0) * rbx + rbx) % nbx_h) if x_per \
                else (lambda b: jnp.minimum((b + i0) * rbx + rbx, nbx_h - 1))

        def ymap(yk):
            if yk == "m":
                return lambda b: b + j0
            if yk == "l":
                return (lambda b: ((b + j0) * rby - 1) % nby_h) if y_per \
                    else (lambda b: jnp.maximum((b + j0) * rby - 1, 0))
            return (lambda b: ((b + j0) * rby + rby) % nby_h) if y_per \
                else (lambda b: jnp.minimum((b + j0) * rby + rby, nby_h - 1))

        def piece_spec(xk, yk, depth=nz):
            bsx = hwx if xk in "lh" else bx
            bsy = hwy if yk in "lh" else by
            xm, ym = xmap(xk), ymap(yk)
            return pl.BlockSpec(
                (bsx, bsy, depth),
                lambda b_i, b_j, xm=xm, ym=ym: (xm(b_i), ym(b_j), 0),
                memory_space=pltpu.VMEM)

        # fields ride as TWO component-packed arrays (nx, 3, ny, nz) — one
        # per family — through the same l/m/h piece machinery. Packing all
        # three components on a non-tiled dim cuts the per-program field
        # piece streams from 54 to 18 (strip programs were DMA-issue
        # bound: ~195us/program vs 39us interior before piece plumbing).
        def piece_spec4(xk, yk, C=3, depth=nz):
            bsx = hwx if xk in "lh" else bx
            bsy = hwy if yk in "lh" else by
            xm, ym = xmap(xk), ymap(yk)
            return pl.BlockSpec(
                (bsx, C, bsy, depth),
                lambda b_i, b_j, xm=xm, ym=ym: (xm(b_i), 0, ym(b_j), 0),
                memory_space=pltpu.VMEM)

        ncop = self.n_copies
        for famk in ("E", "H"):
            arr = view[famk]
            for xk in "lmh":
                for yk in "lmh":
                    add(f"{famk}pk_{xk}{yk}", arr,
                        piece_spec4(xk, yk, C=3 * ncop))

        # packed ADE pole state + residue channels through the same
        # piece machinery (z-restricted to the support slab)
        have_q = bool(self.pole_metas) and "poles" not in _sk
        if have_q:
            for xk in "lmh":
                for yk in "lmh":
                    add(f"Qpk_{xk}{yk}", view["Q"],
                        piece_spec4(xk, yk, C=self.n_qch, depth=self.q_zn))
                    if self.n_bch:
                        add(f"Bpk_{xk}{yk}", kc["poleB_pk"],
                            piece_spec4(xk, yk, C=self.n_bch,
                                        depth=self.q_zn))
            for ch, spec in self.pole_b_vec.items():
                if not isinstance(spec, float):
                    add(spec[2], kc[spec[2]],
                        pl.BlockSpec(memory_space=pltpu.VMEM))

        # the lane-packed z-psi array rides the same piece machinery
        use_psiz = self.psiz_Ltot and not _skip_psi and "psiz" not in _sk
        if use_psiz:
            arr = view["psi"]["psizp"]
            for xk in "lmh":
                for yk in "lmh":
                    add(f"psizp_{xk}{yk}", arr,
                        piece_spec(xk, yk, depth=self.psiz_Ltot))

        add("t0", t0_arr, pl.BlockSpec(memory_space=pltpu.SMEM))
        if self.shard is not None:
            # per-shard global-row offset (shard_map squeezes the
            # leading shard dim before step_group is called)
            add("xoff", consts["kstep"]["xoff"],
                pl.BlockSpec(memory_space=pltpu.SMEM))

        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        # Mosaic cannot index VMEM at a dynamic lane offset; the k-length
        # waveform window is sliced once per group in step_group
        add("wf_win", wf_win, pl.BlockSpec(memory_space=pltpu.SMEM))
        for name in ("inv_e_x", "inv_e_y", "inv_e_z",
                     "inv_h_x", "inv_h_y", "inv_h_z"):
            add(name, kc[name], full)
        for key in kc:
            # old packed-psix tables only feed the manual fallback path;
            # psiy tables feed both manual and piece modes; the split-mode
            # bxs_/cxs_ tables are added with the psix piece specs
            if key.startswith(("bx_", "cx_")) \
                    and region.get("psix") != "manual":
                continue
            if key.startswith(("by_", "cy_")) \
                    and region.get("psiy_mode") is None:
                continue
            if key.startswith(("bx_", "cx_", "by_", "cy_", "bz_", "cz_")):
                add(key, kc[key], full)
        for si, sm in enumerate(self.src_meta):
            keys = [f"src_{si}"]
            if sm.get("has_im"):
                keys.append(f"src_{si}_im")
            for key in keys:
                if sm["kind"] == "thin_z":
                    ze = sm["ze"]
                    add(key, kc[key], pl.BlockSpec(
                        (1, 1, Wx, ze, Wy),
                        lambda b_i, b_j: (b_i + i0, b_j + j0, 0, 0, 0),
                        memory_space=pltpu.VMEM))
                else:
                    add(key, kc[key], full)
        if self.var_coeffs and "coef" not in _sk:
            for xk in "lmh":
                for yk in "lmh":
                    add(f"Cpk_{xk}{yk}", kc["coef_pk"],
                        piece_spec4(xk, yk, C=self.n_vch))
        if self.vec_coeffs and "coef" not in _sk:
            for name in self.vec_coeffs:
                add(f"cfv_{name}", kc[f"cfv_{name}"], full)

        # psi x/y machinery per region: "manual" (single-call fallback,
        # packed layouts + guarded DMAs) or pieces (split mode: true-wrap
        # per-side layouts through l/m/h BlockSpecs, fully pipelined)
        psix_mode = region.get("psix")
        piece_psix = psix_mode in ("lo", "hi") and not _skip_psi \
            and "psix" not in _sk and f"psix_{psix_mode}" in view["psi"]
        psiy_mode = region.get("psiy_mode")
        piece_psiy_sides = tuple(
            sd for sd in region.get("psiy_sides", ())
            if psiy_mode == "pieces" and not _skip_psi and "psiy" not in _sk
            and f"psiy_{sd}" in view["psi"])
        pack_keys = []
        if psix_mode == "manual" and self.psix_pack is not None \
                and not _skip_psi and "psix" not in _sk:
            pack_keys.append("psix")
        if psiy_mode == "manual" and not _skip_psi and "psiy" not in _sk:
            for side in self.psiy_pack:
                if side in region["psiy_sides"]:
                    pack_keys.append(f"psiy_{side}")
        for key in pack_keys:
            add(key, view["psi"][key], pl.BlockSpec(memory_space=pl.ANY))

        if piece_psix:
            xside = psix_mode
            arr_x = view["psi"][f"psix_{xside}"]
            nbx_l = arr_x.shape[0] // hwx

            def xmap_ps(xk):
                # maps in the strip-local row space (array spans exactly
                # the strip's x-extent; clamped halos are harmless: the
                # rows read are b == 0 rows whose psi stays 0)
                if xk == "m":
                    return lambda b: b
                if xk == "l":
                    return lambda b: jnp.maximum(b * rbx - 1, 0)
                return lambda b: jnp.minimum(b * rbx + rbx, nbx_l - 1)

            for xk in "lmh":
                for yk in "lmh":
                    bsx = hwx if xk in "lh" else bx
                    bsy = hwy if yk in "lh" else by
                    xm, ym = xmap_ps(xk), ymap(yk)
                    add(f"psixp_{xk}{yk}", arr_x, pl.BlockSpec(
                        (bsx, 4 * ncop, bsy, nz),
                        lambda b_i, b_j, xm=xm, ym=ym: (xm(b_i), 0,
                                                        ym(b_j), 0),
                        memory_space=pltpu.VMEM))
            add(f"bxs_{xside}", kc[f"bxs_{xside}"], full)
            add(f"cxs_{xside}", kc[f"cxs_{xside}"], full)
        for sd in piece_psiy_sides:
            arr_y = view["psi"][f"psiy_{sd}"]
            w_sd = arr_y.shape[2]
            for xk in "lmh":
                bsx = hwx if xk in "lh" else bx
                xm = xmap(xk)
                add(f"psiyp_{sd}_{xk}", arr_y, pl.BlockSpec(
                    (bsx, 4 * ncop, w_sd, nz),
                    lambda b_i, b_j, xm=xm: (xm(b_i), 0, 0, 0),
                    memory_space=pltpu.VMEM))

        nx_arr = nx + 2 * bx * xpb  # padded local rows in shard mode
        out_shapes = [jax.ShapeDtypeStruct((nx_arr, 3 * ncop, ny, nz),
                                           dtype) for _ in range(2)]
        out_specs = [pl.BlockSpec(
            (bx, 3 * ncop, by, nz),
            lambda b_i, b_j: (b_i + i0 + xpb, 0, b_j + j0, 0),
            memory_space=pltpu.VMEM) for _ in range(2)]
        out_names = ["out_E", "out_H"]
        N_FIELD_OUT = 2
        if have_q:
            out_shapes.append(jax.ShapeDtypeStruct(
                (nx_arr, self.n_qch, ny, self.q_zn), self.q_dtype))
            out_specs.append(pl.BlockSpec(
                (bx, self.n_qch, by, self.q_zn),
                lambda b_i, b_j: (b_i + i0 + xpb, 0, b_j + j0, 0),
                memory_space=pltpu.VMEM))
            out_names.append("out_Q")
            N_FIELD_OUT = 3
        out_psi_keys = []
        for key in pack_keys:
            arr = view["psi"][key]
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_names.append(f"o_{key}")
            out_psi_keys.append(key)
        if piece_psix:
            arr = view["psi"][f"psix_{psix_mode}"]
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(pl.BlockSpec(
                (bx, 4 * ncop, by, nz),
                lambda b_i, b_j: (b_i, 0, b_j + j0, 0),
                memory_space=pltpu.VMEM))
            out_names.append("o_psixp")
            out_psi_keys.append(f"psix_{psix_mode}")
        for sd in piece_psiy_sides:
            arr = view["psi"][f"psiy_{sd}"]
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(pl.BlockSpec(
                (bx, 4 * ncop, arr.shape[2], nz),
                lambda b_i, b_j: (b_i + i0 + xpb, 0, 0, 0),
                memory_space=pltpu.VMEM))
            out_names.append(f"o_psiyp_{sd}")
            out_psi_keys.append(f"psiy_{sd}")
        if use_psiz:
            arr = view["psi"]["psizp"]
            out_shapes.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))
            out_specs.append(pl.BlockSpec(
                (bx, by, self.psiz_Ltot),
                lambda b_i, b_j: (b_i + i0 + xpb, b_j + j0, 0),
                memory_space=pltpu.VMEM))
            out_names.append("opsizp")
            out_psi_keys.append("psizp")

        io_aliases = {}
        if alt is not None:
            anyspec = pl.BlockSpec(memory_space=pl.ANY)
            for oi, famk in enumerate(("E", "H")):
                io_aliases[len(arrays)] = oi
                add(f"alias_{famk}", alt[famk], anyspec)
            if have_q:
                io_aliases[len(arrays)] = 2
                add("alias_Q", alt["Q"], anyspec)
            for i, key in enumerate(out_psi_keys):
                io_aliases[len(arrays)] = N_FIELD_OUT + i
                add(f"alias_{key}", alt["psi"][key], anyspec)

        scratch_shapes = []
        scratch_names = []
        for key in pack_keys:
            if key == "psix":
                shp = (Wx, 4 * ncop, Wy, self.nz_p)
            else:
                shp = (Wx, 4 * ncop, self.psiy_pack[key[5:]]["w"],
                       self.nz_p)
            scratch_names.append(f"s_{key}")
            scratch_shapes.append(pltpu.VMEM(shp, self.psi_dtype))
        n_dma = 4 * len(pack_keys)
        scratch_names.append("dma_sems")
        scratch_shapes.append(pltpu.SemaphoreType.DMA((max(n_dma, 1),)))

        all_names = names + out_names + scratch_names
        stepper = self

        pieces_info = dict(
            psix_side=psix_mode if piece_psix else None,
            psiy_sides=piece_psiy_sides)

        def kernel(*refs):
            r = dict(zip(all_names, refs))
            stepper._kernel_body(r, pack_keys, region, pieces_info)

        results = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(ni, nj),
            in_specs=specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            input_output_aliases=io_aliases,
            interpret=self.interpret,
        )(*arrays)

        newE, newH = results[0], results[1]
        newQ = results[2] if have_q else view.get("Q")
        new_psi = dict(view["psi"])
        for oi, key in enumerate(out_psi_keys):
            new_psi[key] = results[N_FIELD_OUT + oi]
        return newE, newH, newQ, new_psi

    # ------------------------------------------------------------------ #
    # kernel body
    # ------------------------------------------------------------------ #

    def _kernel_body(self, r, pack_keys, region, pieces_info=None):
        pieces_info = pieces_info or dict(psix_side=None, psiy_sides=())
        import os as _os
        _skip = set(_os.environ.get("TIDY3D_TPU_KSTEP_SKIP", "").split(","))
        nx, ny, nz = self.shape
        bx, by, k = self.bx, self.by, self.k
        hwx, hwy = self.hwx, self.hwy
        Wx, Wy = self.Wx, self.Wy
        boundaries = self.plan.boundaries
        dtype = self.dtype

        b_i = pl.program_id(0) + region["i0"]
        b_j = pl.program_id(1) + region["j0"]
        # shard mode: rows live in the padded local space (one bx halo
        # block each side); gx is lifted to GLOBAL rows via the per-shard
        # xoff scalar so masks and thin-x sources stay SPMD-uniform
        xpb = 1 if self.shard is not None else 0
        s = (b_i + xpb) * bx
        sy = b_j * by
        t0 = r["t0"][0, 0]
        nxg = self.gshape[0]

        gx = s - hwx + lax.broadcasted_iota(jnp.int32, (Wx, 1, 1), 0)
        if self.shard is not None:
            gx = gx + r["xoff"][0, 0]
        gy = sy - hwy + lax.broadcasted_iota(jnp.int32, (1, Wy, 1), 1)
        iota_z = lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)

        # trailing-zero interior gates for vec-classified coefficients /
        # pole channels (vec x box factoring, see _classify_profile):
        # 0/1 f32 masks cached per (axis, bound)
        _gate_cache = {}

        def int_gate(gates, ziota=None):
            m = None
            for (j, n_t) in gates:
                key = (j, n_t, ziota is not None and j == 2)
                if key not in _gate_cache:
                    g = gx if j == 0 else (
                        gy if j == 1 else
                        (ziota if ziota is not None else iota_z))
                    _gate_cache[key] = (g < n_t).astype(jnp.float32)
                mm = _gate_cache[key]
                m = mm if m is None else m * mm
            return m

        # ---- psi/coeff DMA bookkeeping ---- #
        sems = r["dma_sems"]
        dma_idx = [0]

        px = self.psix_pack
        if px is not None:
            lo_part = (s <= px["s_clamp_lo"]) if px["has_lo"] \
                else jnp.bool_(False)
            hi_part = (s >= px["s_min_hi"]) if px["has_hi"] \
                else jnp.bool_(False)
            x_part = jnp.logical_or(lo_part, hi_part)
            off_lo = jnp.clip(s, 0, max(px["xpad_lo"] - Wx, 0))
            off_hi = px["xpad_lo"] + jnp.clip(
                s - px["s_min_hi"], 0, max(px["xpad_hi"] - Wx, 0))
            if px["has_lo"] and px["has_hi"]:
                x_off = jnp.where(lo_part, off_lo, off_hi)
            elif px["has_lo"]:
                x_off = off_lo
            else:
                x_off = off_hi
        # psiy participation: the block row containing the (possibly
        # non-flush) active slab
        y_part = {side: (sy == (pk["s0"] // by) * by)
                  for side, pk in self.psiy_pack.items()}
        for side in ("lo", "hi"):
            y_part.setdefault(side, jnp.bool_(False))

        def psi_src_dst(key, ref):
            if key == "psix":
                return ref.at[pl.ds(x_off, Wx), :, pl.ds(sy, Wy), :]
            return ref.at[pl.ds(s, Wx), :, :, :]

        x_static = region.get("x_static", False)
        y_static = region.get("y_static", False)

        def psi_cond(key):
            # None = statically participating (strip regions): DMAs run
            # unguarded and pipeline; sanitize is skipped (scratch holds
            # real DMA-d state; pad rows in the arrays are true zeros)
            if key == "psix":
                return None if x_static else x_part
            return None if y_static else y_part[key[5:]]

        # guarded psi reads — one packed DMA per state array (the psi
        # machinery cost was dominated by per-slab semaphore/branch ops;
        # packing cuts 16 guarded DMAs to at most 3 per direction)
        read_waits = []
        for key in pack_keys:
            dma = pltpu.make_async_copy(
                psi_src_dst(key, r[key]), r[f"s_{key}"],
                sems.at[dma_idx[0]])
            dma_idx[0] += 1
            cond = psi_cond(key)
            if cond is None:
                dma.start()
            else:
                @pl.when(cond)
                def _(dma=dma):
                    dma.start()
            read_waits.append((dma, cond))

        # ---- field windows (component-packed, dim1 = comp) ---- #
        def ext(c):
            rows = []
            for xk in "lmh":
                cols = [r[f"{c}_{xk}{yk}"][:] for yk in "lmh"]
                rows.append(jnp.concatenate(cols, axis=1))
            return _f32(jnp.concatenate(rows, axis=0))

        def ext4(name):
            rows = []
            for xk in "lmh":
                cols = [r[f"{name}_{xk}{yk}"][:] for yk in "lmh"]
                rows.append(jnp.concatenate(cols, axis=2))
            return _f32(jnp.concatenate(rows, axis=0))

        # Bloch halo rotation: wrapped halo data (piece index maps read
        # the opposite global edge on periodic axes) represents the
        # VIRTUAL field e^{-i phi} F(wrap) (lo side; e^{+i phi} hi). The
        # phase is constant, so rotating the two real copies ONCE at
        # window assembly makes every subsequent in-window substep
        # correct — the virtual field satisfies the same update
        # equations. Applies to all field-like windows (fields, psi);
        # coefficient windows are unphased wrapped values and stay as-is.
        ncop = self.n_copies

        def bloch_rot(re_b, im_b, skip_x=False, skip_y=False):
            """Rotate wrapped-halo rows/cols between the two copies.

            re_b/im_b: equally-shaped blocks whose dim0 is the x window
            and whose y window (if any) sits at dim -2 for 4D blocks /
            dim 1 for 3D blocks."""
            for ax in (0, 1):
                cs = self.bloch_cs[ax]
                if cs is None or (ax == 0 and skip_x) \
                        or (ax == 1 and skip_y):
                    continue
                c, sph = cs
                nd = re_b.ndim
                if ax == 0:
                    gm = jnp.reshape(gx, (-1,) + (1,) * (nd - 1))
                    lim = nxg
                else:
                    yd = nd - 2 if nd >= 3 else 1
                    shp = [1] * nd
                    shp[yd] = -1
                    gm = jnp.reshape(gy, shp)
                    lim = ny
                lo = gm < 0
                hi = gm >= lim
                re2 = jnp.where(lo, c * re_b + sph * im_b,
                                jnp.where(hi, c * re_b - sph * im_b, re_b))
                im2 = jnp.where(lo, c * im_b - sph * re_b,
                                jnp.where(hi, c * im_b + sph * re_b, im_b))
                re_b, im_b = re2, im2
            return re_b, im_b

        def rot_win4(win, m):
            """Rotate a (Wx, 2m, Wy, nz) channel-packed window."""
            if ncop == 1 or all(c is None for c in self.bloch_cs[:2]):
                return win
            re_b, im_b = bloch_rot(win[:, :m], win[:, m:])
            return jnp.concatenate([re_b, im_b], axis=1)

        Ewin = rot_win4(ext4("Epk"), 3)
        Hwin = rot_win4(ext4("Hpk"), 3)
        fE = {c: Ewin[:, ci] for ci, c in enumerate(self.e_comps)}
        fH = {c: Hwin[:, ci] for ci, c in enumerate(self.h_comps)}

        # ADE pole state/coefficient windows (z-restricted): qs holds the
        # live per-channel Q values across substeps, exactly like fields
        have_q = bool(self.pole_metas) and "poles" not in _skip
        z0q, zqn = self.q_z0, self.q_zn
        qs = {}
        bch = {}
        if have_q:
            Qwin = ext4("Qpk")
            for ch in range(self.n_qch):
                qs[ch] = Qwin[:, ch]
            if self.n_bch:
                Bwin = ext4("Bpk")
            for ch, pos in self.pole_b_pos.items():
                bch[ch] = Bwin[:, pos]
            iota_zq = lax.broadcasted_iota(jnp.int32, (1, 1, zqn), 2)
            for ch, spec in self.pole_b_vec.items():
                if isinstance(spec, float):
                    bch[ch] = spec
                    continue
                _, ax, name, gates = spec
                ref = r[name]
                if ax == 0:
                    val = _f32(ref[pl.ds(s, Wx)])
                elif ax == 1:
                    val = _f32(ref[:, pl.ds(sy, Wy)])
                else:
                    val = _f32(ref[:])
                # z gates are slab-local (channels sliced to the support)
                g = int_gate(gates, ziota=iota_zq)
                bch[ch] = val * g if g is not None else val
        use_psiz_body = (self.psiz_Ltot and "psi" not in _skip
                         and "psiz" not in _skip)
        packed_fams = [fam for fam in ("dual", "primal")
                       if use_psiz_body and self.psiz_L[fam]]
        psizw = {}
        if use_psiz_body:
            zall = ext("psizp")
            for fam in packed_fams:
                ofs = self.psiz_off[fam]
                w = zall[:, :, ofs:ofs + self.psiz_L[fam]]
                if ncop == 2:
                    # family lanes = [copy-0 slabs | copy-1 slabs]
                    # (psiz_meta iterates base comps then '#' comps)
                    half = self.psiz_L[fam] // 2
                    re_b, im_b = bloch_rot(w[:, :, :half], w[:, :, half:])
                    w = jnp.concatenate([re_b, im_b], axis=2)
                psizw[fam] = w

        # piece-plumbed psi x/y windows (split mode): per-component
        # (window, ...) values updated in place each substep, written back
        # as core blocks — the same lifecycle as the packed z psi
        psix_side = pieces_info["psix_side"]
        b_i_loc = pl.program_id(0)
        psix_state = {}
        if psix_side is not None:
            rows = []
            for xk in "lmh":
                cols = [r[f"psixp_{xk}{yk}"][:] for yk in "lmh"]
                rows.append(jnp.concatenate(cols, axis=2))
            psixw_full = _f32(jnp.concatenate(rows, axis=0))
            # x-psi rows are strip-local (never wrap); only y halos can
            # cross a Bloch-y boundary
            psixw_full = rot_win4(psixw_full, 4) if ncop == 2 else \
                psixw_full
            for ci in range(4 * ncop):
                psix_state[ci] = psixw_full[:, ci]
        psiy_state = {}
        for sd in pieces_info["psiy_sides"]:
            win = _f32(jnp.concatenate(
                [r[f"psiyp_{sd}_{xk}"][:] for xk in "lmh"], axis=0))
            if ncop == 2:
                # y-psi slab cols are slab-local; only x halos wrap
                re_b, im_b = bloch_rot(win[:, :4], win[:, 4:],
                                       skip_y=True)
                win = jnp.concatenate([re_b, im_b], axis=1)
            for ci in range(4 * ncop):
                psiy_state[(sd, ci)] = win[:, ci]

        for dma, cond in read_waits:
            if cond is None:
                dma.wait()
            else:
                @pl.when(cond)
                def _(dma=dma):
                    dma.wait()

        # psi state LIVES IN SCRATCH between substeps (holding 10+ MB
        # of psi windows as live values through the whole kernel tips
        # Mosaic over its VMEM budget). Sanitize the scratch once, in
        # place, with SELECTS (never multiplies — 0*garbage-NaN stays
        # NaN): un-DMA'd scratch and never-written pad regions are
        # arbitrary bits. Valid x-psi rows have b != 0 (strictly
        # positive on real slab rows); pad columns on clamped axes are
        # zeroed by the in-domain mask.
        y_clamped = boundaries[1][0] in ("pec", "pmc")
        x_clamped = boundaries[0][0] in ("pec", "pmc")
        gy_in = jnp.logical_and(gy >= 0, gy < ny)
        gx_in = jnp.logical_and(gx >= 0, gx < nx)
        if "psix" in pack_keys and not x_static:
            sref = r["s_psix"]
            bvec4 = r["bx_pk"][pl.ds(x_off, Wx)]           # (Wx, 4, 1, 1)
            valid = jnp.logical_and(x_part, bvec4 != 0.0)
            if y_clamped:
                valid = jnp.logical_and(
                    valid, jnp.reshape(gy_in, (1, 1, Wy, 1)))
            sref[:] = jnp.where(valid, sref[:],
                                jnp.zeros((), sref.dtype))
        for side in ("lo", "hi"):
            key = f"psiy_{side}"
            if key not in pack_keys or y_static:
                continue
            sref = r[f"s_{key}"]
            valid = y_part[side]
            if x_clamped:
                valid = jnp.logical_and(
                    valid, jnp.reshape(gx_in, (Wx, 1, 1, 1)))
            sref[:] = jnp.where(valid, sref[:],
                                jnp.zeros((), sref.dtype))
        if ncop == 2:
            # manual-mode scratch: rotate the wrap halos between copies
            # (write-back refreshes wrap pads UNrotated edge data)
            if "psix" in pack_keys and self.bloch_cs[1] is not None:
                sref = r["s_psix"]
                v = _f32(sref[:])
                sref[:] = rot_win4(v, 4).astype(sref.dtype)
            if self.bloch_cs[0] is not None:
                for side in ("lo", "hi"):
                    key = f"psiy_{side}"
                    if key not in pack_keys:
                        continue
                    sref = r[f"s_{key}"]
                    v = _f32(sref[:])
                    re_b, im_b = bloch_rot(v[:, :4], v[:, 4:], skip_y=True)
                    sref[:] = jnp.concatenate([re_b, im_b],
                                              axis=1).astype(sref.dtype)

        def psi_get(key, ci):
            return _f32(r[f"s_{key}"][:, ci])[:, :, :nz]

        def psi_put(key, ci, val):
            sref = r[f"s_{key}"]
            if self.nz_p != nz:
                val = jnp.concatenate(
                    [val, jnp.zeros(val.shape[:2] + (self.nz_p - nz,),
                                    val.dtype)], axis=2)
            sref[:, ci] = val.astype(sref.dtype)

        coeff_vals = {}
        if self.var_coeffs and not ({"coef", "coefc"} & _skip):
            Cwin = ext4("Cpk")
            for ch, name in enumerate(self.var_coeffs):
                coeff_vals[name] = Cwin[:, ch]

        _skip_coef = bool({"coef", "coefc"} & _skip)

        def coeff(c, which):
            c = c[:2]  # Bloch copy-1 comps share the base coefficients
            a_s, b_s = self.static_coeffs[c]
            v = a_s if which == "a" else b_s
            if v is not None:
                return v
            name = f"cf_{which}_{c}"
            if _skip_coef:  # coef/coefc profiling skips
                return self.var_coeff_mean[name]
            spec_v = self.vec_coeffs.get(name)
            if spec_v is not None:  # single-axis broadcast vector (+gates)
                ax, gates = spec_v
                ref = r[f"cfv_{name}"]
                if ax == 0:
                    val = _f32(ref[pl.ds(s, Wx)])
                elif ax == 1:
                    val = _f32(ref[:, pl.ds(sy, Wy)])
                else:
                    val = _f32(ref[:])
                g = int_gate(gates)
                return val * g if g is not None else val
            return coeff_vals[name]

        def bcast_slice(v, axis, start, width):
            """Slice a (possibly broadcast-shaped) coefficient value."""
            if not jnp.ndim(v) or v.shape[axis] == 1:
                return v
            if axis == 2 and v.ndim == 3 \
                    and v.shape[0] == 1 and v.shape[1] == 1 and start:
                # rebase the lane slice to offset 0 with a cheap roll of
                # the (1,1,nz) vector: broadcasting a lane-OFFSET slice
                # trips a Mosaic compiler bug at several window shapes
                # (vector.broadcast with #tpu.vpad<"32,{*,128},(8,128)">
                # — seen on Bloch dual-copy windows at 256^3 and on the
                # 7-pole metal coupling at 384^3 where z0q=128)
                vr = pltpu.roll(v, v.shape[2] - start, 2)
                return vr[:, :, :width]
            idx = [slice(None)] * 3
            idx[axis] = slice(start, start + width)
            return v[tuple(idx)]

        inv_e = {0: r["inv_e_x"][pl.ds(s, Wx)],
                 1: r["inv_e_y"][:, pl.ds(sy, Wy)],
                 2: r["inv_e_z"][:]}
        inv_h = {0: r["inv_h_x"][pl.ds(s, Wx)],
                 1: r["inv_h_y"][:, pl.ds(sy, Wy)],
                 2: r["inv_h_z"][:]}

        # boundary fixes as precomputed 0/1 mask-vector multiplies
        # (cheaper than per-call iota compare + select; VPU-bound kernel)
        _mask_cache = {}

        def mask(axis, lo):
            key = (axis, lo)
            if key not in _mask_cache:
                if axis == 0:
                    g, lim = gx, nxg - 1
                elif axis == 1:
                    g, lim = gy, ny - 1
                else:
                    g, lim = iota_z, nz - 1
                _mask_cache[key] = (g != (0 if lo else lim)).astype(
                    jnp.float32)
            return _mask_cache[key]

        def shift_m(f, axis):
            if axis == 0:
                return jnp.concatenate([f[:1], f[:-1]], axis=0)
            return pltpu.roll(f, 1, axis)

        def shift_p(f, axis):
            if axis == 0:
                return jnp.concatenate([f[1:], f[-1:]], axis=0)
            return pltpu.roll(f, (Wy if axis == 1 else nz) - 1, axis)

        def bwd(f, axis, fp=None, copy=0):
            kind = "per" if "mask" in _skip else boundaries[axis][0]
            prev = shift_m(f, axis)
            if kind == "pec":
                return f - mask(axis, True) * prev
            if kind == "pmc":
                return mask(axis, True) * (f - prev)
            if axis == 2 and fp is not None \
                    and self.bloch_cs[2] is not None:
                # z wrap happens per-roll (no pre-rotated halo): the
                # rolled-in z=0 column is F(N-1); the virtual operand is
                # e^{-i phi} F(N-1), mixing the copies
                c, sph = self.bloch_cs[2]
                sgn = sph if copy == 0 else -sph
                prev_p = shift_m(fp, axis)
                prev = jnp.where(iota_z == 0,
                                 c * prev + sgn * prev_p, prev)
            return f - prev

        def fwd(f, axis, fp=None, copy=0):
            kind = "per" if "mask" in _skip else boundaries[axis][1]
            nxt = shift_p(f, axis)
            if kind == "pec":
                return mask(axis, False) * nxt - f
            if kind == "pmc":
                return mask(axis, False) * (nxt - f)
            if axis == 2 and fp is not None \
                    and self.bloch_cs[2] is not None:
                # rolled-in z=N-1 column is F(0); virtual = e^{+i phi} F(0)
                c, sph = self.bloch_cs[2]
                sgn = -sph if copy == 0 else sph
                nxt_p = shift_p(fp, axis)
                nxt = jnp.where(iota_z == nz - 1,
                                c * nxt + sgn * nxt_p, nxt)
            return nxt - f

        wall_mask = {}
        for ci, comp in enumerate(E_COMPS):
            if comp in self.runner.consts["wall_masks"]:
                m = None
                for ax in range(3):
                    if ax != ci and boundaries[ax][0] == "pec":
                        mm = mask(ax, True)
                        m = mm if m is None else m * mm
                if m is not None:
                    wall_mask[comp] = m

        def wall(comp, out):
            m = None if "mask" in _skip else wall_mask.get(comp[:2])
            return out if m is None else out * m

        def seg_merge(out, items, axis):
            """Add slab contributions in ONE concat along `axis`.

            items: list of (start, width, contrib) with static positions.
            Overlapping items (both psiy sides landing on the same window
            span in manual mode — the masked recursion zeroes the
            non-participating one) are applied in separate passes.
            """
            if not items:
                return out
            items = sorted(items, key=lambda t: t[0])
            passes = []  # each pass holds disjoint items
            for it in items:
                for p in passes:
                    if it[0] >= p[-1][0] + p[-1][1]:
                        p.append(it)
                        break
                else:
                    passes.append([it])
            idx = [slice(None)] * 3
            n_ax = out.shape[axis]
            for p in passes:
                segs = []
                pos = 0
                for r0, w, c in p:
                    if r0 > pos:
                        idx[axis] = slice(pos, r0)
                        segs.append(out[tuple(idx)])
                    idx[axis] = slice(r0, r0 + w)
                    segs.append(out[tuple(idx)] + c)
                    pos = r0 + w
                if pos < n_ax:
                    idx[axis] = slice(pos, n_ax)
                    segs.append(out[tuple(idx)])
                out = jnp.concatenate(segs, axis=axis)
            return out

        px_index = {}
        if px is not None:
            for ci, (comp_, fam_, sgn_) in enumerate(px["comps"]):
                px_index[comp_] = (ci, sgn_)
        py_index = {}
        for side, pk in self.psiy_pack.items():
            for ci, (comp_, fam_, sgn_) in enumerate(pk["comps"]):
                py_index[(comp_, side)] = (ci, sgn_, pk["w"], pk["s0"])

        def apply_psi(comp, fam, cb, out, d_by_axis, yitems):
            if "psi" in _skip:
                return out
            sign = 1.0 if comp[0] == "E" else -1.0
            if comp in px_index and psix_side is not None:
                ci, sgn = px_index[comp]
                d = d_by_axis[0]
                bvec = r[f"bxs_{psix_side}"][pl.ds(b_i_loc * bx, Wx), ci]
                cvec = r[f"cxs_{psix_side}"][pl.ds(b_i_loc * bx, Wx), ci]
                psi_new = bvec * psix_state[ci] + cvec * d
                psix_state[ci] = psi_new
                out = out + ((sign * sgn) * cb) * psi_new
            for side in pieces_info["psiy_sides"]:
                if (comp, side) not in py_index:
                    continue
                ci, sgn, width, s0y = py_index[(comp, side)]
                r0 = hwy + (s0y % by)  # slab offset inside its block row
                d_slab = d_by_axis[1][:, r0:r0 + width, :]
                bv = r[f"by_pk_{side}"][:, ci]
                cv = r[f"cy_pk_{side}"][:, ci]
                psi_new = bv * psiy_state[(side, ci)] + cv * d_slab
                psiy_state[(side, ci)] = psi_new
                cb_eff = (sign * sgn) * cb
                cb_sl = bcast_slice(cb_eff, 1, r0, width)
                yitems.append((r0, width, cb_sl * psi_new))
            if comp in px_index and "psix" in pack_keys:
                ci, sgn = px_index[comp]
                d = d_by_axis[0]
                if x_static:
                    bvec = r["bx_pk"][pl.ds(x_off, Wx), ci]
                    cvec = r["cx_pk"][pl.ds(x_off, Wx), ci]
                else:
                    pmul = x_part.astype(jnp.float32)
                    bvec = r["bx_pk"][pl.ds(x_off, Wx), ci] * pmul
                    cvec = r["cx_pk"][pl.ds(x_off, Wx), ci] * pmul
                psi_new = bvec * psi_get("psix", ci) + cvec * d
                psi_put("psix", ci, psi_new)
                out = out + ((sign * sgn) * cb) * psi_new
            for side in ("lo", "hi"):
                if (comp, side) not in py_index \
                        or f"psiy_{side}" not in pack_keys:
                    continue
                ci, sgn, width, s0y = py_index[(comp, side)]
                r0 = hwy + (s0y % by)  # slab offset inside its block row
                d_slab = d_by_axis[1][:, r0:r0 + width, :]
                if y_static:
                    bv = r[f"by_pk_{side}"][:, ci]
                    cv = r[f"cy_pk_{side}"][:, ci]
                else:
                    pmul = y_part[side].astype(jnp.float32)
                    bv = r[f"by_pk_{side}"][:, ci] * pmul
                    cv = r[f"cy_pk_{side}"][:, ci] * pmul
                psi_new = bv * psi_get(f"psiy_{side}", ci) + cv * d_slab
                psi_put(f"psiy_{side}", ci, psi_new)
                cb_eff = (sign * sgn) * cb
                cb_sl = bcast_slice(cb_eff, 1, r0, width)
                yitems.append((r0, width, cb_sl * psi_new))
            return out

        def apply_psiz(fam, outs, dz_map):
            """Fused packed z-psi recursion for one family.

            dz_map: comp -> that comp's axis-2 derivative (incl. inv
            factor) on the full window. One multiply-add updates every
            slab of the family at once along the packed lane dim; slab
            contributions land with one concat per component.
            """
            if fam not in psizw or "psi" in _skip:
                return outs
            meta = self.psiz_meta[fam]
            dpk = jnp.concatenate(
                [dz_map[m["comp"]][:, :, m["z0"]:m["z0"] + m["width"]]
                 for m in meta], axis=2)
            ofs = self.psiz_off[fam]
            Lf = self.psiz_L[fam]
            pz = r["bz_pk_all"][:, :, ofs:ofs + Lf] * psizw[fam] \
                + r["cz_pk_all"][:, :, ofs:ofs + Lf] * dpk
            psizw[fam] = pz
            sign = 1.0 if fam == "dual" else -1.0
            zitems = {}
            for m in meta:
                comp = m["comp"]
                z0, width = m["z0"], m["width"]
                cb_eff = (sign * m["sgn"]) * coeff(comp, "b")
                cb_sl = bcast_slice(cb_eff, 2, z0, width)
                zitems.setdefault(comp, []).append(
                    (z0, width, cb_sl * pz[:, :, m["off"]:m["off"] + width]))
            for comp, items in zitems.items():
                outs[comp] = seg_merge(outs[comp], items, 2)
            return outs

        # ---- source injection: space builds hoisted out of the substep
        # loop (profile reads, masks, and the b coefficient do not depend
        # on time); each substep is one fused mul-sub per (comp, waveform)
        inj_terms = {"E": [], "H": []}
        _acc = {}

        def _src_window(sm, prof_ref):
            add = None
            if sm["kind"] == "thin_x":
                for rx in range(sm["xe"]):
                    g_src = sm["x0"] + rx
                    row = prof_ref[rx, pl.ds(sy, Wy), :][None]
                    term = jnp.where(gx == g_src, row, 0.0)
                    add = term if add is None else add + term
            elif sm["kind"] == "wide_x":
                rows = prof_ref[pl.ds(s, Wx), :, :]
                for ry in range(sm["ye"]):
                    g_src = sm["y0"] + ry
                    col = rows[:, ry:ry + 1, :]
                    term = jnp.where(gy == g_src, col, 0.0)
                    add = term if add is None else add + term
            else:  # thin_z, pre-tiled per-program windows (x, z, y)
                rows = prof_ref[0, 0]
                for rz in range(sm["ze"]):
                    g_src = sm["z0"] + rz
                    sheet = jnp.transpose(rows[:, rz:rz + 1, :],
                                          (0, 2, 1))
                    term = jnp.where(iota_z == g_src, sheet, 0.0)
                    add = term if add is None else add + term
            return add

        def _acc_add(comp, wfk, val):
            if wfk is None or val is None:
                return
            keyt = (comp, wfk)
            _acc[keyt] = val if keyt not in _acc else _acc[keyt] + val

        for si, sm in enumerate(self.src_meta):
            comp = sm["comp"]
            cb = coeff(comp, "b")
            add_re = _src_window(sm, r[f"src_{si}"])
            val_re = cb * add_re
            if ncop == 1:
                _acc_add(comp, sm["wf"], val_re)
                continue
            # complex run: drive both copies (Re/Im of P * w(t))
            kr, ki = sm["wf"], sm.get("wf_im")
            val_im = None
            if sm.get("has_im"):
                val_im = cb * _src_window(sm, r[f"src_{si}_im"])
            _acc_add(comp, kr, val_re)
            if val_im is not None:
                _acc_add(comp, ki, -val_im)
            _acc_add(comp + "#", ki, val_re)
            if val_im is not None:
                _acc_add(comp + "#", kr, val_im)
        for (comp, wfk), val in _acc.items():
            fam_k = "E" if comp[:2] in E_COMPS else "H"
            inj_terms[fam_k].append((comp, wfk, val))

        def inject(family, fields, jstep):
            if "inj" in _skip:
                return fields
            for comp, wfk, val in inj_terms[family]:
                fields[comp] = fields[comp] - r["wf_win"][wfk, jstep] * val
            return fields

        def base_term(a, f):
            if isinstance(a, float) and a == 1.0:
                return f
            return a * f

        # ---- k substeps ---- #
        for jstep in range(k):
            if have_q:
                oldE_z = {c: fE[c][:, :, z0q:z0q + zqn] for c in E_COMPS}
            newE = {}
            dz_map = {}
            for cc, comp in enumerate(self.e_comps):
                ci, cp = cc % 3, cc // 3
                jx, kx = (ci + 1) % 3, (ci + 2) % 3
                hk = self.h_comps[cp * 3 + kx]
                hj = self.h_comps[cp * 3 + jx]
                # z-Bloch partner fields (other copy) for roll mixing
                hk_p = fH[self.h_comps[(1 - cp) * 3 + kx]] \
                    if ncop == 2 and self.bloch_cs[2] is not None else None
                hj_p = fH[self.h_comps[(1 - cp) * 3 + jx]] \
                    if ncop == 2 and self.bloch_cs[2] is not None else None
                d1 = bwd(fH[hk], jx, fp=hk_p, copy=cp) * inv_e[jx]
                d2 = bwd(fH[hj], kx, fp=hj_p, copy=cp) * inv_e[kx]
                out = base_term(coeff(comp, "a"), fE[comp]) \
                    + coeff(comp, "b") * (d1 - d2)
                if have_q:
                    # pole coupling -cb * Re(Gc Q), spliced into the
                    # support slab (semantics: pallas_fused pole_term).
                    # su-form state holds s = Re(Gc Q) directly, so the
                    # coupling is a pure channel SUM — no Gc multiplies
                    # (the VPU-bound pole path saves ~2 ops per pole per
                    # comp per substep; see _pole_layout)
                    pt = None
                    for meta in self.pole_metas:
                        t = qs[meta["ch0"] + ci]
                        pt = t if pt is None else pt + t
                    if pt is not None:
                        cbv = coeff(comp, "b")
                        cb_sl = bcast_slice(cbv, 2, z0q, zqn)
                        out = seg_merge(
                            out, [(z0q, zqn, -(cb_sl * pt))], 2)
                yitems = []
                out = apply_psi(comp, "dual", coeff(comp, "b"), out,
                                {jx: d1, kx: d2}, yitems)
                out = seg_merge(out, yitems, 1)
                if jx == 2:
                    dz_map[comp] = d1
                elif kx == 2:
                    dz_map[comp] = d2
                newE[comp] = out
            newE = apply_psiz("dual", newE, dz_map)
            newE = {c: wall(c, v) for c, v in newE.items()}
            fE = inject("E", newE, jstep)

            # semi-implicit pole recursion on the injected fields
            # (ordering matches fdtd._update_poles: Q' = A Q + B (E'+E));
            # masked E sums memoized per (mask channel, comp) — the poles
            # of one structure share 3 mask multiplies, not one each
            if have_q:
                esums = {ci: fE[comp][:, :, z0q:z0q + zqn] + oldE_z[comp]
                         for ci, comp in enumerate(E_COMPS)}
                mes_cache = {}
                for pi, meta in enumerate(self.pole_metas):
                    A = meta["A"]
                    ch0 = meta["ch0"]
                    is_real = meta["real"]  # qi channels not materialized
                    for ci, comp in enumerate(E_COMPS):
                        qr = qs[ch0 + ci]
                        qi = None if is_real else qs[ch0 + 3 + ci]
                        nqr = A.real * qr
                        nqi = None if is_real else A.real * qi
                        if A.imag:
                            nqr = nqr - A.imag * qi
                            nqi = nqi + A.imag * qr
                        ch = meta["chans"][ci]
                        if ch is not None and ch[0] == "m":
                            B0r, B0i = meta["B0"][ci]
                            key = (ch, ci)
                            if key not in mes_cache:
                                mval = bch[ch]
                                mes_cache[key] = esums[ci] \
                                    if isinstance(mval, float) \
                                    and mval == 1.0 else mval * esums[ci]
                            mes = mes_cache[key]
                            if B0r:
                                nqr = nqr + B0r * mes
                            if B0i:
                                nqi = nqi + B0i * mes
                        elif ch is not None:
                            nqr = nqr + bch[ch + (0,)] * esums[ci]
                            if not is_real:
                                nqi = nqi + bch[ch + (1,)] * esums[ci]
                        qs[ch0 + ci] = nqr
                        if not is_real:
                            qs[ch0 + 3 + ci] = nqi

            newH = {}
            dz_map = {}
            for cc, comp in enumerate(self.h_comps):
                ci, cp = cc % 3, cc // 3
                jx, kx = (ci + 1) % 3, (ci + 2) % 3
                ek = self.e_comps[cp * 3 + kx]
                ej = self.e_comps[cp * 3 + jx]
                ek_p = fE[self.e_comps[(1 - cp) * 3 + kx]] \
                    if ncop == 2 and self.bloch_cs[2] is not None else None
                ej_p = fE[self.e_comps[(1 - cp) * 3 + jx]] \
                    if ncop == 2 and self.bloch_cs[2] is not None else None
                d1 = fwd(fE[ek], jx, fp=ek_p, copy=cp) * inv_h[jx]
                d2 = fwd(fE[ej], kx, fp=ej_p, copy=cp) * inv_h[kx]
                out = base_term(coeff(comp, "a"), fH[comp]) \
                    - coeff(comp, "b") * (d1 - d2)
                yitems = []
                out = apply_psi(comp, "primal", coeff(comp, "b"), out,
                                {jx: d1, kx: d2}, yitems)
                out = seg_merge(out, yitems, 1)
                if jx == 2:
                    dz_map[comp] = d1
                elif kx == 2:
                    dz_map[comp] = d2
                newH[comp] = out
            newH = apply_psiz("primal", newH, dz_map)
            fH = inject("H", newH, jstep)

        # ---- write back (re-packed on dim1) ---- #
        r["out_E"][:] = jnp.stack(
            [fE[c][hwx:hwx + bx, hwy:hwy + by, :] for c in self.e_comps],
            axis=1).astype(dtype)
        r["out_H"][:] = jnp.stack(
            [fH[c][hwx:hwx + bx, hwy:hwy + by, :] for c in self.h_comps],
            axis=1).astype(dtype)
        if have_q:
            r["out_Q"][:] = jnp.stack(
                [qs[ch][hwx:hwx + bx, hwy:hwy + by, :]
                 for ch in range(self.n_qch)], axis=1).astype(self.q_dtype)
        if use_psiz_body:
            oref = r["opsizp"]
            oref[:] = jnp.concatenate(
                [psizw[fam] for fam in packed_fams],
                axis=2)[hwx:hwx + bx, hwy:hwy + by, :].astype(oref.dtype)

        # piece-psi write-back: plain blocked output stores (pipelined)
        if psix_side is not None:
            oref = r["o_psixp"]
            vals = jnp.stack([psix_state[ci] for ci in range(4 * ncop)],
                             axis=1)
            oref[:] = vals[hwx:hwx + bx, :, hwy:hwy + by, :].astype(
                oref.dtype)
        for sd in pieces_info["psiy_sides"]:
            oref = r[f"o_psiyp_{sd}"]
            vals = jnp.stack([psiy_state[(sd, ci)]
                              for ci in range(4 * ncop)], axis=1)
            oref[:] = vals[hwx:hwx + bx].astype(oref.dtype)

        # psi write-back: CORE-ONLY (cores tile the domain, so every
        # real row is written exactly once with full-dependency-cone
        # values — no overlap race, unlike full-window writes whose
        # outermost halo rows are wrong after k substeps). Never-written
        # pad regions are neutralized by the read-side sanitize; wrap
        # pads on periodic axes are refreshed by edge programs copying
        # their edge core slabs to the opposite pads.
        # scratch already holds the final psi state (updated in place
        # every substep) — write-back is pure DMA
        def start_guarded(dma, cond):
            if cond is None:
                dma.start()
            else:
                @pl.when(cond)
                def _(dma=dma):
                    dma.start()

        def and_cond(cond, extra):
            return extra if cond is None else jnp.logical_and(cond, extra)

        write_waits = []
        for key in pack_keys:
            sref = r[f"s_{key}"]
            cond = psi_cond(key)
            oref = r[f"o_{key}"]
            if key == "psix":
                dma = pltpu.make_async_copy(
                    sref.at[hwx:hwx + bx, :, hwy:hwy + by, :],
                    oref.at[pl.ds(x_off + hwx, bx), :,
                            pl.ds(sy + hwy, by), :],
                    sems.at[dma_idx[0]])
                dma_idx[0] += 1
                start_guarded(dma, cond)
                write_waits.append((dma, cond))
                if not y_clamped and hwy:
                    c_lo = and_cond(cond, sy == 0)
                    d1 = pltpu.make_async_copy(
                        sref.at[hwx:hwx + bx, :, hwy:2 * hwy, :],
                        oref.at[pl.ds(x_off + hwx, bx), :,
                                ny + hwy:ny + 2 * hwy, :],
                        sems.at[dma_idx[0]])
                    dma_idx[0] += 1
                    start_guarded(d1, c_lo)
                    write_waits.append((d1, c_lo))
                    c_hi = and_cond(cond, sy + by == ny)
                    d2 = pltpu.make_async_copy(
                        sref.at[hwx:hwx + bx, :, by:by + hwy, :],
                        oref.at[pl.ds(x_off + hwx, bx), :, 0:hwy, :],
                        sems.at[dma_idx[0]])
                    dma_idx[0] += 1
                    start_guarded(d2, c_hi)
                    write_waits.append((d2, c_hi))
            else:
                dma = pltpu.make_async_copy(
                    sref.at[hwx:hwx + bx, :, :, :],
                    oref.at[pl.ds(s + hwx, bx), :, :, :],
                    sems.at[dma_idx[0]])
                dma_idx[0] += 1
                start_guarded(dma, cond)
                write_waits.append((dma, cond))
                if not x_clamped and hwx:
                    c_lo = and_cond(cond, s == 0)
                    d1 = pltpu.make_async_copy(
                        sref.at[hwx:2 * hwx, :, :, :],
                        oref.at[nx + hwx:nx + 2 * hwx, :, :, :],
                        sems.at[dma_idx[0]])
                    dma_idx[0] += 1
                    start_guarded(d1, c_lo)
                    write_waits.append((d1, c_lo))
                    c_hi = and_cond(cond, s + bx == nx)
                    d2 = pltpu.make_async_copy(
                        sref.at[bx:bx + hwx, :, :, :],
                        oref.at[0:hwx, :, :, :],
                        sems.at[dma_idx[0]])
                    dma_idx[0] += 1
                    start_guarded(d2, c_hi)
                    write_waits.append((d2, c_hi))
        for dma, cond in write_waits:
            if cond is None:
                dma.wait()
            else:
                @pl.when(cond)
                def _(dma=dma):
                    dma.wait()
