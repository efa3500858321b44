"""The FDTD time-stepping core: JAX/XLA leapfrog with CPML, dispersive ADE,
source injection, and on-device running-DFT monitor accumulation.

This is the component the reference keeps server-side (its cloud GPU engine —
see SURVEY.md §2.3 item 1). TPU-first design:

* **Tile-aligned stencil shifts.** Stencil neighbors are read through
  region-sliced expressions (`_shift_take`): interior PML-slab regions use
  pure offset slices (fused by XLA into the output kernel), and whole-axis
  regions use one aligned concat with the boundary wrap column. Measured
  alternatives — ghost-cell arrays with dynamic-update-slice writes, and
  1-wide edge strips to avoid concat entirely — are 20%-3x slower on TPU:
  misaligned sublane/lane access dominates over raw HBM traffic. Boundary
  kinds: zero column = PEC, mirrored = PMC, wrapped = periodic, phase-mixed
  dual-copy wrap = Bloch.
* **CPML as fold + correction.** The 1/kappa stretch folds into the inverse
  step-size vectors (free); the recursive psi memories live only in boundary
  slabs and enter as small slab-sized corrections added to the interior
  update.
* The whole run is ONE jitted dispatch: a while_loop over chunks with the
  field-decay shutoff evaluated on device (critical behind a high-latency
  device tunnel; also optimal on-prem).
* All device math is real f32: complex values (DFT phasors, pole states) are
  explicit (re, im) pairs. TPU has no native complex support.
* Uniform material coefficients collapse to scalars (less HBM traffic).
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import EPSILON_0
from ..log import log
from .lowering import E_COMPS, H_COMPS, SimulationPlan

NUM_CHUNKS = 20
SHUTOFF_MIN_CHUNKS = 4
G = 1  # ghost width


def _axis_reshape(vec: np.ndarray, axis: int) -> np.ndarray:
    shape = [1, 1, 1]
    shape[axis] = len(vec)
    return vec.reshape(shape)


def _is_trivial(sl) -> bool:
    return all(s == slice(None) for s in sl)


def _take(arr, sl):
    """arr[sl], skipping the indexing op entirely when the slice is trivial
    (jnp emits a real lax.slice even for all-full slices)."""
    if _is_trivial(sl):
        return arr
    return arr[sl]


def _bslice(vec_3d: np.ndarray, sl) -> np.ndarray:
    """Slice a (1, n, 1)-style broadcast vector consistently with a 3D slice."""
    if jnp.ndim(vec_3d) == 0 or _is_trivial(sl):
        return vec_3d
    take = tuple(s if vec_3d.shape[ax] != 1 else slice(None)
                 for ax, s in enumerate(sl))
    if _is_trivial(take):
        return vec_3d
    return vec_3d[take]


class FDTDRunner:
    """Compiles and runs the time-stepping loop for one SimulationPlan."""

    def __init__(self, plan: SimulationPlan, precision: str = None,
                 sharding_plan=None):
        # single-axis y/z decompositions rotate onto the x-only fast
        # path (cyclic axis permutation of the whole lowered problem —
        # solver/plan_rotate.py); monitor outputs rotate back in run().
        # Mixed 2D/3D layouts stay in original axes (GSPMD fallback).
        self._plan_rot = 0
        if sharding_plan is not None and not plan.is_complex:
            d = sharding_plan.decomp
            if d[0] == 1 and ((d[1] > 1) != (d[2] > 1)):
                from jax.sharding import Mesh

                from .plan_rotate import perm_for_rot, rotate_plan
                from .sharding import AXIS_NAMES, ShardingPlan

                self._plan_rot = 1 if d[1] > 1 else 2
                p = perm_for_rot(self._plan_rot)
                plan = rotate_plan(plan, self._plan_rot)
                mesh = Mesh(np.transpose(sharding_plan.mesh.devices, p),
                            AXIS_NAMES)
                sharding_plan = ShardingPlan(mesh, plan.shape)
        self.plan = plan
        self.shape = plan.shape           # interior (physical) shape
        self.gshape = tuple(n + 2 * G for n in plan.shape)
        self.sharding = sharding_plan
        # complex (Bloch) runs step TWO real field copies (re, im) that couple
        # only at the Bloch wrap planes and in source injection — TPU has no
        # native complex dtype, and away from the wrap the update is identical
        self.is_complex = plan.is_complex
        self._bloch_cs = []
        for ph in plan.bloch_phases:
            if abs(ph - 1.0) > 1e-12:
                self._bloch_cs.append((float(np.real(ph)), float(np.imag(ph))))
            else:
                self._bloch_cs.append(None)
        # optional reduced-precision FIELD STORAGE (compute stays f32 via
        # XLA's type promotion; DFT accumulators always f32). Halves HBM
        # traffic on the bandwidth-bound update at ~1e-2 relative field
        # accuracy — opt in per run or via TIDY3D_TPU_PRECISION=bfloat16.
        import os as _os
        prec = precision or _os.environ.get("TIDY3D_TPU_PRECISION", "float32")
        self.dtype = jnp.bfloat16 if str(prec).lower() in (
            "bf16", "bfloat16") else jnp.float32
        self.num_steps = plan.num_steps
        if plan.is_complex and plan.nonlinear is not None:
            raise NotImplementedError(
                "nonlinear media with Bloch (complex-field) boundaries are "
                "not supported")
        self._kernel_intent()
        self.pad_widths = (0, 0, 0)
        self._build_constants()
        self._init_kernel_mode()
        # rescue pass: if the best kernel tier didn't engage (odd/PEC grid
        # sizes failing the alignment gates), pad the domain with frozen
        # cells and retry so such runs still ride the fast Pallas kernels
        # instead of dropping to slower paths (kstep > fused > two-phase >
        # XLA, 22 vs 5 vs 4 vs 2 Gcell*steps/s on the CPML bench). Padding
        # is accepted only when it strictly improves the tier — an
        # already-optimal plan is never perturbed (e.g. widening a hi-side
        # PML slab can collapse the sharded kernel's region split).
        def _tier():
            if self.kstep is not None:
                return 3
            if self.fused is not None:
                return 2
            if self.pallas is not None:
                return 1
            return 0

        tier0 = _tier()
        if tier0 < 3 and (self._want_pallas or self._shard_kstep_try):
            from .lowering import pad_plan_for_kernels

            ndev_x = self.sharding.decomp[0] if self._shard_kstep_try else 1
            padded, pw = pad_plan_for_kernels(plan, ndev_x=ndev_x)
            if any(pw):
                unpadded_plan = plan
                self.plan = plan = padded
                self.shape = plan.shape
                self.gshape = tuple(n + 2 * G for n in plan.shape)
                self._build_constants()
                self._init_kernel_mode()
                if _tier() <= tier0:
                    # padding didn't improve the tier; revert
                    self.plan = plan = unpadded_plan
                    self.shape = plan.shape
                    self.gshape = tuple(n + 2 * G for n in plan.shape)
                    self._build_constants()
                    self._init_kernel_mode()
                else:
                    self.pad_widths = pw
        self._build_dft_tables()

    def _kernel_intent(self):
        """Decide (pre-consts) whether the fused Pallas kernel is wanted.

        TIDY3D_TPU_KERNEL = auto (default) | pallas | pallas_interpret | xla.
        Pallas is the default on TPU hardware; the XLA region-concat path
        serves CPU, sharded (GSPMD), and Bloch dual-copy runs.
        """
        import os as _os

        kern = _os.environ.get("TIDY3D_TPU_KERNEL", "auto")
        self._kernel_env = kern
        self._pallas_interpret = kern in ("pallas_interpret",
                                          "pallas2_interpret",
                                          "fused_interpret",
                                          "kstep_interpret")
        # sharded runs can ride the k-step kernel under shard_map when the
        # decomposition is x-only (PARITY known-gap closure): the per-shard
        # program is SPMD-uniform with ring halo exchange. Other layouts
        # (or TIDY3D_TPU_SHARDED_KSTEP=0) fall back to the GSPMD XLA path.
        self._shard_kstep_try = False
        if self.sharding is not None and not self.plan.is_complex \
                and kern in ("auto", "kstep", "kstep_interpret") \
                and _os.environ.get("TIDY3D_TPU_SHARDED_KSTEP", "1") != "0":
            decomp = self.sharding.decomp
            # any x-only layout, INCLUDING the trivial (1,1,1) mesh: a
            # 1-device shard_map run rides the same kernel + ring-
            # exchange code path and bounds the shard_map overhead on
            # real hardware (bench.py fdtd_sharded)
            if decomp[1] == 1 and decomp[2] == 1:
                if self._pallas_interpret:
                    self._shard_kstep_try = True
                else:
                    try:
                        self._shard_kstep_try = \
                            jax.devices()[0].platform == "tpu"
                    except Exception:
                        self._shard_kstep_try = False
        if kern == "xla" or self.sharding is not None:
            self._want_pallas = False
        elif kern == "auto":
            try:
                self._want_pallas = jax.devices()[0].platform == "tpu"
            except Exception:
                self._want_pallas = False
        else:
            self._want_pallas = True
        # pallas stores psi slabs so the slab dim is 8-aligned (the z slabs
        # transposed to (x, z-slab, y) layout; the x slabs 8-aligned so the
        # fused kernel's slab-fixup pass can block them); the XLA path
        # prefers 128-aligned z slabs (lane tiling of region concats)
        self._tile_quanta_default = "8,8,8" \
            if (self._want_pallas or self._shard_kstep_try) else "1,8,128"

    def _init_kernel_mode(self):
        import os as _os

        self.pallas = None
        self.fused = None
        self.kstep = None
        if getattr(self, "_shard_kstep_try", False):
            from .kernels.pallas_kstep import PallasKStepper

            ndev = self.sharding.decomp[0]
            nx = self.shape[0]
            # k=4 preferred (same reasoning as single-chip: HBM traffic
            # halves vs k=2 on the bandwidth-bound update); k=2 fallback
            # when the k=4 halo cone fails the block-divide gates.
            kenv_sh = _os.environ.get("TIDY3D_TPU_KSTEP", "auto")
            if kenv_sh in ("auto", ""):
                k_order = (4, 2)
            elif kenv_sh == "0":
                k_order = ()
            else:
                k_order = (int(kenv_sh), 4, 2)
            tried_sh = []
            for k in k_order:
                if k < 2 or k in tried_sh:
                    continue
                tried_sh.append(k)
                if nx % ndev == 0 and self._monitors_allow_k(k) \
                        and PallasKStepper.supported_sharded(self, k, ndev):
                    try:
                        self.kstep = PallasKStepper(
                            self, k, interpret=self._pallas_interpret,
                            shard=dict(ndev=ndev, nx_loc=nx // ndev))
                        self._mon_x_full = True
                        break
                    except ValueError:
                        self.kstep = None
            return
        if not self._want_pallas:
            return
        from .kernels.pallas_fused import PallasFusedStepper
        from .kernels.pallas_kstep import PallasKStepper
        from .kernels.pallas_step import PallasStepper

        # temporal-blocked k-step kernel: the fastest path when supported
        # (k leapfrog steps per HBM round trip). TIDY3D_TPU_KSTEP=0 disables,
        # =k forces a specific group size.
        import os as _os

        kenv = _os.environ.get("TIDY3D_TPU_KSTEP", "auto")
        if kenv != "0" and self._kernel_env in ("auto", "kstep",
                                                "kstep_interpret"):
            # k=4 wins at f32 too since the field-packing/piece redesign
            # (22.6 vs 15.4 Gcell*steps/s on the 384^3+CPML bench): HBM
            # traffic halves and the kernel is bandwidth-bound
            k_pref = int(kenv) if kenv != "auto" else 4
            tried = []
            for k in (k_pref, 4, 2):
                if k < 2 or k in tried:
                    continue
                tried.append(k)
                if not self._monitors_allow_k(k):
                    continue
                if PallasKStepper.supported(self, k):
                    try:
                        self.kstep = PallasKStepper(
                            self, k, interpret=self._pallas_interpret)
                        break
                    except ValueError:
                        self.kstep = None
        if self.kstep is not None:
            return
        if self.plan.is_complex:
            # Bloch dual-copy runs ride kstep or the XLA path only (the
            # 1-step fused/pallas kernels have no copy machinery)
            return

        interp = self._pallas_interpret
        # the fused one-pass kernel (with its slab-fixup pass for x-CPML)
        # beats the two-phase kernels when the packed x-slab region exists;
        # without it the XLA delta-correction post-pass makes it slower —
        # prefer fused only when the fixup kernel engages
        two_phase_only = self._kernel_env in ("pallas2", "pallas2_interpret")
        force_fused = self._kernel_env in ("fused", "fused_interpret")
        if not two_phase_only and PallasFusedStepper.supported(self, interp) \
                and (force_fused or self.fixup_meta is not None
                     or not any(self.pml_meta[(f, 0)] != (0, 0)
                                for f in ("dual", "primal"))):
            self.fused = PallasFusedStepper(self, interp)
        elif PallasStepper.supported(self, interp):
            self.pallas = PallasStepper(self, interp)
        elif self._kernel_env != "auto":
            log.warning(
                "TIDY3D_TPU_KERNEL=pallas requested but this run is not "
                "supported by the Pallas path (slab-alignment/tiny domain) "
                "— falling back to the XLA kernel.")

    # ------------------------------------------------------------------ #
    # constants (host numpy; shipped to device as jit arguments)
    # ------------------------------------------------------------------ #

    def _build_constants(self):
        plan = self.plan
        f32 = np.float32
        # invalidate kernel layout caches: consts/pole data change when
        # the plan is re-padded between builds
        for attr in ("_kstep_coeff_layout", "_kstep_poleB_layout",
                     "_kstep_psiy_geom"):
            if hasattr(self, attr):
                delattr(self, attr)

        def compact(arr: np.ndarray):
            arr = np.asarray(arr, f32)
            flat0 = arr.flat[0]
            if np.all(arr == flat0):
                return f32(flat0)
            return arr

        consts: dict = {}
        consts["coeffs_E"] = {c: (compact(a), compact(b))
                              for c, (a, b) in plan.coeffs_E.items()}
        consts["coeffs_H"] = {c: (compact(a), compact(b))
                              for c, (a, b) in plan.coeffs_H.items()}

        # inverse steps with the CPML 1/kappa stretch folded in
        self.pml_meta: Dict[Tuple[str, int], Tuple[int, int]] = {}
        consts["pml"] = {}
        inv_dual_eff = []
        inv_primal_eff = []
        for axis in range(3):
            n = self.shape[axis]
            cf_d = plan.pml_dual[axis]
            cf_p = plan.pml_primal[axis]
            inv_dual_eff.append(
                _axis_reshape((plan.inv_dual[axis] * cf_d.inv_kappa).astype(f32), axis))
            inv_primal_eff.append(
                _axis_reshape((plan.inv_primal[axis] * cf_p.inv_kappa).astype(f32),
                              axis))
            # round slab widths up to the hardware tile quantum of the axis
            # (1 / 8 sublanes / 128 lanes) so that the region-concat pieces are
            # tile-aligned; the extra slab cells carry b=c=0 (psi stays zero)
            import os as _os
            _quanta = _os.environ.get("TIDY3D_TPU_TILE_QUANTA",
                                      self._tile_quanta_default)
            quantum = tuple(int(q) for q in _quanta.split(","))[axis]
            for fam, cf in (("dual", cf_d), ("primal", cf_p)):
                w_lo = min(cf.n_lo + 1, n) if cf.n_lo else 0
                w_hi = min(cf.n_hi + 1, n) if cf.n_hi else 0
                w_lo_q = -(-w_lo // quantum) * quantum if w_lo else 0
                w_hi_q = -(-w_hi // quantum) * quantum if w_hi else 0
                if w_lo_q + w_hi_q <= n and (n - w_lo_q - w_hi_q) % quantum == 0:
                    w_lo, w_hi = w_lo_q, w_hi_q
                elif w_lo_q + w_hi_q <= n:
                    w_lo, w_hi = w_lo_q, w_hi_q  # middle misaligned; still better
                self.pml_meta[(fam, axis)] = (w_lo, w_hi)
                if w_lo == 0 and w_hi == 0:
                    continue
                # c_eff = c * kappa compensates the kappa folded into inv_*
                kappa = 1.0 / np.where(cf.inv_kappa == 0, 1.0, cf.inv_kappa)
                c_eff = cf.c * kappa
                consts["pml"][f"{fam}{axis}"] = dict(
                    b_lo=_axis_reshape(cf.b[:w_lo].astype(f32), axis),
                    c_lo=_axis_reshape(c_eff[:w_lo].astype(f32), axis),
                    b_hi=_axis_reshape(cf.b[n - w_hi:].astype(f32), axis),
                    c_hi=_axis_reshape(c_eff[n - w_hi:].astype(f32), axis),
                )
        consts["inv_dual"] = inv_dual_eff
        consts["inv_primal"] = inv_primal_eff

        # packed x-slab region for the fused kernel's slab-fixup pass: both
        # x-PML slabs (plus one spill block below the hi slab, reached by the
        # forward x-derivative of the E-field delta) concatenated into one
        # 8-row-blocked strip; b/c vectors zero-padded so pad rows are
        # self-neutralizing (psi' = 0*psi + 0*d)
        self.fixup_meta = None
        if self._want_pallas:
            nx = self.shape[0]
            w_e_lo, w_e_hi = self.pml_meta[("dual", 0)]
            w_h_lo, w_h_hi = self.pml_meta[("primal", 0)]
            w_lo = max(w_e_lo, w_h_lo)
            w_hi = max(w_e_hi, w_h_hi)
            nb_lo = w_lo // 8
            nb_hi = (w_hi // 8 + 1) if w_hi else 0
            R = (nb_lo + nb_hi) * 8
            if (w_lo or w_hi) and nx % 8 == 0 \
                    and w_lo % 8 == 0 and w_hi % 8 == 0 \
                    and nb_lo * 8 + nb_hi * 8 <= nx:
                self.fixup_meta = dict(nb_lo=nb_lo, nb_hi=nb_hi, R=R)
                for fam, (wl, wh) in (("dual", (w_e_lo, w_e_hi)),
                                      ("primal", (w_h_lo, w_h_hi))):
                    b_pack = np.zeros((R, 1, 1), f32)
                    c_pack = np.zeros((R, 1, 1), f32)
                    pml_c = consts["pml"].get(f"{fam}0")
                    if pml_c is not None:
                        if wl:
                            b_pack[:wl] = pml_c["b_lo"]
                            c_pack[:wl] = pml_c["c_lo"]
                        if wh:
                            b_pack[R - wh:] = pml_c["b_hi"]
                            c_pack[R - wh:] = pml_c["c_hi"]
                    consts["pml"][f"{fam}0_packed"] = (b_pack, c_pack)

        consts["waveforms"] = np.asarray(plan.waveforms)
        consts["src_profiles"] = [np.asarray(sp.profile) for sp in plan.sources]

        # 1D PEC-wall masks for tangential E on lower domain walls
        consts["wall_masks"] = {}
        for i, comp in enumerate(E_COMPS):
            masks = []
            for axis in range(3):
                if axis == i:
                    continue
                if plan.boundaries[axis][0] == "pec":
                    m = np.ones(self.shape[axis], f32)
                    m[0] = 0.0
                    masks.append(_axis_reshape(m, axis))
            if masks:
                consts["wall_masks"][comp] = masks

        # dispersive poles, compressed: static scalars live on the runner
        # (self.pole_B_meta); the only device arrays are the shared f32
        # indicator masks (one per distinct structure support, NOT per
        # pole) plus dense re/im maps for spatially varying residues.
        # The round-3 dense layout shipped 6 full-grid maps per pole:
        # 5.4 GB of jit arguments at 256^3 x 7-pole Au (HBM OOM).
        dt = plan.dt
        self.pole_scalars = []
        self.pole_B_meta = []
        consts["pole_masks"] = [np.asarray(m, f32) for m in plan.pole_masks]
        consts["pole_B_dense"] = {}
        for pi, pole in enumerate(plan.poles):
            a = pole.a
            A = (1.0 + a * dt / 2.0) / (1.0 - a * dt / 2.0)
            Gc = a * (A + 1.0)
            self.pole_scalars.append((complex(A), complex(Gc)))
            metas = []
            for ci in range(3):
                if pole.c_maps is not None:
                    Bm = EPSILON_0 * pole.c_maps[ci] * (dt / 2.0) \
                        / (1.0 - a * dt / 2.0)
                    consts["pole_B_dense"][f"{pi}_{ci}"] = (
                        np.asarray(np.real(Bm), f32),
                        np.asarray(np.imag(Bm), f32))
                    metas.append(dict(kind="dense"))
                    continue
                mid = pole.mask_ids[ci]
                c = pole.c_vals[ci]
                if mid < 0 or c == 0:
                    metas.append(dict(kind="zero"))
                    continue
                B0 = EPSILON_0 * c * (dt / 2.0) / (1.0 - a * dt / 2.0)
                metas.append(dict(kind="mask", mask_id=mid,
                                  B0=(float(B0.real), float(B0.imag))))
            self.pole_B_meta.append(metas)

        # nonlinear response coefficients: the fixed-point iteration solves
        # E' = E_lin - B (E'^3 - E^3) - K ((E+E')/2)^3 with
        # B = cb eps0 chi3 / dt (instantaneous chi3 polarization) and
        # K = cb ktpa (two-photon-absorption conductivity sigma_NL = ktpa E^2)
        if plan.nonlinear is not None:
            # iteration count is static (python loop inside the traced step)
            self.nl_num_iters = int(plan.nonlinear["num_iters"])
            nl = {"B": {}, "K": {}}
            for comp in E_COMPS:
                _, cb = consts["coeffs_E"][comp]
                chi3 = plan.nonlinear["chi3"].get(comp)
                ktpa = plan.nonlinear["ktpa"].get(comp)
                if chi3 is not None:
                    nl["B"][comp] = compact(cb * EPSILON_0 * chi3 / plan.dt)
                if ktpa is not None:
                    nl["K"][comp] = compact(cb * ktpa)
            consts["nl"] = nl

        # time-modulation entries: per entry, cos/sin time tables (padded one
        # step for the implicit n+1 sample) and per-comp B maps so that the
        # semi-implicit update solves
        #   E' (1 + Ae_{n+1} + S) = E_lin + (Ae_n - S) E
        # with Ae = cb eps0 delta_eps/dt and S = cb delta_sigma/2
        if plan.modulation:
            mod_list = []
            tmesh = plan.tmesh
            for entry in plan.modulation:
                ce = {}
                if entry.get("eps_maps"):
                    w = 2 * np.pi * entry["eps_freq"]
                    ph = entry["eps_phase"]
                    amp = entry["eps_amp"]
                    t_pad = np.concatenate([tmesh, tmesh[-1:] + plan.dt])
                    ce["eps_c"] = (amp * np.cos(w * t_pad + ph)).astype(f32)
                    ce["eps_s"] = (-amp * np.sin(w * t_pad + ph)).astype(f32)
                    ce["Beps"] = {}
                    for comp, (m1, m2) in entry["eps_maps"].items():
                        _, cb = consts["coeffs_E"][comp]
                        scale = cb * EPSILON_0 / plan.dt
                        ce["Beps"][comp] = (compact(scale * m1),
                                            compact(scale * m2))
                if entry.get("sigma_maps"):
                    w = 2 * np.pi * entry["sigma_freq"]
                    ph = entry["sigma_phase"]
                    amp = entry["sigma_amp"]
                    t_half = tmesh + plan.dt / 2
                    ce["sig_c"] = (amp * np.cos(w * t_half + ph)).astype(f32)
                    ce["sig_s"] = (-amp * np.sin(w * t_half + ph)).astype(f32)
                    ce["Bsig"] = {}
                    for comp, (m1, m2) in entry["sigma_maps"].items():
                        _, cb = consts["coeffs_E"][comp]
                        ce["Bsig"][comp] = (compact(cb * 0.5 * m1),
                                            compact(cb * 0.5 * m2))
                mod_list.append(ce)
            consts["mod"] = mod_list

        self.consts = consts

    # ------------------------------------------------------------------ #
    # pre-flight device-memory feasibility (reference gates scale
    # client-side via validate_pre_upload, simulation.py:3341; here the
    # solver owns execution so it must refuse over-budget plans with a
    # clean SetupError instead of a raw XLA OOM mid-run)
    # ------------------------------------------------------------------ #

    def estimate_device_memory(self) -> dict:
        """Rough per-device HBM budget of this run in bytes.

        ``consts``: resident coefficient/mask/DFT tables. ``state``: the
        solver state (fields, psi, pole currents, monitor accumulators,
        incl. the k-step ping-pong buffer set). ``margin``: XLA
        temporaries — the step program holds a few field-sized
        intermediates live on the XLA path (the Pallas paths are
        VMEM-blocked, but the same margin is kept as headroom)."""
        import jax

        def tree_bytes(tree) -> int:
            tot = 0
            for leaf in jax.tree_util.tree_leaves(tree):
                if hasattr(leaf, "nbytes"):
                    tot += int(leaf.nbytes)
                elif hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
                    tot += int(np.prod(leaf.shape)
                               * np.dtype(leaf.dtype).itemsize)
            return tot

        consts_b = tree_bytes(self.consts)
        try:
            state_b = tree_bytes(jax.eval_shape(self.init_state))
        except Exception:  # sharding-constrained init outside a mesh ctx
            state_b = 14 * int(np.prod(self.shape)) * 4
        n_shards = 1
        if self.sharding is not None:
            n_shards = max(int(np.prod(self.sharding.decomp)), 1)
        state_b = state_b // n_shards
        if n_shards > 1:
            # only the x-sharded constant arrays split across devices;
            # replicated tables (z-vectors, waveforms, DFT/pole tables)
            # stay resident on EVERY device — dividing them all made
            # sharded estimates optimistic (raw OOM past the gate)
            skeys = set(getattr(getattr(self, "kstep", None),
                                "sharded_keys", ()) or ())
            kc = self.consts.get("kstep", {})
            sharded_b = tree_bytes({k: v for k, v in kc.items()
                                    if k in skeys})
            consts_b = (consts_b - sharded_b) + sharded_b // n_shards
        margin = state_b // 2 + (256 << 20)
        return dict(consts=consts_b, state=state_b, margin=margin,
                    total=consts_b + state_b + margin)

    def check_memory_budget(self):
        """Raise SetupError before dispatch when the run cannot fit the
        device HBM. Limit resolution: TIDY3D_TPU_HBM_BYTES env override >
        device memory_stats bytes_limit > skip (non-TPU platforms run
        from host RAM). TIDY3D_TPU_MEM_CHECK=0 disables."""
        import os as _os

        import jax

        from ..exceptions import SetupError

        if _os.environ.get("TIDY3D_TPU_MEM_CHECK", "1") == "0":
            return
        env_limit = _os.environ.get("TIDY3D_TPU_HBM_BYTES")
        limit = None
        if env_limit:
            limit = int(float(env_limit))
        else:
            try:
                dev = jax.devices()[0]
                if dev.platform != "tpu":
                    return
                stats = dev.memory_stats() or {}
                limit = int(stats.get("bytes_limit", 0)) or None
            except Exception:
                limit = None
            if limit is None:
                limit = 16 << 30
        est = self.estimate_device_memory()
        if est["total"] > limit:
            gib = 1 << 30
            raise SetupError(
                f"Simulation needs an estimated {est['total'] / gib:.2f} "
                f"GiB of device memory (constants "
                f"{est['consts'] / gib:.2f} + state {est['state'] / gib:.2f}"
                f" + working margin {est['margin'] / gib:.2f}) but the "
                f"device limit is {limit / gib:.2f} GiB. Reduce the grid/"
                "monitor footprint, switch field storage to bfloat16 "
                "(TIDY3D_TPU_PRECISION=bfloat16), or shard the run over "
                "more chips (TIDY3D_TPU_SHARD=auto).")

    def _nyquist_fmax(self, mp_freqs) -> float:
        """Highest frequency with meaningful energy at a DFT monitor.

        The stride must resolve the SOURCE spectrum, not just the
        monitor's requested frequencies — energy above half the sampling
        rate aliases back onto the monitor band (the reference derives
        its Nyquist step from the source frequency range,
        tidy3d/components/simulation.py:4414).
        """
        fmax = float(np.max(np.abs(np.asarray(mp_freqs, np.float64))))
        for src_ in self.plan.simulation.sources:
            st = getattr(src_, "source_time", None)
            f0 = float(getattr(st, "freq0", 0.0) or 0.0)
            fw = float(getattr(st, "fwidth", 0.0) or 0.0)
            fmax = max(fmax, f0 + 2.5 * fw)
        return fmax

    def _monitors_allow_k(self, k: int) -> bool:
        """Can monitor sampling align to k-step group boundaries?

        Freq (running-DFT) monitors sample on a Nyquist-limited stride the
        runner chooses (reference behavior: simulation.py:4414), so they
        only require k <= nyquist step. Time monitors have user-fixed
        sampling steps which must all land on group ends (t == k-1 mod k).
        """
        for mp in self.plan.monitors:
            if mp.kind == "field" and mp.freqs is not None and len(mp.freqs):
                fmax = self._nyquist_fmax(mp.freqs)
                if fmax > 0:
                    nyq = max(int(1.0 / (2 * fmax) / self.plan.dt), 1)
                    if k > nyq:
                        return False
            elif mp.kind == "field_time":
                if mp.t_interval % k or (mp.t_start % k) != k - 1:
                    return False
        return True

    def _build_dft_tables(self):
        """Running-DFT cos/sin tables per freq monitor.

        With the k-step kernel active, fields materialize only at group
        ends, so the DFT samples on stride = k * max(1, nyquist // k)
        (zero rows elsewhere, sampled rows weighted by dt * stride) —
        exactly the reference's Nyquist-limited monitor stride
        (tidy3d/components/simulation.py:4414). k = 1 paths keep the
        every-step quadrature (stride 1).
        """
        plan = self.plan
        f32 = np.float32
        k = self.kstep.k if self.kstep is not None else 1
        self.consts["dft"] = {}
        tmesh = plan.tmesh
        # group-stride hoisting for the k-step path: monitors only sample
        # on their Nyquist stride, yet the accumulation ops (hundreds of
        # small slice-multiply-adds for a multi-surface flux monitor) ran
        # at EVERY group end with zero weights — pure dispatch overhead
        # that halved broadband-monitor throughput. B = the largest
        # (bounded) common divisor of all monitor group-periods such that
        # every sampled step lands on a group index g with (g+1) % B == 0;
        # _run_chunk then calls _accumulate_monitors only at those groups.
        mon_periods = []
        for mi, mp in enumerate(plan.monitors):
            if mp.kind == "field" and mp.freqs is not None and len(mp.freqs):
                freqs = np.asarray(mp.freqs)
                apod = mp.monitor.apodization.apodization_weights(tmesh) \
                    if getattr(mp.monitor, "apodization", None) is not None \
                    else np.ones_like(tmesh)
                stride = 1
                if k > 1:
                    fmax = self._nyquist_fmax(freqs)
                    nyq = max(int(1.0 / (2 * fmax) / plan.dt), 1) \
                        if fmax > 0 else k
                    stride = k * max(1, nyq // k)
                t_e = tmesh + plan.dt
                t_h = tmesh + 1.5 * plan.dt
                w = plan.dt * apod
                if stride > 1:
                    sample = ((np.arange(len(tmesh)) + 1) % stride) == 0
                    w = np.where(sample, w * stride, 0.0)
                ang_e = 2 * np.pi * t_e[:, None] * freqs[None, :]
                ang_h = 2 * np.pi * t_h[:, None] * freqs[None, :]
                self.consts["dft"][str(mi)] = (
                    (w[:, None] * np.cos(ang_e)).astype(f32),
                    (w[:, None] * np.sin(ang_e)).astype(f32),
                    (w[:, None] * np.cos(ang_h)).astype(f32),
                    (w[:, None] * np.sin(ang_h)).astype(f32),
                )
                mon_periods.append(stride // k)
            elif mp.kind == "field_time":
                # samples at t_start + j*t_interval, with the kstep gate
                # guaranteeing t_start % k == k - 1 and k | t_interval:
                # in group units g0 = (t_start + 1)/k - 1, period ti/k —
                # covered by accumulating at (g+1) % B == 0 iff B | g0+1
                # and B | ti/k
                mon_periods.append(max(mp.t_interval // k, 1))
                mon_periods.append(max((mp.t_start + 1) // k, 1))
        B = 0
        for p in mon_periods:
            B = np.gcd(B, p)
        B = int(B) if B else 1
        # bound chunk-size inflation: keep the largest divisor of B <= 16
        if B > 16:
            B = max(d for d in range(1, 17) if B % d == 0)
        self._mon_group_stride = B

    # ------------------------------------------------------------------ #
    # state
    # ------------------------------------------------------------------ #

    def init_state(self) -> dict:
        dtype = self.dtype
        shape = self.shape

        def zeros(s):
            z = jnp.zeros(s, dtype)
            if self.sharding is not None and len(s) == 3:
                z = self.sharding.constrain(z)
            return z

        if getattr(self, "kstep", None) is not None:
            state = {"psi": {}, "Q": [], "mon": []}
            # k-step kernel: fields are component-packed (nx, 3, ny, nz)
            # arrays (one per family — cuts the kernel's piece-DMA streams
            # 3x); psi slabs hw-padded along the blocked axes; a second
            # (ping-pong) buffer set receives each group's outputs via
            # pallas input_output_aliases so the time loop runs fully
            # in-place (XLA otherwise copies every field array per group
            # to thread the while-loop carry)
            pdt = self.kstep.psi_dtype
            pk_shape = self.kstep.field_shape()
            state["E"] = zeros(pk_shape)
            state["H"] = zeros(pk_shape)
            for key, shp in self.kstep.psi_shapes().items():
                state["psi"][key] = jnp.zeros(shp, pdt)
            for mi, mp in enumerate(self.plan.monitors):
                state["mon"].append(self._init_monitor_acc(mi, mp))
            state["alt"] = {
                "E": zeros(pk_shape),
                "H": zeros(pk_shape),
                "psi": {key: jnp.zeros(shp, pdt)
                        for key, shp in self.kstep.psi_shapes().items()},
            }
            q_shape = self.kstep.q_shape()
            if q_shape is not None:
                # packed ADE pole currents (su-form: Gc Q) advance inside
                # the kernel; storage dtype may be reduced independently
                # of the fields (TIDY3D_TPU_Q_DTYPE)
                qdt = self.kstep.q_dtype
                state["Qpk"] = jnp.zeros(q_shape, qdt)
                state["alt"]["Qpk"] = jnp.zeros(q_shape, qdt)
            return state
        state = {
            "E": {c: zeros(shape) for c in E_COMPS},
            "H": {c: zeros(shape) for c in H_COMPS},
            "psi": {},
            "Q": [],
            "mon": [],
        }
        use_fixup = self.fused is not None and self.fused.fixup_ok
        for comp in E_COMPS + H_COMPS:
            fam = "dual" if comp[0] == "E" else "primal"
            i = "xyz".index(comp[1])
            for deriv_axis in [(i + 1) % 3, (i + 2) % 3]:
                w_lo, w_hi = self.pml_meta[(fam, deriv_axis)]
                if deriv_axis == 0 and use_fixup and (w_lo or w_hi):
                    # packed x-slab strip consumed by the slab-fixup kernel
                    state["psi"][f"{comp}|0|packed"] = zeros(
                        (self.fixup_meta["R"], shape[1], shape[2]))
                    continue
                for side, width in (("lo", w_lo), ("hi", w_hi)):
                    if width == 0:
                        continue
                    if (self.pallas is not None or self.fused is not None) \
                            and deriv_axis == 2:
                        # transposed (x, z-slab, y) layout: the slab dim sits
                        # in the 8-quantum sublane position so z-PML slabs
                        # stay 8-aligned instead of 128-aligned (saves ~25%
                        # HBM traffic at 384^3 with 12-layer PML)
                        s = (shape[0], width, shape[1])
                    else:
                        s = list(shape)
                        s[deriv_axis] = width
                    state["psi"][f"{comp}|{deriv_axis}|{side}"] = zeros(tuple(s))
        for _ in self.pole_scalars:
            state["Q"].append({c: (zeros(shape), zeros(shape)) for c in E_COMPS})
        if self.is_complex:
            state["E1"] = {c: zeros(shape) for c in E_COMPS}
            state["H1"] = {c: zeros(shape) for c in H_COMPS}
            state["psi1"] = {k: jnp.zeros_like(v) for k, v in state["psi"].items()}
            state["Q1"] = [{c: (zeros(shape), zeros(shape)) for c in E_COMPS}
                           for _ in self.pole_scalars]
        for mi, mp in enumerate(self.plan.monitors):
            state["mon"].append(self._init_monitor_acc(mi, mp))
        return state

    def _mon_slices(self, mp, comp):
        """Monitor slices for accumulation. Sharded-kstep accumulates
        the monitor's FULL x range per shard (uniform local shapes under
        SPMD); the global x slice is applied at run() postprocess."""
        sl = mp.slices[comp]
        if getattr(self, "_mon_x_full", False):
            return (slice(0, self.kstep.shape[0]),) + tuple(sl[1:])
        return sl

    def _init_monitor_acc(self, mi, mp):
        acc = {}
        if mp.kind == "field" and str(mi) in self.consts["dft"]:
            nf = len(mp.freqs)
            for comp in mp.comps:
                sl = self._mon_slices(mp, comp)
                s = tuple(s_.stop - s_.start for s_ in sl) + (nf,)
                acc[comp] = (jnp.zeros(s, jnp.float32),
                             jnp.zeros(s, jnp.float32))
        elif mp.kind == "field_time":
            n_samples = max(
                (mp.t_stop - mp.t_start + mp.t_interval - 1)
                // mp.t_interval, 1)
            for comp in mp.comps:
                sl = self._mon_slices(mp, comp)
                s = (n_samples,) + tuple(s_.stop - s_.start for s_ in sl)
                acc[comp] = jnp.zeros(s, jnp.float32)
        return acc

    # ------------------------------------------------------------------ #
    # stencil shifts (concat-based: one aligned materialization per shift)
    # ------------------------------------------------------------------ #

    def _int(self, F):
        return F

    def _wrap_col(self, F, Fp, axis: int, side: str, part: int):
        """Boundary column entering the stencil across the domain edge.

        'lo': the F(-1) column for a backward difference at i=0 (wraps to
        F(N-1) for periodic); 'hi': the F(N) column for a forward difference
        at i=N-1 (wraps to F(0)). With a Bloch phase e^{i phi} = c + i s the
        wrapped column mixes the two real copies: F(-1)=e^{-i phi}F(N-1),
        F(N)=e^{+i phi}F(0) — the ONLY place the copies of a complex run
        couple."""
        n = F.shape[axis]
        if side == "lo":
            kind = self.plan.boundaries[axis][0]
            col = lax.slice_in_dim(F, n - 1, n, axis=axis)
            if kind == "pec":
                return jnp.zeros_like(col)
            if kind == "pmc":
                return lax.slice_in_dim(F, 0, 1, axis=axis)
            if Fp is not None and self._bloch_cs[axis] is not None:
                c, s = self._bloch_cs[axis]
                colp = lax.slice_in_dim(Fp, n - 1, n, axis=axis)
                return c * col + (s if part == 0 else -s) * colp
            return col
        kind = self.plan.boundaries[axis][1]
        col = lax.slice_in_dim(F, 0, 1, axis=axis)
        if kind == "pec":
            return jnp.zeros_like(col)
        if kind == "pmc":
            return lax.slice_in_dim(F, n - 1, n, axis=axis)
        if Fp is not None and self._bloch_cs[axis] is not None:
            c, s = self._bloch_cs[axis]
            colp = lax.slice_in_dim(Fp, 0, 1, axis=axis)
            return c * col + (-s if part == 0 else s) * colp
        return col

    def _shift_take(self, F, Fp, sl, axis: int, dn: bool, part: int):
        """The shifted operand F_{i-1} (dn) or F_{i+1} (up) restricted to
        region slice `sl` — WITHOUT materializing a whole-array shifted copy.

        Interior regions read F through a pure offset slice (XLA fuses the
        slice+subtract+multiply chain into the output kernel, halving HBM
        traffic vs a materialized concat shift); only the region touching the
        domain edge concatenates the small boundary wrap column."""
        n = F.shape[axis]
        s = sl[axis]
        start = 0 if s == slice(None) else (s.start or 0)
        stop = n if s == slice(None) or s.stop is None else s.stop
        if dn:
            if start > 0:
                sl2 = list(sl)
                sl2[axis] = slice(start - 1, stop - 1)
                return _take(F, tuple(sl2))
            col = self._wrap_col(F, Fp, axis, "lo", part)
            oth = list(sl)
            oth[axis] = slice(None)
            col = _take(col, tuple(oth))
            if stop <= 1:
                return col
            rest_sl = list(sl)
            rest_sl[axis] = slice(0, stop - 1)
            return lax.concatenate([col, _take(F, tuple(rest_sl))],
                                   dimension=axis)
        if stop < n:
            sl2 = list(sl)
            sl2[axis] = slice(start + 1, stop + 1)
            return _take(F, tuple(sl2))
        col = self._wrap_col(F, Fp, axis, "hi", part)
        oth = list(sl)
        oth[axis] = slice(None)
        col = _take(col, tuple(oth))
        if start >= n - 1:
            return col
        rest_sl = list(sl)
        rest_sl[axis] = slice(start + 1, n)
        return lax.concatenate([_take(F, tuple(rest_sl)), col],
                               dimension=axis)

    def _slab_slices(self, axis: int, side: str, width: int):
        """Interior-coordinate slices selecting a PML slab along axis."""
        sl = [slice(None)] * 3
        n = self.shape[axis]
        sl[axis] = slice(0, width) if side == "lo" else slice(n - width, n)
        return tuple(sl)

    # ------------------------------------------------------------------ #
    # the step
    # ------------------------------------------------------------------ #

    @staticmethod
    def _region_ranges(n: int, w_lo: int, w_hi: int):
        """[(start, stop, kind)] partition of [0, n): lo-slab / mid / hi-slab."""
        regions = []
        if w_lo:
            regions.append((0, w_lo, "lo"))
        if n - w_hi > w_lo:
            regions.append((w_lo, n - w_hi, None))
        if w_hi:
            regions.append((n - w_hi, n, "hi"))
        return regions

    @staticmethod
    def _split_wrap_edge(regions, n: int, dn: bool):
        """Split a 1-wide strip off the wrap edge of non-slab regions so the
        bulk piece reads its shifted operand as a PURE offset slice.

        Only profitable along the LEADING (x) axis, where slicing never
        breaks (sublane, lane) tile alignment — measured +13% there, while
        the same split along y/z is ~20% slower (misaligned tiles)."""
        out = []
        for start, stop, kind in regions:
            if kind is None:
                if dn and start == 0 and stop > 1:
                    out.append((0, 1, None))
                    out.append((1, stop, None))
                    continue
                if not dn and stop == n and n - 1 > start:
                    out.append((start, n - 1, None))
                    out.append((n - 1, n, None))
                    continue
            out.append((start, stop, kind))
        return out

    def _update_field_family(self, step, state, consts, family: str, newE=None,
                             partner_src=None, part: int = 0):
        """One half-step: family 'E' (uses H) or 'H' (uses E^{n+1}).

        CPML handling: the update is assembled as a 3x3 region concat over the
        two derivative axes (j, k) of each component — psi terms appear only
        in the slab pieces, every piece is a pure elementwise expression over
        slices, and the concat is the single output materialization. This
        avoids both full-size psi traffic and scatter (dynamic-update-slice)
        writes, which measure 1.5-3x slower on TPU."""
        plan = self.plan
        is_e = family == "E"
        if self.pallas is not None and partner_src is None:
            src = state["H"] if is_e else newE
            return self.pallas.family_update(family, state, consts, src)
        out_comps = E_COMPS if is_e else H_COMPS
        src_fields = state["H"] if is_e else newE
        coeffs = consts["coeffs_E"] if is_e else consts["coeffs_H"]
        inv = consts["inv_dual"] if is_e else consts["inv_primal"]
        fam = "dual" if is_e else "primal"
        sign_shift = 1.0 if is_e else -1.0  # backward vs forward difference

        new_fields = {}
        new_psi = {}
        Q = state["Q"]
        for i, comp in enumerate(out_comps):
            j, k = (i + 1) % 3, (i + 2) % 3
            other = H_COMPS if is_e else E_COMPS
            Fk = src_fields[other[k]]
            Fj = src_fields[other[j]]
            # partner_src supplies the other real copy for Bloch wrap mixing
            Fk_p = partner_src[other[k]] if partner_src is not None else None
            Fj_p = partner_src[other[j]] if partner_src is not None else None
            ca, cb = coeffs[comp]
            F_old = state[family][comp]

            def d1_of(sl):
                shifted = self._shift_take(Fk, Fk_p, sl, j, is_e, part)
                return sign_shift * (_take(Fk, sl) - shifted) \
                    * _bslice(inv[j], sl)

            def d2_of(sl):
                shifted = self._shift_take(Fj, Fj_p, sl, k, is_e, part)
                return sign_shift * (_take(Fj, sl) - shifted) \
                    * _bslice(inv[k], sl)

            # psi slab updates (full slabs, spanning corners)
            w_lo_j, w_hi_j = self.pml_meta[(fam, j)]
            w_lo_k, w_hi_k = self.pml_meta[(fam, k)]
            pml_j = consts["pml"].get(f"{fam}{j}")
            pml_k = consts["pml"].get(f"{fam}{k}")
            psi1 = {}
            psi2 = {}
            for side, width in (("lo", w_lo_j), ("hi", w_hi_j)):
                key = f"{comp}|{j}|{side}"
                if width and key in state["psi"]:
                    sl = self._slab_slices(j, side, width)
                    psi_new = pml_j[f"b_{side}"] * state["psi"][key] \
                        + pml_j[f"c_{side}"] * d1_of(sl)
                    new_psi[key] = psi_new
                    psi1[side] = (psi_new, sl)
            for side, width in (("lo", w_lo_k), ("hi", w_hi_k)):
                key = f"{comp}|{k}|{side}"
                if width and key in state["psi"]:
                    sl = self._slab_slices(k, side, width)
                    psi_new = pml_k[f"b_{side}"] * state["psi"][key] \
                        + pml_k[f"c_{side}"] * d2_of(sl)
                    new_psi[key] = psi_new
                    psi2[side] = (psi_new, sl)

            # region assembly over (j, k); the wrap edge of non-slab regions
            # is split off so the bulk reads shifted operands as pure slices
            regions_j = self._region_ranges(self.shape[j], w_lo_j if "lo" in psi1
                                            else 0, w_hi_j if "hi" in psi1 else 0)
            regions_k = self._region_ranges(self.shape[k], w_lo_k if "lo" in psi2
                                            else 0, w_hi_k if "hi" in psi2 else 0)
            # split the wrap-edge strip along the leading axis only (free
            # there; measured slower on y/z where slices break tile alignment)
            if j == 0:
                regions_j = self._split_wrap_edge(regions_j, self.shape[0], is_e)
            if k == 0:
                regions_k = self._split_wrap_edge(regions_k, self.shape[0], is_e)
            wall = consts["wall_masks"].get(comp, ()) if is_e else ()

            def piece(rj, rk):
                sl = [slice(None)] * 3
                if not (rj[0] == 0 and rj[1] == self.shape[j]):
                    sl[j] = slice(rj[0], rj[1])
                if not (rk[0] == 0 and rk[1] == self.shape[k]):
                    sl[k] = slice(rk[0], rk[1])
                sl = tuple(sl)
                rhs = d1_of(sl) - d2_of(sl)
                if rj[2] is not None:
                    psi_new, slab_sl = psi1[rj[2]]
                    psi_piece_sl = [slice(None)] * 3
                    psi_piece_sl[j] = slice(rj[0] - slab_sl[j].start,
                                            rj[1] - slab_sl[j].start)
                    psi_piece_sl[k] = sl[k]
                    rhs = rhs + psi_new[tuple(psi_piece_sl)]
                if rk[2] is not None:
                    psi_new, slab_sl = psi2[rk[2]]
                    psi_piece_sl = [slice(None)] * 3
                    psi_piece_sl[k] = slice(rk[0] - slab_sl[k].start,
                                            rk[1] - slab_sl[k].start)
                    psi_piece_sl[j] = sl[j]
                    rhs = rhs - psi_new[tuple(psi_piece_sl)]
                if is_e:
                    for (A, Gc), Qp in zip(self.pole_scalars, Q):
                        qr, qi = Qp[comp]
                        rhs = rhs - (Gc.real * _take(qr, sl)
                                     - Gc.imag * _take(qi, sl))
                ca_p = _take(ca, sl) if jnp.ndim(ca) else ca
                cb_p = _take(cb, sl) if jnp.ndim(cb) else cb
                if is_e:
                    out = ca_p * _take(F_old, sl) + cb_p * rhs
                    for mask in wall:
                        out = out * _bslice(mask, sl)
                else:
                    out = ca_p * _take(F_old, sl) - cb_p * rhs
                if out.dtype != self.dtype:
                    out = out.astype(self.dtype)
                return out

            if len(regions_j) == 1 and len(regions_k) == 1:
                new_fields[comp] = piece(regions_j[0], regions_k[0])
            else:
                rows = []
                for rj in regions_j:
                    cols = [piece(rj, rk) for rk in regions_k]
                    rows.append(cols[0] if len(cols) == 1
                                else lax.concatenate(cols, dimension=k))
                new_fields[comp] = rows[0] if len(rows) == 1 \
                    else lax.concatenate(rows, dimension=j)
        return new_fields, new_psi

    def _views(self, state):
        """Per-copy views of the field state: one for real runs, two (re, im)
        for complex Bloch runs."""
        views = [{"E": state["E"], "H": state["H"], "psi": state["psi"],
                  "Q": state["Q"]}]
        if self.is_complex:
            views.append({"E": state["E1"], "H": state["H1"],
                          "psi": state["psi1"], "Q": state["Q1"]})
        return views

    def _source_deltas(self, family: str, consts, step, part: int):
        """[(source_plan, delta_array)] of current-source contributions to the
        given family's freshly updated fields (delta = -c_b J or -d_b M)."""
        comps = E_COMPS if family == "E" else H_COMPS
        coeffs = consts["coeffs_E"] if family == "E" else consts["coeffs_H"]
        out = []
        for si, sp in enumerate(self.plan.sources):
            if sp.comp not in comps:
                continue
            wf_key = sp.waveform_key if part == 0 else sp.waveform_key_im
            if wf_key is None:
                continue
            _, cb = coeffs[sp.comp]
            cb_sl = cb[sp.slices] if jnp.ndim(cb) else cb
            wf = consts["waveforms"][wf_key, step]
            out.append((sp, -cb_sl * consts["src_profiles"][si] * wf))
        return out

    def _update_poles(self, nE, view, consts):
        """Semi-implicit pole-residue auxiliary-current state update.

        Uniform-support poles couple through a shared f32 indicator mask
        times a static complex B0; the masked E sums are memoized per
        (mask, comp) so the 7 poles of a library metal share 3 mask
        multiplies instead of reading 42 dense residue maps."""
        nQ = []
        cache = {}
        for pi, ((A, Gc), metas, Qp) in enumerate(zip(
                self.pole_scalars, self.pole_B_meta, view["Q"])):
            newQp = {}
            for ci, comp in enumerate(E_COMPS):
                qr, qi = Qp[comp]
                nqr = A.real * qr - A.imag * qi
                nqi = A.imag * qr + A.real * qi
                m = metas[ci]
                if m["kind"] != "zero":
                    ekey = ("e", ci)
                    if ekey not in cache:
                        cache[ekey] = nE[comp] + self._int(view["E"][comp])
                    esum = cache[ekey]
                    if m["kind"] == "mask":
                        mkey = (m["mask_id"], ci)
                        if mkey not in cache:
                            cache[mkey] = \
                                consts["pole_masks"][m["mask_id"]] * esum
                        mes = cache[mkey]
                        B0r, B0i = m["B0"]
                        if B0r:
                            nqr = nqr + B0r * mes
                        if B0i:
                            nqi = nqi + B0i * mes
                    else:
                        br, bi = consts["pole_B_dense"][f"{pi}_{ci}"]
                        nqr = nqr + br * esum
                        nqi = nqi + bi * esum
                newQp[comp] = (nqr, nqi)
            nQ.append(newQp)
        return nQ

    def _accumulate_monitors(self, step, newE, newH, state, consts):
        """Running-DFT / time-sample monitor accumulation on the fresh fields
        (newE/newH are per-copy lists: one entry, or two for Bloch runs)."""
        import os as _os
        if _os.environ.get("TIDY3D_TPU_SKIP_MON"):  # profiling knob
            return state["mon"]
        cx = self.is_complex
        new_mon = []
        for mi, (mp, acc) in enumerate(zip(self.plan.monitors, state["mon"])):
            key = str(mi)
            if mp.kind == "field" and key in consts["dft"]:
                cos_e, sin_e, cos_h, sin_h = consts["dft"][key]
                ph = {
                    "E": (lax.dynamic_index_in_dim(cos_e, step, 0,
                                                   keepdims=False),
                          lax.dynamic_index_in_dim(sin_e, step, 0,
                                                   keepdims=False)),
                    "H": (lax.dynamic_index_in_dim(cos_h, step, 0,
                                                   keepdims=False),
                          lax.dynamic_index_in_dim(sin_h, step, 0,
                                                   keepdims=False)),
                }
                new_acc = {}
                for comp in mp.comps:
                    is_e_comp = comp in E_COMPS
                    ints = newE[0] if is_e_comp else newH[0]
                    vals = ints[comp][self._mon_slices(mp, comp)][..., None]
                    cos_t, sin_t = ph[comp[0]]
                    acc_re, acc_im = acc[comp]
                    new_re = acc_re + vals * cos_t
                    new_im = acc_im + vals * sin_t
                    if cx:
                        # (v0 + i v1) e^{i w t}: the imaginary copy rotates
                        # into both quadratures
                        ints1 = newE[1] if is_e_comp else newH[1]
                        vals1 = ints1[comp][mp.slices[comp]][..., None]
                        new_re = new_re - vals1 * sin_t
                        new_im = new_im + vals1 * cos_t
                    new_acc[comp] = (new_re, new_im)
                new_mon.append(new_acc)
            elif mp.kind == "field_time":
                in_window = jnp.logical_and(
                    step >= mp.t_start,
                    jnp.logical_and(step < mp.t_stop,
                                    (step - mp.t_start) % mp.t_interval == 0))
                sample_idx = jnp.maximum(
                    (step - mp.t_start) // mp.t_interval, 0)
                new_acc = {}
                for comp in mp.comps:
                    ints = newE[0] if comp in E_COMPS else newH[0]
                    vals = ints[comp][self._mon_slices(mp, comp)]
                    cur = acc[comp]
                    idx = jnp.where(in_window, sample_idx, 0)
                    updated = lax.dynamic_update_index_in_dim(
                        cur, vals.astype(cur.dtype), idx, 0)
                    new_acc[comp] = jnp.where(in_window, updated, cur)
                new_mon.append(new_acc)
            else:
                new_mon.append(acc)
        return new_mon

    # ------------------------------------------------------------------ #
    # fused-kernel step: one pallas pass + slab/slice delta corrections
    # ------------------------------------------------------------------ #

    def _sl_range(self, sl, axis):
        n = self.shape[axis]
        s = sl[axis]
        if s == slice(None):
            return 0, n
        return (s.start or 0), (n if s.stop is None else s.stop)

    def _fwd_delta_regions(self, delta, sl, axis, inv):
        """Regions and values of the FORWARD-difference delta d(r) =
        (delta[r+1] - delta[r]) * inv[r] induced along `axis` by a
        compact-support field delta on slices `sl` (zero outside).

        Returns [(region_slices, d_values)] — one main region, plus a wrap
        strip for periodic boundaries when the support touches row 0 but not
        the top."""
        n = self.shape[axis]
        lo, hi = self._sl_range(sl, axis)
        kind_hi = self.plan.boundaries[axis][1]
        periodic = kind_hi not in ("pec", "pmc")
        # next-neighbor values over rows [lo, hi)
        edge_sl = [slice(None)] * 3
        edge_sl[axis] = slice(0, 1)
        if hi == n:
            if kind_hi == "pec":
                edge = jnp.zeros_like(_take(delta, tuple(edge_sl)))
            elif kind_hi == "pmc":
                last_sl = [slice(None)] * 3
                last_sl[axis] = slice(delta.shape[axis] - 1,
                                      delta.shape[axis])
                edge = _take(delta, tuple(last_sl))  # mirror -> d = 0 there
            elif lo == 0:
                edge = _take(delta, tuple(edge_sl))  # wrap to own first row
            else:
                edge = jnp.zeros_like(_take(delta, tuple(edge_sl)))
        else:
            edge = jnp.zeros_like(_take(delta, tuple(edge_sl)))
        shift_sl = [slice(None)] * 3
        shift_sl[axis] = slice(1, delta.shape[axis])
        nxt = lax.concatenate([_take(delta, tuple(shift_sl)), edge],
                              dimension=axis)
        region = list(sl)
        region[axis] = slice(lo, hi)
        d_main = (nxt - delta) * _bslice(inv, tuple(region))
        out = []
        if lo > 0:
            # extra row below: d(lo-1) = delta[lo] * inv[lo-1]
            below = list(sl)
            below[axis] = slice(lo - 1, lo)
            first_sl = [slice(None)] * 3
            first_sl[axis] = slice(0, 1)
            d_below = _take(delta, tuple(first_sl)) \
                * _bslice(inv, tuple(below))
            full = list(sl)
            full[axis] = slice(lo - 1, hi)
            out.append((tuple(full),
                        lax.concatenate([d_below, d_main], dimension=axis)))
        else:
            out.append((tuple(region), d_main))
            if periodic and hi < n:
                # wrap strip: d(n-1) = delta[0] * inv[n-1]
                wrap = list(sl)
                wrap[axis] = slice(n - 1, n)
                first_sl = [slice(None)] * 3
                first_sl[axis] = slice(0, 1)
                out.append((tuple(wrap),
                            _take(delta, tuple(first_sl))
                            * _bslice(inv, tuple(wrap))))
        return out

    def _propagate_E_deltas(self, pieces, newH, new_psi, consts):
        """Linearly propagate E-field deltas (sources, x-psi-E corrections)
        through the H half-step: the forward-curl term everywhere the delta's
        derivative is nonzero, plus the y/z psi-H recursions it grazes."""
        for m, sl, delta in pieces:
            for ih, hcomp in enumerate(H_COMPS):
                j, k = (ih + 1) % 3, (ih + 2) % 3
                if k == m:
                    a, sgn_t = j, +1
                elif j == m:
                    a, sgn_t = k, -1
                else:
                    continue
                inv = consts["inv_primal"][a]
                db = consts["coeffs_H"][hcomp][1]
                for rg, dval in self._fwd_delta_regions(delta, sl, a, inv):
                    db_sl = _take(db, rg) if jnp.ndim(db) else db
                    newH[hcomp] = newH[hcomp].at[rg].add(
                        (-db_sl * sgn_t * dval).astype(newH[hcomp].dtype))
                    if a == 0:
                        # packed x-psi strip (slab-fixup layout): graze it;
                        # otherwise x-psi-H is recomputed from the final newE
                        key = f"{hcomp}|0|packed"
                        if key not in new_psi:
                            continue
                        fm = self.fixup_meta
                        c_pack = consts["pml"]["primal0_packed"][1]
                        r_lo, r_hi = self._sl_range(rg, 0)
                        nx = self.shape[0]
                        w_lo, w_hi = self.pml_meta[("primal", 0)]
                        spans = []
                        if w_lo:
                            spans.append((0, w_lo, 0))  # glob lo, hi, pk off
                        if w_hi:
                            spans.append((nx - w_hi, nx,
                                          fm["R"] - w_hi - (nx - w_hi)))
                        for s_lo, s_hi, off in spans:
                            o_lo, o_hi = max(r_lo, s_lo), min(r_hi, s_hi)
                            if o_lo >= o_hi:
                                continue
                            dv_loc = [slice(None)] * 3
                            dv_loc[0] = slice(o_lo - r_lo, o_hi - r_lo)
                            d_sub = _take(dval, tuple(dv_loc))
                            pk = slice(o_lo + off, o_hi + off)
                            dpsi = c_pack[pk] * d_sub
                            psi_idx = (pk,) + tuple(rg[1:])
                            new_psi[key] = new_psi[key].at[psi_idx].add(
                                dpsi.astype(new_psi[key].dtype))
                            ov = list(rg)
                            ov[0] = slice(o_lo, o_hi)
                            db_ov = _take(db, tuple(ov)) if jnp.ndim(db) \
                                else db
                            newH[hcomp] = newH[hcomp].at[tuple(ov)].add(
                                (-db_ov * sgn_t * dpsi).astype(
                                    newH[hcomp].dtype))
                        continue
                    # y/z psi-H slabs grazed by this delta derivative
                    w_lo, w_hi = self.pml_meta[("primal", a)]
                    pml_c = consts["pml"].get(f"primal{a}")
                    r_lo, r_hi = self._sl_range(rg, a)
                    n_a = self.shape[a]
                    for side, width in (("lo", w_lo), ("hi", w_hi)):
                        key = f"{hcomp}|{a}|{side}"
                        if width == 0 or key not in new_psi:
                            continue
                        s_lo = 0 if side == "lo" else n_a - width
                        s_hi = width if side == "lo" else n_a
                        o_lo, o_hi = max(r_lo, s_lo), min(r_hi, s_hi)
                        if o_lo >= o_hi:
                            continue
                        # overlap in region-local / slab-local coordinates
                        dv_loc = [slice(None)] * 3
                        dv_loc[a] = slice(o_lo - r_lo, o_hi - r_lo)
                        d_sub = _take(dval, tuple(dv_loc))
                        c_vec = pml_c[f"c_{side}"]
                        c_loc = [slice(None)] * 3
                        c_loc[a] = slice(o_lo - s_lo, o_hi - s_lo)
                        c_sub = _bslice(c_vec, tuple(c_loc))
                        dpsi = c_sub * d_sub
                        # update the stored psi (z slabs are transposed)
                        psi_idx = list(rg)
                        psi_idx[a] = slice(o_lo - s_lo, o_hi - s_lo)
                        if a == 2:
                            dpsi_st = jnp.transpose(dpsi, (0, 2, 1))
                            psi_tr = (psi_idx[0], psi_idx[2], psi_idx[1])
                            new_psi[key] = new_psi[key].at[psi_tr].add(
                                dpsi_st.astype(new_psi[key].dtype))
                        else:
                            new_psi[key] = new_psi[key].at[
                                tuple(psi_idx)].add(
                                dpsi.astype(new_psi[key].dtype))
                        # and its contribution to newH in the overlap
                        ov = list(rg)
                        ov[a] = slice(o_lo, o_hi)
                        db_ov = _take(db, tuple(ov)) if jnp.ndim(db) else db
                        newH[hcomp] = newH[hcomp].at[tuple(ov)].add(
                            (-db_ov * sgn_t * dpsi).astype(
                                newH[hcomp].dtype))
        return newH, new_psi

    def _step_group(self, gi, state, consts, accumulate=True):
        """k steps in one temporal-blocked kernel call (group index gi);
        monitors accumulate on the group-end fields (the DFT tables are
        strided so sampled steps land exactly there) — only when
        ``accumulate`` (the _mon_group_stride hoisting skips the calls at
        groups that cannot carry a sample). Outputs land in the
        ping-pong buffer set (state["alt"]) via pallas aliasing; the
        returned state swaps the sets."""
        k = self.kstep.k
        t0 = gi * k
        view = {"E": state["E"], "H": state["H"], "psi": state["psi"],
                "Q": state.get("Qpk")}
        alt = state.get("alt")
        if alt is not None:
            alt = dict(alt, Q=alt.get("Qpk"))
        newE, newH, newQ, new_psi = self.kstep.step_group(
            t0, view, consts, alt=alt)
        if accumulate:
            # monitors slice lazy per-component views of the packed arrays
            # (XLA materializes only the monitor regions); shard mode strips
            # the halo blocks so views are in local-core rows
            if self.kstep.shard is not None:
                bxk, nxl = self.kstep.bx, self.kstep.shape[0]
                newE_c = newE[bxk:bxk + nxl]
                newH_c = newH[bxk:bxk + nxl]
            else:
                newE_c, newH_c = newE, newH
            newE_l = [{c: newE_c[:, ci] for ci, c in enumerate(E_COMPS)}]
            newH_l = [{c: newH_c[:, ci] for ci, c in enumerate(H_COMPS)}]
            if self.is_complex:
                # Bloch runs: imaginary copy packed as channels 3-5
                newE_l.append({c: newE_c[:, 3 + ci]
                               for ci, c in enumerate(E_COMPS)})
                newH_l.append({c: newH_c[:, 3 + ci]
                               for ci, c in enumerate(H_COMPS)})
            new_mon = self._accumulate_monitors(
                t0 + k - 1, newE_l, newH_l, state, consts)
        else:
            new_mon = state["mon"]
        out = {"E": newE, "H": newH, "psi": new_psi, "Q": state["Q"],
               "mon": new_mon}
        if "Qpk" in state:
            out["Qpk"] = newQ
        if "alt" in state:
            # chain the EXCHANGED buffers (kstep._last_view) as the next
            # alt in shard mode: chaining the pre-exchange state keeps it
            # live and forces XLA to copy the full arrays at every halo
            # update (see PallasKStepper.step_group)
            lv = getattr(self.kstep, "_last_view", None) or view
            out["alt"] = {"E": lv["E"], "H": lv["H"], "psi": lv["psi"]}
            if "Qpk" in state:
                out["alt"]["Qpk"] = lv.get("Q", state["Qpk"])
        return self._cast_state(out)

    def _run_chunk(self, start, chunk_size, st, consts):
        """Advance `chunk_size` steps from global step `start` (the chunk
        size is a multiple of k when the k-step kernel is active)."""
        if self.kstep is not None:
            k = self.kstep.k
            # monitor-stride hoisting: accumulate only at groups with
            # (g+1) % B == 0 (every sampled step lands there by
            # construction of B in _build_dft_tables). The loop body
            # advances gpi groups — an EVEN multiple of B, so (a) each
            # iteration ends exactly after an accumulating group and
            # (b) the ping-pong buffer sets return to their carry slots.
            B = getattr(self, "_mon_group_stride", 1)
            gpi = B if B % 2 == 0 else 2 * B

            def gbody(g, s):
                for j in range(gpi):
                    s = self._step_group(start // k + gpi * g + j, s,
                                         consts, accumulate=(j + 1) % B == 0)
                return s

            # _align_chunk rounds the chunk to k*gpi, so chunks hold a
            # whole number of iterations and the chunk-local group phase
            # equals the global phase mod B
            st = lax.fori_loop(0, chunk_size // k // gpi, gbody, st)
            return st

        def body(n, s):
            return self._step(start + n, s, consts)

        return lax.fori_loop(0, chunk_size, body, st)

    def _step_fused(self, step, state, consts):
        """One time step on the fused Pallas kernel + XLA corrections."""
        view = self._views(state)[0]
        newE, newH, psi_k = self.fused.step_update(view, consts)
        new_psi = dict(state["psi"])
        new_psi.update(psi_k)

        if self.fused.fixup_ok:
            # x-axis CPML entirely inside the slab-fixup pallas kernel
            newE, newH, new_psi = self.fused.x_fixup(
                newE, newH, new_psi, view, consts)
            pieces = []
            for sp, add in self._source_deltas("E", consts, step, 0):
                pieces.append((E_COMPS.index(sp.comp), sp.slices, add))
            for m, sl, delta in pieces:
                comp = E_COMPS[m]
                newE[comp] = newE[comp].at[sl].add(
                    delta.astype(newE[comp].dtype))
            newH, new_psi = self._propagate_E_deltas(pieces, newH, new_psi,
                                                     consts)
            for sp, add in self._source_deltas("H", consts, step, 0):
                newH[sp.comp] = newH[sp.comp].at[sp.slices].add(
                    add.astype(newH[sp.comp].dtype))
            nQ = self._update_poles(newE, view, consts)
            new_mon = self._accumulate_monitors(step, [newE], [newH], state,
                                                consts)
            out = {"E": newE, "H": newH, "psi": new_psi, "Q": nQ,
                   "mon": new_mon}
            return self._cast_state(out)

        # ----- E-side deltas: current sources + x-axis psi-E ----- #
        pieces = []
        for sp, add in self._source_deltas("E", consts, step, 0):
            pieces.append((E_COMPS.index(sp.comp), sp.slices, add))
        pml_xe = consts["pml"].get("dual0")
        w_lo, w_hi = self.pml_meta[("dual", 0)]
        if pml_xe is not None and (w_lo or w_hi):
            for ci, comp in enumerate(E_COMPS):
                j, k = (ci + 1) % 3, (ci + 2) % 3
                for axis, sgn, src_c in ((j, +1, H_COMPS[k]),
                                         (k, -1, H_COMPS[j])):
                    if axis != 0:
                        continue
                    for side, width in (("lo", w_lo), ("hi", w_hi)):
                        key = f"{comp}|0|{side}"
                        if width == 0 or key not in state["psi"]:
                            continue
                        sl = self._slab_slices(0, side, width)
                        F = state["H"][src_c]
                        shifted = self._shift_take(F, None, sl, 0, True, 0)
                        d = (_take(F, sl) - shifted) \
                            * _bslice(consts["inv_dual"][0], sl)
                        psi_new = pml_xe[f"b_{side}"] * state["psi"][key] \
                            + pml_xe[f"c_{side}"] * d
                        new_psi[key] = psi_new
                        cb = consts["coeffs_E"][comp][1]
                        cb_sl = _take(cb, sl) if jnp.ndim(cb) else cb
                        delta = sgn * cb_sl * psi_new
                        for mask in consts["wall_masks"].get(comp, ()):
                            delta = delta * _bslice(mask, sl)
                        pieces.append((ci, sl, delta))
        for m, sl, delta in pieces:
            comp = E_COMPS[m]
            newE[comp] = newE[comp].at[sl].add(delta.astype(newE[comp].dtype))

        # ----- propagate the deltas through the H half-step ----- #
        newH, new_psi = self._propagate_E_deltas(pieces, newH, new_psi,
                                                 consts)

        # ----- x-axis psi-H from the final newE ----- #
        pml_xh = consts["pml"].get("primal0")
        w_lo, w_hi = self.pml_meta[("primal", 0)]
        if pml_xh is not None and (w_lo or w_hi):
            for ci, comp in enumerate(H_COMPS):
                j, k = (ci + 1) % 3, (ci + 2) % 3
                for axis, sgn, src_c in ((j, +1, E_COMPS[k]),
                                         (k, -1, E_COMPS[j])):
                    if axis != 0:
                        continue
                    for side, width in (("lo", w_lo), ("hi", w_hi)):
                        key = f"{comp}|0|{side}"
                        if width == 0 or key not in state["psi"]:
                            continue
                        sl = self._slab_slices(0, side, width)
                        F = newE[src_c]
                        shifted = self._shift_take(F, None, sl, 0, False, 0)
                        d = -(_take(F, sl) - shifted) \
                            * _bslice(consts["inv_primal"][0], sl)
                        psi_new = pml_xh[f"b_{side}"] * state["psi"][key] \
                            + pml_xh[f"c_{side}"] * d
                        new_psi[key] = psi_new
                        db = consts["coeffs_H"][comp][1]
                        db_sl = _take(db, sl) if jnp.ndim(db) else db
                        newH[comp] = newH[comp].at[sl].add(
                            (-db_sl * sgn * psi_new).astype(
                                newH[comp].dtype))

        # ----- magnetic current sources ----- #
        for sp, add in self._source_deltas("H", consts, step, 0):
            newH[sp.comp] = newH[sp.comp].at[sp.slices].add(
                add.astype(newH[sp.comp].dtype))

        nQ = self._update_poles(newE, view, consts)
        new_mon = self._accumulate_monitors(step, [newE], [newH], state,
                                            consts)
        out = {"E": newE, "H": newH, "psi": new_psi, "Q": nQ,
               "mon": new_mon}
        return self._cast_state(out)

    def _step(self, step, state, consts):
        plan = self.plan
        cx = self.is_complex
        if self.fused is not None and not cx:
            return self._step_fused(step, state, consts)
        views = self._views(state)

        # ---------------- E update (per copy) ---------------- #
        newE, psi_E, newQ = [], [], []
        for p, view in enumerate(views):
            partner = views[1 - p]["H"] if cx else None
            nE, pE = self._update_field_family(step, view, consts, "E",
                                               partner_src=partner, part=p)
            # source injection into E (J terms) on interior intermediates
            for sp, add in self._source_deltas("E", consts, step, p):
                nE[sp.comp] = nE[sp.comp].at[sp.slices].add(
                    add.astype(nE[sp.comp].dtype))

            # time-modulated eps/sigma: semi-implicit linear solve (same real
            # coefficients for both Bloch copies)
            if "mod" in consts:
                for ce in consts["mod"]:
                    for comp in E_COMPS:
                        num = jnp.zeros(())
                        den = jnp.zeros(())
                        has = False
                        if "Beps" in ce and comp in ce["Beps"]:
                            b1, b2 = ce["Beps"][comp]
                            c_n = lax.dynamic_index_in_dim(
                                ce["eps_c"], step, 0, keepdims=False)
                            s_n = lax.dynamic_index_in_dim(
                                ce["eps_s"], step, 0, keepdims=False)
                            c_n1 = lax.dynamic_index_in_dim(
                                ce["eps_c"], step + 1, 0, keepdims=False)
                            s_n1 = lax.dynamic_index_in_dim(
                                ce["eps_s"], step + 1, 0, keepdims=False)
                            num = num + (b1 * c_n + b2 * s_n)
                            den = den + (b1 * c_n1 + b2 * s_n1)
                            has = True
                        if "Bsig" in ce and comp in ce["Bsig"]:
                            b1, b2 = ce["Bsig"][comp]
                            c_h = lax.dynamic_index_in_dim(
                                ce["sig_c"], step, 0, keepdims=False)
                            s_h = lax.dynamic_index_in_dim(
                                ce["sig_s"], step, 0, keepdims=False)
                            s_term = b1 * c_h + b2 * s_h
                            num = num - s_term
                            den = den + s_term
                            has = True
                        if not has:
                            continue
                        nE[comp] = (nE[comp] + num * view["E"][comp]) \
                            / (1.0 + den)

            # nonlinear fixed-point iteration (chi3 / Kerr / TPA)
            if "nl" in consts and not cx:
                nl = consts["nl"]
                for comp in E_COMPS:
                    B = nl["B"].get(comp)
                    K = nl["K"].get(comp)
                    if B is None and K is None:
                        continue
                    e_old = view["E"][comp]
                    e_lin = nE[comp]
                    e_it = e_lin
                    e_old3 = e_old * e_old * e_old
                    for _ in range(self.nl_num_iters):
                        e_new = e_lin
                        if B is not None:
                            e_new = e_new - B * (e_it * e_it * e_it - e_old3)
                        if K is not None:
                            e_mid = 0.5 * (e_old + e_it)
                            e_new = e_new - K * (e_mid * e_mid * e_mid)
                        e_it = e_new
                    nE[comp] = e_it

            # dispersive Q update (needs E^{n+1} + E^n on the interior)
            nQ = self._update_poles(nE, view, consts)
            newE.append(nE)
            psi_E.append(pE)
            newQ.append(nQ)

        # ---------------- H update (per copy) ---------------- #
        newH, psi_H = [], []
        for p, view in enumerate(views):
            partner = newE[1 - p] if cx else None
            nH, pH = self._update_field_family(step, view, consts, "H",
                                               newE=newE[p],
                                               partner_src=partner, part=p)
            for sp, add in self._source_deltas("H", consts, step, p):
                nH[sp.comp] = nH[sp.comp].at[sp.slices].add(
                    add.astype(nH[sp.comp].dtype))
            newH.append(nH)
            psi_H.append(pH)

        # ---------------- monitors ---------------- #
        new_mon = self._accumulate_monitors(step, newE, newH, state, consts)

        new_psi = dict(state["psi"])
        new_psi.update(psi_E[0])
        new_psi.update(psi_H[0])
        out = {"E": newE[0], "H": newH[0], "psi": new_psi, "Q": newQ[0],
               "mon": new_mon}
        if cx:
            new_psi1 = dict(state["psi1"])
            new_psi1.update(psi_E[1])
            new_psi1.update(psi_H[1])
            out.update({"E1": newE[1], "H1": newH[1], "psi1": new_psi1,
                        "Q1": newQ[1]})
        return self._cast_state(out)

    def _cast_state(self, out: dict) -> dict:
        """Cast the loop-carry back to the storage dtype (bf16 runs):
        post-update ops (sources, nonlinear, modulation, psi recursions)
        promote to f32."""
        if self.dtype == jnp.float32:
            return out

        def _cast(x):
            return x.astype(self.dtype) \
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x

        for key in ("E", "H", "E1", "H1", "Qpk"):
            if key in out:
                out[key] = _cast(out[key]) if not isinstance(out[key], dict) \
                    else {c: _cast(v) for c, v in out[key].items()}
        for key in ("psi", "psi1"):
            if key in out:
                out[key] = {c: _cast(v) for c, v in out[key].items()}
        for key in ("Q", "Q1"):
            if key in out:
                out[key] = [{c: (_cast(a), _cast(b))
                             for c, (a, b) in qp.items()}
                            for qp in out[key]]
        return out

    # ------------------------------------------------------------------ #
    # run
    # ------------------------------------------------------------------ #

    def _align_chunk(self, chunk_size: int) -> int:
        """Round the chunk size up to a whole number of k-step loop
        iterations (k * gpi steps: gpi groups per iteration keeps the
        monitor-stride phase and the ping-pong buffer parity)."""
        if self.kstep is not None:
            k = self.kstep.k
            B = getattr(self, "_mon_group_stride", 1)
            gpi = B if B % 2 == 0 else 2 * B
            chunk_size = -(-chunk_size // (k * gpi)) * (k * gpi)
        return chunk_size

    def _max_field(self, state):
        if not isinstance(state["E"], dict):
            # kstep path: component-packed array
            return jnp.max(jnp.abs(state["E"])).astype(jnp.float32)
        max_e = jnp.zeros((), jnp.float32)
        for comp in E_COMPS:
            max_e = jnp.maximum(max_e, jnp.max(jnp.abs(state["E"][comp]))
                                .astype(jnp.float32))
            if self.is_complex:
                max_e = jnp.maximum(max_e, jnp.max(jnp.abs(state["E1"][comp]))
                                    .astype(jnp.float32))
        return max_e

    def _make_chunk_fn(self, chunk_size: int):
        def chunk(state, consts, start):
            state = self._run_chunk(start, chunk_size, state, consts)
            return state, self._max_field(state)
        return jax.jit(chunk, donate_argnums=(0,))

    def _make_run_fn(self, chunk_size: int, num_chunks: int):
        shutoff = float(self.plan.simulation.shutoff or 0.0)

        def run_all(consts):
            state = self.init_state()

            def cond(carry):
                ci, st, max_ever, cur = carry
                not_done = ci < num_chunks
                decayed = jnp.logical_and(
                    jnp.logical_and(shutoff > 0, ci >= SHUTOFF_MIN_CHUNKS),
                    cur < shutoff * max_ever)
                return jnp.logical_and(not_done, jnp.logical_not(decayed))

            def body(carry):
                ci, st, max_ever, cur = carry
                start = ci * chunk_size
                st = self._run_chunk(start, chunk_size, st, consts)
                cur = self._max_field(st)
                max_ever = jnp.maximum(max_ever, cur)
                return (ci + 1, st, max_ever, cur)

            carry = (jnp.zeros((), jnp.int32), state, jnp.zeros((), jnp.float32),
                     jnp.zeros((), jnp.float32))
            ci, state, max_ever, cur = lax.while_loop(cond, body, carry)
            stats = jnp.stack([ci.astype(jnp.float32), max_ever, cur])
            mon_out = []
            for acc in state["mon"]:
                packed = {}
                for comp, arr in acc.items():
                    if isinstance(arr, tuple):
                        packed[comp] = jnp.stack([arr[0], arr[1]])
                    else:
                        packed[comp] = arr
                mon_out.append(packed)
            return mon_out, stats

        return jax.jit(run_all)

    def _make_run_fn_sharded(self, chunk_size: int, num_chunks: int):
        """Sharded k-step run: the whole chunk loop lives inside one
        shard_map over the x mesh axis — fields/psi stay shard-local,
        halos ride lax.ppermute per group (inside step_group), monitor
        DFTs accumulate per shard with zero communication, and the
        shutoff test uses lax.pmax. This is the fast-kernel answer to
        SURVEY §2.2 P1 (the round-1 GSPMD path dropped to the XLA
        kernels; PARITY 'known gaps')."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.sharding.mesh
        shutoff = float(self.plan.simulation.shutoff or 0.0)
        skeys = set(self.kstep.sharded_keys)

        def run_all(crepl, csh):
            kc = dict(crepl["kstep"])
            for key, v in csh.items():
                kc[key] = v[0]
            consts = dict(crepl)
            consts["kstep"] = kc
            state = self.init_state()

            def cond(carry):
                ci, st, max_ever, cur = carry
                not_done = ci < num_chunks
                decayed = jnp.logical_and(
                    jnp.logical_and(shutoff > 0, ci >= SHUTOFF_MIN_CHUNKS),
                    cur < shutoff * max_ever)
                return jnp.logical_and(not_done, jnp.logical_not(decayed))

            def body(carry):
                ci, st, max_ever, cur = carry
                start = ci * chunk_size
                st = self._run_chunk(start, chunk_size, st, consts)
                cur = lax.pmax(self._max_field(st), "gx")
                max_ever = jnp.maximum(max_ever, cur)
                return (ci + 1, st, max_ever, cur)

            carry = (jnp.zeros((), jnp.int32), state,
                     jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
            ci, state, max_ever, cur = lax.while_loop(cond, body, carry)
            stats = jnp.stack([ci.astype(jnp.float32), max_ever, cur])
            mon_out = []
            for acc in state["mon"]:
                packed = {}
                for comp, arr in acc.items():
                    packed[comp] = jnp.stack([arr[0], arr[1]]) \
                        if isinstance(arr, tuple) else arr
                mon_out.append(packed)
            return mon_out, stats

        # per-monitor out specs: accumulators carry the local x range on
        # dim 1 (after the re/im or time-sample stack)
        mon_specs = []
        for mi, mp in enumerate(self.plan.monitors):
            if mp.kind == "field" and str(mi) in self.consts["dft"]:
                mon_specs.append({c: P(None, "gx") for c in mp.comps})
            elif mp.kind == "field_time":
                mon_specs.append({c: P(None, "gx") for c in mp.comps})
            else:
                mon_specs.append({})

        def spec_tree(tree, spec):
            return jax.tree_util.tree_map(lambda _: spec, tree)

        crepl0, csh0 = self.split_consts_sharded(self.consts)
        fn = shard_map(
            run_all, mesh=mesh,
            in_specs=(spec_tree(crepl0, P()), spec_tree(csh0, P("gx"))),
            out_specs=(mon_specs, P()),
            check_rep=False)
        return jax.jit(fn)

    def split_consts_sharded(self, consts):
        """(replicated, per-shard-stacked) views of the consts pytree for
        the sharded k-step path; prunes XLA-path-only keys (the kernel
        consumes its own kc copies)."""
        skeys = set(self.kstep.sharded_keys)
        kc = {k: v for k, v in consts["kstep"].items() if k not in skeys}
        csh = {k: consts["kstep"][k] for k in skeys}
        crepl = {"kstep": kc, "dft": consts["dft"],
                 "waveforms": consts["waveforms"]}
        return crepl, csh

    def make_differentiable_run(self, num_steps: int = None, checkpoint_chunks:
                                int = None):
        """A reverse-mode-differentiable run function: monitor accumulators as
        a function of the ``consts`` pytree (coefficients included), with the
        time loop as a checkpointed lax.scan (SURVEY §7.6: jax.grad through
        the lowered solver with rematerialization). No early shutoff.

        Returns ``fn(consts) -> (mon_out, final_state)`` — jit/grad-able."""
        num_steps = num_steps or self.num_steps
        chunks = checkpoint_chunks or NUM_CHUNKS
        chunk_size = max(num_steps // chunks, 1)
        num_chunks = (num_steps + chunk_size - 1) // chunk_size
        self._pad_time_tables(num_chunks * chunk_size)

        def run_fn(consts):
            # reverse-mode AD goes through the XLA path (pallas_call has no
            # registered transpose); disable the pallas kernels during tracing
            pallas_saved, self.pallas = self.pallas, None
            fused_saved, self.fused = self.fused, None
            kstep_saved, self.kstep = self.kstep, None
            try:
                state = self.init_state()

                @jax.checkpoint
                def chunk_body(st, ci):
                    start = ci * chunk_size

                    def step_body(n, s):
                        return self._step(start + n, s, consts)

                    st = lax.fori_loop(0, chunk_size, step_body, st)
                    return st, None

                state, _ = lax.scan(chunk_body, state, jnp.arange(num_chunks))
                mon_out = []
                for acc in state["mon"]:
                    packed = {}
                    for comp, arr in acc.items():
                        packed[comp] = jnp.stack([arr[0], arr[1]]) \
                            if isinstance(arr, tuple) else arr
                    mon_out.append(packed)
                return mon_out, state
            finally:
                self.pallas = pallas_saved
                self.fused = fused_saved
                self.kstep = kstep_saved

        return run_fn

    # ------------------------------------------------------------------ #
    # device-state checkpoint / resume
    # ------------------------------------------------------------------ #

    def save_checkpoint(self, path: str, state: dict, chunk_idx: int,
                        max_ever: float):
        """Persist the full solver state (E, H, psi memories, ADE pole
        currents, DFT monitor accumulators) plus loop position atomically.

        The reference has no mid-run checkpointing (SURVEY §5 — its persistence
        is artifact files on S3); for long on-prem TPU runs under preemption
        this is first-class here."""
        import os as _os

        leaves, _ = jax.tree_util.tree_flatten(state)
        arrays = {f"leaf_{i}": np.asarray(jax.device_get(v))
                  for i, v in enumerate(leaves)}
        arrays["__chunk_idx__"] = np.asarray(chunk_idx)
        arrays["__max_ever__"] = np.asarray(max_ever)
        arrays["__grid_shape__"] = np.asarray(self.shape)
        tmp = path + ".tmp.npz"
        np.savez(tmp.removesuffix(".npz"), **arrays)
        _os.replace(tmp, path)

    def load_checkpoint(self, path: str):
        """Restore (state, chunk_idx, max_ever) saved by save_checkpoint.
        The pytree structure is rebuilt from init_state(), so the checkpoint
        must come from an identically configured runner."""
        data = np.load(path)
        if tuple(data["__grid_shape__"]) != tuple(self.shape):
            from ..exceptions import SetupError

            raise SetupError(
                f"Checkpoint at '{path}' was written for grid "
                f"{tuple(data['__grid_shape__'])}, but this run uses "
                f"{tuple(self.shape)} — refusing to resume.")
        template = jax.eval_shape(self.init_state)
        flat, treedef = jax.tree_util.tree_flatten(template)
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        return state, int(data["__chunk_idx__"]), float(data["__max_ever__"])

    def run_checkpointed(self, checkpoint_path: str,
                         checkpoint_every: int = 5,
                         verbose: bool = False) -> dict:
        """Like run(), but dispatches chunk-by-chunk and persists the device
        state every `checkpoint_every` chunks; resumes automatically if
        `checkpoint_path` exists."""
        import os as _os

        plan = self.plan
        num_steps = self.num_steps
        chunk_size = max(num_steps // NUM_CHUNKS, 1)
        chunk_size = self._align_chunk(chunk_size)
        num_chunks = (num_steps + chunk_size - 1) // chunk_size
        self._pad_time_tables(num_chunks * chunk_size)
        chunk_fn = self._make_chunk_fn(chunk_size)
        shutoff = float(plan.simulation.shutoff or 0.0)

        start_time = _time.time()
        consts = jax.device_put(self.consts) if self.sharding is None \
            else self.sharding.put_consts(self.consts)
        if _os.path.exists(checkpoint_path):
            state, ci0, max_ever = self.load_checkpoint(checkpoint_path)
            if verbose:
                log.info(f"resuming from {checkpoint_path} at chunk {ci0}.")
        else:
            state, ci0, max_ever = None, 0, 0.0
        if state is None:
            state = jax.jit(self.init_state)()
        cur = max_ever
        ci = ci0
        while ci < num_chunks:
            state, cur_dev = chunk_fn(state, consts,
                                      jnp.asarray(ci * chunk_size, jnp.int32))
            cur = float(jax.device_get(cur_dev))
            max_ever = max(max_ever, cur)
            ci += 1
            if ci % checkpoint_every == 0 and ci < num_chunks:
                self.save_checkpoint(checkpoint_path, state, ci, max_ever)
            if shutoff > 0 and ci >= SHUTOFF_MIN_CHUNKS \
                    and cur < shutoff * max_ever:
                break
        # a finished run must not hijack the next one with a stale resume
        if _os.path.exists(checkpoint_path):
            _os.remove(checkpoint_path)
        self.wall_time = _time.time() - start_time
        self.steps_run = ci * chunk_size
        self.final_decay = cur / max_ever if max_ever > 0 else 1.0
        if not np.isfinite(cur) or not np.isfinite(max_ever):
            from ..exceptions import DivergenceError

            raise DivergenceError(
                "Simulation diverged: non-finite fields detected "
                f"(after {self.steps_run} steps).")
        out = {}
        for idx, (mp, acc) in enumerate(zip(plan.monitors, state["mon"])):
            mon = {}
            for comp, arr in acc.items():
                if isinstance(arr, tuple):
                    re_ = np.asarray(jax.device_get(arr[0]))
                    im_ = np.asarray(jax.device_get(arr[1]))
                    mon[comp] = re_ + 1j * im_
                else:
                    mon[comp] = np.asarray(jax.device_get(arr))
            out[idx] = mon
        if self._plan_rot:
            from .plan_rotate import unrotate_raw

            out = unrotate_raw(out, self.plan, self._plan_rot)
        self.transfer_time = 0.0
        return out

    def run(self, verbose: bool = False) -> dict:
        """Execute the time loop (single device dispatch); returns raw monitor
        data (numpy) keyed by monitor-plan index."""
        plan = self.plan
        num_steps = self.num_steps
        chunk_size = max(num_steps // NUM_CHUNKS, 1)
        chunk_size = self._align_chunk(chunk_size)
        num_chunks = (num_steps + chunk_size - 1) // chunk_size
        self._pad_time_tables(num_chunks * chunk_size)
        # cache the jitted program: re-running the same plan (benchmarks,
        # repeated notebook runs) must not re-trace/re-compile
        sharded_kstep = self.kstep is not None \
            and self.kstep.shard is not None
        cache_key = (chunk_size, num_chunks)
        fresh_fn = getattr(self, "_run_fn_key", None) != cache_key
        if fresh_fn:
            self._run_fn = self._make_run_fn_sharded(
                chunk_size, num_chunks) if sharded_kstep \
                else self._make_run_fn(chunk_size, num_chunks)
            self._run_fn_key = cache_key
        run_fn = self._run_fn

        # device-put the consts ONCE per runner and keep them resident:
        # coefficient/pole-residue tables can be GBs (packed per-cell
        # arrays), and re-shipping them host->device on every run()
        # dominated wall time (measured through the axon relay: the 384^3
        # half-domain dielectric "ran" at 1.3 Gcell*steps/s at every
        # block config until the per-run transfer was hoisted; 18.7 after)
        if getattr(self, "_consts_dev_kind", None) != sharded_kstep:
            self._consts_dev = None
            self._consts_dev_kind = sharded_kstep
        if sharded_kstep:
            if self._consts_dev is None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                mesh = self.sharding.mesh
                crepl, csh = self.split_consts_sharded(self.consts)
                crepl = jax.tree_util.tree_map(
                    lambda a: jax.device_put(
                        np.asarray(a), NamedSharding(mesh, P())), crepl)
                csh = jax.tree_util.tree_map(
                    lambda a: jax.device_put(
                        np.asarray(a), NamedSharding(mesh, P("gx"))), csh)
                self._consts_dev = (crepl, csh)
        elif self._consts_dev is None:
            self._consts_dev = (self.sharding.put_consts(self.consts),) \
                if self.sharding is not None \
                else (jax.device_put(self.consts),)

        # compile explicitly (AOT) so compile seconds are a first-class
        # metric: Mosaic compilation of a big kstep config can dominate a
        # user's first run (~minutes) and must be visible/attributable
        # (the persistent jax compilation cache makes repeats ~free)
        if fresh_fn:
            t0 = _time.time()
            self._run_fn = run_fn = run_fn.lower(
                *self._consts_dev).compile()
            self.compile_time = _time.time() - t0
        else:
            self.compile_time = getattr(self, "compile_time", 0.0)

        start_time = _time.time()
        mon_out, stats = run_fn(*self._consts_dev)
        stats_np = np.asarray(jax.device_get(stats))
        self.wall_time = _time.time() - start_time
        # actual HBM highwater, recorded so the estimate_device_memory
        # gate can be validated against reality (scripts/mem_check.py
        # asserts estimate/actual within [0.7, 2.0]; an optimistic
        # estimate reintroduces raw OOMs, a pessimistic one refuses
        # runnable sims). Process-lifetime peak: attribute per-case by
        # running one case per process.
        try:
            dstats = jax.devices()[0].memory_stats() or {}
            self.hbm_peak_bytes = int(dstats.get("peak_bytes_in_use", 0))
        except Exception:  # noqa: BLE001 — platform without memory_stats
            self.hbm_peak_bytes = 0

        chunks_run = int(stats_np[0])
        max_ever = float(stats_np[1])
        max_last = float(stats_np[2])
        self.steps_run = chunks_run * chunk_size
        self.final_decay = max_last / max_ever if max_ever > 0 else 1.0
        if not np.isfinite(max_last) or not np.isfinite(max_ever):
            from ..exceptions import DivergenceError

            raise DivergenceError(
                "Simulation diverged: non-finite fields detected "
                f"(after {self.steps_run} steps)."
            )
        if verbose:
            log.info(f"ran {self.steps_run} steps in {self.wall_time:.2f}s; "
                     f"final field decay {self.final_decay:.2e}.")

        out = {}
        for idx, (mp, acc) in enumerate(zip(plan.monitors, mon_out)):
            mon = {}
            for comp, arr in acc.items():
                vals = np.asarray(jax.device_get(arr))
                if getattr(self, "_mon_x_full", False):
                    # sharded accumulators hold the full x range; apply
                    # the monitor's global x slice here
                    vals = vals[:, mp.slices[comp][0]]
                if mp.kind == "field":
                    mon[comp] = vals[0] + 1j * vals[1]
                else:
                    mon[comp] = vals
            out[idx] = mon
        if self._plan_rot:
            from .plan_rotate import unrotate_raw

            out = unrotate_raw(out, self.plan, self._plan_rot)
        self.transfer_time = _time.time() - start_time - self.wall_time
        return out

    def _pad_time_tables(self, padded_steps: int):
        extra = padded_steps - self.consts["waveforms"].shape[1]
        if extra > 0:
            self.consts["waveforms"] = np.pad(
                self.consts["waveforms"], ((0, 0), (0, extra)))
            self.consts["dft"] = {
                k: tuple(np.pad(t, ((0, extra), (0, 0))) for t in tables)
                for k, tables in self.consts["dft"].items()
            }
            if "mod" in self.consts:
                # edge-pad (constant extension) keeps the implicit update
                # well-defined past the physical run
                for ce in self.consts["mod"]:
                    for key in ("eps_c", "eps_s", "sig_c", "sig_s"):
                        if key in ce:
                            ce[key] = np.pad(ce[key], (0, extra), mode="edge")
