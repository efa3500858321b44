"""Matrix-free TPU eigensolver for the 2D Yee waveguide-mode problem.

Replaces ARPACK shift-invert (reference behavior model:
/root/reference/tidy3d/plugins/mode/solver.py:744, which LU-factorizes
``M - sigma I``) with a **Chebyshev-filtered subspace iteration**
(Zhou & Saad 2006 style) that never factorizes anything — the TPU-native
design prescribed by SURVEY.md §3.2:

* The guided modes are the **algebraically largest** eigenvalues of the
  transverse-E operator ``M = -A @ B`` (beta^2 eigenproblem): the discrete
  spectrum is approximately real in ``[-k_t,max^2, (n_max k0)^2]`` and the
  wanted modes sit at the top, so a polynomial filter that damps the
  interval ``[lo, cut]`` and amplifies everything above ``cut`` converges
  to them without any shift-invert solve.
* The device filter runs in **pure float32 real arithmetic** on a REAL
  PROXY operator (real parts of the PML-stretched derivative matrices and
  material diagonals). Two reasons: (a) CPML eigenvalues sit far off the
  real axis and a real-interval polynomial amplifies them ~1e6x faster
  than the guided modes — the proxy has a near-real spectrum with nearly
  identical guided eigenvectors (guided fields barely touch the PML);
  (b) TPUs have no native complex dtype (and this runtime rejects
  complex64 programs outright), while the f32 path is exactly what the
  MXU wants. For lossless no-PML sections the proxy IS the true operator.
* One filter step = eight dense 1D-derivative matmuls (MXU) plus diagonal
  multiplies (VPU), batched over the whole subspace block. Block
  orthonormalization is CholeskyQR2 with the k x k Cholesky on the host —
  the device does only matmuls.
* PEC is handled by **pinning** (hard-zero masks on E DOFs inside/against
  conductors) instead of the CPU path's ``eps = -1e8`` penalty diagonal,
  which would blow the spectral radius up by 1e8 and make polynomial
  filtering hopeless.
* Every outer iteration does a Rayleigh-Ritz against the TRUE complex
  operator (host, sparse float64): Ritz values/residuals drive the
  adaptive filter bounds and convergence. A final block-Krylov refinement
  over span([Q, MQ, M^2 Q]) recovers ARPACK-grade accuracy (including the
  small imaginary parts of n_eff from PML leakage / material loss) from
  the float32 subspace.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Tuple

import numpy as np

from ...log import log

# subspace buffer beyond the requested modes (guards against continuum
# crowding at the filter edge and conjugate-pair splitting)
SUBSPACE_BUFFER = 8
# polynomial degree per filter application
FILTER_DEGREE = 50
# max outer (filter + Rayleigh-Ritz) iterations before falling back
MAX_OUTER = 60
# relative residual target on the wanted Ritz pairs (f32 iteration; the
# float64 refinement then squares down the remaining subspace error)
RESIDUAL_TOL = 2e-4


def make_apply_real(
    dxf: np.ndarray,
    dxb: np.ndarray,
    dyf: np.ndarray,
    dyb: np.ndarray,
    eps_x: np.ndarray,
    eps_y: np.ndarray,
    inv_eps_z: np.ndarray,
    mu_x: np.ndarray,
    mu_y: np.ndarray,
    inv_mu_z: np.ndarray,
    mask_x: np.ndarray,
    mask_y: np.ndarray,
    k0: float,
) -> Callable:
    """Real-proxy action of ``M = Pt (-(A @ B)) Pt`` on an (2, nx, ny, k)
    float32 block (real parts of all operator ingredients).

    The 2D kron-product operators of the CPU path factor exactly into 1D
    dense derivative matrices applied along one grid axis each::

        (Dxf kron Iy) u  ==  einsum('ij,jyk->iyk', dxf, U)
        (Ix kron Dyf) u  ==  einsum('ij,xjk->xik', dyf, U)

    With real ingredients the i-factors of the complex formulation cancel
    pairwise (verified against the sparse blocks A11..B22 of
    ``solver.compute_modes``); the real form is::

        G  = inv_mu_z * (Dxf ey - Dyf ex)
        Hx = Dxb G / k0 + k0 eps_y * ey        (= i * hx)
        Hy = Dyb G / k0 - k0 eps_x * ex        (= i * hy)
        F  = -inv_eps_z * (Dyb Hx - Dxb Hy) / k0
        ex' = Dxf F + k0 mu_y * Hy
        ey' = Dyf F - k0 mu_x * Hx
        M(e) = (-ex', -ey')   (PEC masks applied on input and output)
    """
    import jax.numpy as jnp

    f32 = jnp.float32
    mats64 = dict(
        dxf=np.real(np.asarray(dxf)).astype(np.float64),
        dxb=np.real(np.asarray(dxb)).astype(np.float64),
        dyf=np.real(np.asarray(dyf)).astype(np.float64),
        dyb=np.real(np.asarray(dyb)).astype(np.float64),
    )
    diags64 = {
        name: np.real(np.asarray(a)).astype(np.float64)[..., None]
        for name, a in (("eps_x", eps_x), ("eps_y", eps_y),
                        ("inv_eps_z", inv_eps_z), ("mu_x", mu_x),
                        ("mu_y", mu_y), ("inv_mu_z", inv_mu_z),
                        ("mask_x", mask_x), ("mask_y", mask_y))
    }
    dxf, dxb, dyf, dyb = (jnp.asarray(mats64[n], f32)
                          for n in ("dxf", "dxb", "dyf", "dyb"))
    eps_x, eps_y, inv_eps_z, mu_x, mu_y, inv_mu_z, mask_x, mask_y = (
        jnp.asarray(diags64[n], f32)
        for n in ("eps_x", "eps_y", "inv_eps_z", "mu_x", "mu_y",
                  "inv_mu_z", "mask_x", "mask_y")
    )
    k0_f = f32(k0)

    def dx(mat, u):
        return jnp.einsum("ij,jyk->iyk", mat, u)

    def dy(mat, u):
        return jnp.einsum("ij,xjk->xik", mat, u)

    def apply_m(x):
        ex = x[0] * mask_x
        ey = x[1] * mask_y
        g = inv_mu_z * (dx(dxf, ey) - dy(dyf, ex))
        hx = dx(dxb, g) / k0_f + k0_f * eps_y * ey
        hy = dy(dyb, g) / k0_f - k0_f * eps_x * ex
        f = -inv_eps_z * (dy(dyb, hx) - dx(dxb, hy)) / k0_f
        ex2 = dx(dxf, f) + k0_f * mu_y * hy
        ey2 = dy(dyf, f) - k0_f * mu_x * hx
        return jnp.stack([-ex2 * mask_x, -ey2 * mask_y])

    def apply_np64(x):
        """Trusted host float64 evaluation of the same operator (used to
        validate device results: immune to miscompiled XLA kernels)."""
        c = diags64
        m = mats64

        def ndx(mat, u):
            return np.einsum("ij,jyk->iyk", mat, u)

        def ndy(mat, u):
            return np.einsum("ij,xjk->xik", mat, u)

        ex = x[0] * c["mask_x"]
        ey = x[1] * c["mask_y"]
        g = c["inv_mu_z"] * (ndx(m["dxf"], ey) - ndy(m["dyf"], ex))
        hx = ndx(m["dxb"], g) / k0 + k0 * c["eps_y"] * ey
        hy = ndy(m["dyb"], g) / k0 - k0 * c["eps_x"] * ex
        f = -c["inv_eps_z"] * (ndy(m["dyb"], hx) - ndx(m["dxb"], hy)) / k0
        ex2 = ndx(m["dxf"], f) + k0 * c["mu_y"] * hy
        ey2 = ndy(m["dyf"], f) - k0 * c["mu_x"] * hx
        return np.stack([-ex2 * c["mask_x"], -ey2 * c["mask_y"]])

    apply_m.apply_np64 = apply_np64
    return apply_m


def assemble_real_proxy(dxf, dxb, dyf, dyb, eps_x, eps_y, inv_eps_z,
                        mu_x, mu_y, inv_mu_z, mask_x, mask_y, k0):
    """Sparse float64 matrix of the SAME real-proxy operator as
    :func:`make_apply_real` (flattening: component-major, then x, y
    fastest — matching ``flat()``). Used by the host polish stage: sparse
    f64 block-matvecs are cheap enough to strip the f32 iteration's
    noise-floor contamination, and, being host arithmetic, are immune to
    miscompiled device kernels."""
    import scipy.sparse as sp

    nx, ny = np.asarray(eps_x).shape
    k0 = float(k0)

    def to1d(m):
        return sp.csr_matrix(np.real(np.asarray(m, dtype=complex))
                             .astype(np.float64))

    def d(a):
        return sp.diags(np.real(np.asarray(a, dtype=complex))
                        .astype(np.float64).ravel())

    Ix, Iy = sp.identity(nx), sp.identity(ny)
    DXF = sp.kron(to1d(dxf), Iy).tocsr()
    DXB = sp.kron(to1d(dxb), Iy).tocsr()
    DYF = sp.kron(Ix, to1d(dyf)).tocsr()
    DYB = sp.kron(Ix, to1d(dyb)).tocsr()
    imz, iez = d(inv_mu_z), d(inv_eps_z)
    gx = -imz @ DYF
    gy = imz @ DXF
    hx_x = DXB @ gx / k0
    hx_y = DXB @ gy / k0 + k0 * d(eps_y)
    hy_x = DYB @ gx / k0 - k0 * d(eps_x)
    hy_y = DYB @ gy / k0
    f_x = -iez @ (DYB @ hx_x - DXB @ hy_x) / k0
    f_y = -iez @ (DYB @ hx_y - DXB @ hy_y) / k0
    ex2_x = DXF @ f_x + k0 * d(mu_y) @ hy_x
    ex2_y = DXF @ f_y + k0 * d(mu_y) @ hy_y
    ey2_x = DYF @ f_x - k0 * d(mu_x) @ hx_x
    ey2_y = DYF @ f_y - k0 * d(mu_x) @ hx_y
    m = -sp.bmat([[ex2_x, ex2_y], [ey2_x, ey2_y]])
    p = sp.bmat([[d(mask_x), None], [None, d(mask_y)]])
    return (p @ m @ p).tocsr()


def _ordered_real_eig(hp):
    """Descending-order eigendecomposition of a real near-symmetric
    matrix, returning a REAL basis. The projected operator is only
    near-symmetric (diagonal material scalings break symmetry), so
    clustered continuum columns can produce complex-conjugate eigenpairs;
    naively taking ``eigvecs.real`` DUPLICATES the pair's real part and
    DROPS a direction — the whole basis shifts by one and the top mode is
    lost (observed as order-dependent test flakiness). Conjugate pairs
    contribute their real 2D invariant-plane basis [Re v, Im v] instead.
    """
    theta, s = np.linalg.eig(hp)
    order = np.argsort(-theta.real)
    theta, s = theta[order], s[:, order]
    n = len(theta)
    s_real = np.zeros(s.shape, dtype=np.float64)
    j = 0
    while j < n:
        if theta[j].imag == 0.0:
            s_real[:, j] = s[:, j].real
            j += 1
        elif (j + 1 < n and abs(theta[j + 1] - np.conj(theta[j]))
              <= 1e-8 * max(abs(theta[j]), 1.0)):
            a, b = s[:, j].real, s[:, j].imag
            s_real[:, j] = a / max(np.linalg.norm(a), 1e-300)
            s_real[:, j + 1] = b / max(np.linalg.norm(b), 1e-300)
            j += 2
        else:  # unpaired complex eigenvalue: keep the real part
            s_real[:, j] = s[:, j].real
            j += 1
    return theta.real.copy(), s_real


def _cholqr2_host(v):
    """Column orthonormalization via CholeskyQR2: two gram+triangular-solve
    passes (BLAS3 zherk/ztrsm) instead of LAPACK Householder QR — several
    times faster on slow hosts for tall-skinny blocks, with f64 grams
    reaching ~1e-12 orthogonality after the second pass. Falls back to
    np.linalg.qr if the gram loses positive-definiteness (rank-deficient
    input)."""
    for _ in range(2):
        g = v.conj().T @ v
        g = g + (1e-14 * np.trace(g).real) * np.eye(g.shape[0])
        try:
            el = np.linalg.cholesky(g)
        except np.linalg.LinAlgError:
            q, _ = np.linalg.qr(v)
            return q
        v = np.linalg.solve(el.conj(), v.T).T
    return v


def _extend_orthonormal(w, b):
    """Orthonormal basis of span([w, b]) given orthonormal ``w``: block
    Gram-Schmidt (two projection passes) + CholeskyQR2 of the remainder,
    dropping near-dependent columns. Avoids a tall Householder QR of the
    concatenated block, which is both slow on weak hosts and numerically
    poisoned when ``b`` is nearly inside span(w) (converged eigenpairs:
    M v ~ theta v)."""
    for _ in range(2):
        b = b - w @ (w.conj().T @ b)
    norms = np.linalg.norm(b, axis=0)
    scale = max(float(norms.max()), 1e-300)
    keep = norms > 1e-10 * scale
    if not np.any(keep):
        return w
    b = _cholqr2_host(b[:, keep] / norms[keep])
    return np.concatenate([w, b], axis=1)


def _host_cheb_filter(m, x, lo, cut, lam_amp, degree):
    """Float64 scaled Chebyshev filter (same recurrence as the device
    version) with a scipy sparse operator."""
    e = (cut - lo) / 2.0
    c = (cut + lo) / 2.0
    sigma1 = e / (lam_amp - c)
    xp = x
    y = (m @ x - c * x) * (sigma1 / e)
    sig = sigma1
    for _ in range(degree - 1):
        sig_new = 1.0 / (2.0 / sigma1 - sig)
        yn = (m @ y - c * y) * (2.0 * sig_new / e) - (sig * sig_new) * xp
        xp, y, sig = y, yn, sig_new
    return y


def _chebyshev_filter(apply_m2, x, lo, cut, lam_amp, degree):
    """Scaled Chebyshev filter (Zhou-Saad): damp eigvals in [lo, cut],
    amplify above, normalized so the component at ``lam_amp`` stays O(1)."""
    import jax
    import jax.numpy as jnp

    e = (cut - lo) / 2.0
    c = (cut + lo) / 2.0
    sigma1 = e / (lam_amp - c)
    y = (apply_m2(x) - c * x) * (sigma1 / e)

    def body(_, carry):
        xp, yc, sig = carry
        sig_new = 1.0 / (2.0 / sigma1 - sig)
        yn = (apply_m2(yc) - c * yc) * (2.0 * sig_new / e) - (sig * sig_new) * xp
        return yc, yn, sig_new

    x, y, _ = jax.lax.fori_loop(0, degree - 1, body,
                                (x, y, jnp.asarray(sigma1, x.dtype)))
    return y


def _rational_refine(m_host, sigma, v_start, theta0, num_modes, lam_hi,
                     lam_edge, tol, debug):
    """Refine proxy eigenpairs against the TRUE (PML-stretched / lossy)
    operator with ONE sparse factorization + a few rational block-Krylov
    sweeps.

    The real-proxy subspace cannot represent the complex-stretched PML
    tail of the true eigenvectors (measured: best in-span residual
    saturates at the percent level — the mode amplitude entering the
    PML). The correction requires resolvent directions. One complex LU at
    the user's target shift plus m sweeps V <- (M - sigma)^-1 V gives a
    rational Krylov space over which per-anchor REFINED Ritz extraction
    (residual-minimizing, immune to non-normal RR mixing) converges the
    guided pairs; the device filter's role is the high-quality start that
    cuts the solve count from ARPACK's hundreds (measured 404 s at 316^2)
    to ~tens (LU 54 s + sweeps).
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    n = m_host.shape[0]
    nsel = v_start.shape[1]
    t_lu0 = time.time()
    # place the factorization shift at the centroid of the WANTED proxy
    # Ritz values, not the user's target ((n_target k0)^2, typically at
    # the top of the window): per-sweep contraction of pair theta_j is
    # ~|theta_j - sigma| / |theta_unwanted - sigma|, and the user shift
    # was measured at ~0.8/sweep for the second mode (5 sweeps x ~25 s on
    # slow hosts) vs ~0.1-0.3 from the centroid. The proxy anchors are
    # already accurate to ~1e-2 relative, plenty for shift placement.
    anchors = np.real(np.asarray(theta0[:num_modes], dtype=complex))
    if anchors.size and np.all(np.isfinite(anchors)):
        sigma = complex(np.mean(anchors))
    a_shift = (m_host - sigma * sp.identity(n, dtype=complex,
                                            format="csr")).tocsc()
    # TIDY3D_TPU_MODE_LU64=0 opts into a COMPLEX64 factorization: ~2x
    # faster per factor/solve, but measured at 316^2 it FLOORS the c64
    # Krylov span quality so the sweep loop stalls below tol and runs to
    # its cap (warm end-to-end 78 -> 140 s, max |dneff| 1.0e-5 ->
    # 6.3e-5) — double precision stays the default.
    import os as _os

    _lu64 = _os.environ.get("TIDY3D_TPU_MODE_LU64", "1") == "1"
    lu = spl.splu(a_shift if _lu64 else a_shift.astype(np.complex64))
    if debug:
        print(f"rational refine: LU {time.time() - t_lu0:.1f}s "
              f"(shift {sigma:.4g}, "
              f"{'c128' if _lu64 else 'c64'})")
    scale_floor = 0.05 * abs(float(lam_hi))
    v = v_start
    theta = np.asarray(theta0, dtype=complex).copy()
    vals = np.zeros(nsel, dtype=complex)
    rel = np.full(nsel, np.inf)
    coefs = None
    w_basis = _cholqr2_host(np.asarray(v_start, dtype=complex))
    mw = m_host @ w_basis
    for sweep in range(6):
        t_sw = time.time()
        v_in = np.ascontiguousarray(v)
        if not _lu64:
            v_in = v_in.astype(np.complex64)
        v = lu.solve(v_in).astype(complex)
        v = v / np.maximum(np.linalg.norm(v, axis=0, keepdims=True), 1e-300)
        n_old = w_basis.shape[1]
        w_basis = _extend_orthonormal(w_basis, v)
        if w_basis.shape[1] > n_old:  # M only on the newly-added columns
            mw = np.concatenate(
                [mw, m_host @ w_basis[:, n_old:]], axis=1)
        z = _extend_orthonormal(w_basis, mw)
        zw = z.conj().T @ w_basis
        zmw = z.conj().T @ mw
        coefs = np.zeros((w_basis.shape[1], nsel), dtype=complex)
        for j in range(nsel):
            th = complex(theta[j])
            for _ in range(3):
                _, _, vh = np.linalg.svd(zmw - th * zw,
                                         full_matrices=False)
                coef = vh[-1].conj()
                v_z = zw @ coef
                th = complex((v_z.conj() @ (zmw @ coef))
                             / max(float((v_z.conj() @ v_z).real), 1e-300))
            vals[j] = th
            v_norm = max(float(np.linalg.norm(zw @ coef)), 1e-300)
            rel[j] = (np.linalg.norm(zmw @ coef - th * (zw @ coef))
                      / v_norm / max(abs(th), scale_floor))
            coefs[:, j] = coef
            theta[j] = th
        if debug:
            print(f"rational refine sweep {sweep} ({time.time() - t_sw:.1f}s)"
                  f": vals={np.round(vals, 4)} rel={np.round(rel, 8)}")
        # every pair the caller will RETURN (the first num_modes anchors,
        # descending) converges to full tol — including below-edge leaky
        # pairs, whose n_eff the user still reads; only the extra buffer
        # anchors get the loose gate (their job is just span enrichment)
        tol_j = np.where(np.arange(nsel) < num_modes, tol, 50.0 * tol)
        if np.all(rel < tol_j):
            break
    cand = w_basis @ coefs
    cand /= np.maximum(np.linalg.norm(cand, axis=0, keepdims=True), 1e-300)
    return vals, cand, rel


def chebyshev_eigs(
    apply_real: Callable,
    shape2d: Tuple[int, int],
    num_modes: int,
    lam_hi: float,
    m_host,
    degree: int = FILTER_DEGREE,
    tol: float = RESIDUAL_TOL,
    seed: int = 0,
    lam_edge: float = 0.0,
    m_proxy=None,
    sigma: float = None,
    true_is_real: bool = True,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Top-of-spectrum eigenpairs of the mode operator, matrix-free.

    Parameters
    ----------
    apply_real : real-proxy block operator from :func:`make_apply_real`.
    shape2d : (nx, ny) plane shape.
    num_modes : wanted eigenpair count.
    lam_hi : upper bound of the physical spectrum ((n_max k0)^2).
    m_host : scipy sparse TRUE operator (complex ok) for Rayleigh-Ritz,
        residual control, and the float64 refinement.
    lam_edge : radiation-continuum edge ((n_clad k0)^2). Ritz pairs ABOVE
        the edge are truly guided (isolated eigenvalues) and must converge
        to ``tol``; pairs below it sample the discretized radiation
        continuum, which clusters so densely that driving each column to
        ``tol`` can take unbounded filter work at large planes — they only
        need loose convergence, and the final Rayleigh-Ritz refinement
        against the true operator recovers their values quadratically.

    Returns ``(vals, vecs)`` with vecs (2N, k) numpy complex128, or ``None``
    if the iteration failed to converge (caller falls back to ARPACK).
    """
    import jax
    import jax.numpy as jnp

    nx, ny = shape2d
    n2 = 2 * nx * ny
    # the subspace must (nearly) contain every continuum state above the
    # lowest kept Ritz value, or the below-edge columns keep leaking into
    # un-basised neighbors and their residuals never fall (the radiation
    # continuum densifies with plane size). MXU block-matvec cost is
    # almost flat in column count, so buy invariance with width.
    k_sub = min(num_modes + SUBSPACE_BUFFER + int(0.1 * np.sqrt(n2)),
                64, n2 - 2)

    def flat(xb):  # (2, nx, ny, k) -> (2N, k)
        return xb.reshape(n2, -1)

    def unflat(xm):  # (2N, k) -> (2, nx, ny, k)
        return xm.reshape(2, nx, ny, -1)

    # the filter degree adapts as the cut rises (pass-band shrinks); jit
    # once per degree BUCKET so recompiles stay bounded (each compile
    # costs ~10s over a tunneled TPU)
    _deg_buckets = (50, 74, 120, 200, 320, 500, 600)
    _filt_cache = {}

    def filt(x, lo_, cut_, amp_, deg):
        deg_q = next((b for b in _deg_buckets if b >= deg), _deg_buckets[-1])
        fn = _filt_cache.get(deg_q)
        if fn is None:
            fn = jax.jit(lambda xx, l, c, a: flat(_chebyshev_filter(
                apply_real, unflat(xx), l, c, a, deg_q)))
            _filt_cache[deg_q] = fn
        return fn(x, lo_, cut_, amp_)

    gram = jax.jit(lambda x: x.T @ x)

    @jax.jit
    def rot(x, r_inv):
        return x @ r_inv

    # --- spectral lower bound by power iteration (dominant = most negative)
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (n2, 1), dtype=jnp.float32)

    @jax.jit
    def power_step(v):
        w = flat(apply_real(unflat(v)))
        lam = (v.T @ w)[0, 0]
        return w / jnp.linalg.norm(w), lam

    lam = None
    for _ in range(25):
        v, lam = power_step(v)
    lam_dom = float(np.asarray(lam))
    # SAFE lower bound: eigenvalues below ``lo`` get explosively amplified
    # by the filter (|T_m| blows up on BOTH sides of the interval), so an
    # under-estimate is fatal. The infinity-norm (max abs row sum) bounds
    # the spectral radius and covers the non-normal pseudospectral bulge;
    # the power iterate refines nothing below it but catches a pathological
    # norm bound. Bound the PROXY when available (it is the iterated
    # operator, and m_host may carry the 1e8 PEC penalty diagonal that
    # would blow the interval up 1e8x). Computed from raw data/indptr:
    # scipy's ``m.real`` shares a strided VIEW of the complex data and
    # canonicalization inside ``abs()``/``sum()`` would permute it in
    # place, CORRUPTING m_host (real parts reordered, imaginary parts not).
    m_csr = (m_proxy if m_proxy is not None else m_host).tocsr()
    rows = np.repeat(np.arange(m_csr.shape[0]), np.diff(m_csr.indptr))
    row_sums = np.bincount(rows, weights=np.abs(m_csr.data),
                           minlength=m_csr.shape[0])
    lo_gersh = -float(row_sums.max()) if m_csr.nnz else 0.0
    lo = min(lam_dom * 1.05, lo_gersh, -abs(lam_hi))
    if not np.isfinite(lo):
        return None
    # degree scales with the filter sharpness requirement: amplification per
    # pass goes as exp(2 m sqrt(2 d / span)) with d ~ O(lam_hi) the guided
    # gap and span ~ |lo|
    degree = max(degree, int(3.0 * np.sqrt(abs(lo) / abs(lam_hi))))
    debug = os.environ.get("TIDY3D_TPU_MODE_DEBUG") == "1"
    if debug:
        print(f"mode filter: lo={lo:.3e} (power {lam_dom:.3e}, "
                 f"gershgorin {lo_gersh:.3e}), lam_hi={lam_hi:.3e}, "
                 f"degree={degree}, k_sub={k_sub}")

    def cholqr2(x):
        """Orthonormalize columns: device Gram matmuls + host k x k
        Cholesky (all heavy ops are MXU matmuls; no device factorization)."""
        for _ in range(2):
            g = np.asarray(gram(x), dtype=np.float64)
            g += 1e-10 * np.trace(g) * np.eye(g.shape[0])
            r = np.linalg.cholesky(g).T
            r_inv = np.linalg.inv(r)
            x = rot(x, jnp.asarray(r_inv, jnp.float32))
        return x

    apply_block = jax.jit(lambda q: flat(apply_real(unflat(q))))
    gram2 = jax.jit(lambda a, b: a.T @ b)

    @jax.jit
    def resid_dev(q, wq, s_sel, th):
        """Per-column residual norms of the selected Ritz pairs, computed
        on device — only ``num_modes`` scalars cross the host link instead
        of the two (2N, k_sub) blocks (the dominant wall-time cost over a
        tunneled TPU: ~360 MB/iteration at 316^2)."""
        r = wq @ s_sel - (q @ s_sel) * th
        return jnp.sqrt(jnp.sum(r * r, axis=0))

    # --- filtered subspace iteration with adaptive cut
    k1, _ = jax.random.split(key)
    x = jax.random.normal(k1, (n2, k_sub), dtype=jnp.float32)
    cut = 0.0  # initial: damp everything evanescent (beta^2 < 0)
    lam_amp = float(lam_hi)
    q = None
    theta = s = None
    resid = np.array([np.inf])
    best = np.inf
    stall = 0
    t_loop0 = time.time()
    n_outer = 0
    for _ in range(MAX_OUTER):
        n_outer += 1
        x = filt(x, lo, cut, lam_amp, degree)
        q = cholqr2(x)
        # Rayleigh-Ritz against the DEVICE operator itself: the f32 iterate
        # can only converge in the device operator's own geometry — Ritz
        # values/residuals measured against the exact host operator are
        # polluted by sigma_max(M) * (f32 representation error) and never
        # pass a tight tolerance. The true operator enters in the final
        # float64 block-Krylov refinement below, which also recovers the
        # complex (PML/loss) parts the real proxy cannot carry.
        wq = apply_block(q)
        hp = np.asarray(gram2(q, wq), dtype=np.float64)
        theta, s = _ordered_real_eig(hp)
        resid = np.asarray(resid_dev(
            q, wq, jnp.asarray(s[:, :num_modes], jnp.float32),
            jnp.asarray(theta[:num_modes], jnp.float32)), dtype=np.float64)
        # per-pair relative residual; guided beta^2 ~ lam_hi sets the floor
        scale = np.maximum(np.abs(theta[:num_modes]), 0.05 * abs(float(lam_hi)))
        # strict tolerance only above the continuum edge (guided modes);
        # below-edge columns chase a dense cluster and need only enough
        # accuracy for the final true-operator refinement to lock them in
        guided = theta[:num_modes] > lam_edge
        tol_vec = np.where(guided, tol, 50.0 * tol)
        if debug:
            print(f"mode filter: ritz={np.round(theta[:num_modes], 3)} "
                  f"resid={np.round(resid / scale, 7)} cut={cut:.3e} "
                  f"guided={guided.astype(int)}")
        if np.all(resid < tol_vec * scale):
            break
        # plateau detection: stop burning filter passes when progress
        # stalls and hand off to the f64 refinement (gated by the trusted
        # re-check). Patience is deliberately generous: early iterations
        # legitimately stall while the adaptive cut is still rising out of
        # the continuum (observed at 316^2 — aborting at the first plateau
        # froze the basis at O(1) residuals and pushed ALL convergence
        # work onto the 10-100x-slower host stages).
        worst = float(np.max(resid / (tol_vec * scale)))
        if worst < best / 1.05:
            best, stall = min(best, worst), 0
        else:
            stall += 1
            if stall >= 12:
                if debug:
                    print(f"mode filter: plateau at {worst:.2f}x tol; "
                          "handing off to f64 refinement")
                break
        # adapt the damping edge to the first UNWANTED Ritz value
        # (Zhou-Saad practice: cut at theta[nev]). Using the bottom of the
        # whole basis (theta[k_sub-1]) is wrong at large planes: the
        # discretized radiation continuum holds more states than k_sub, so
        # the basis bottom never climbs out of it and the cut stays pinned
        # at its initial value — zero selectivity among the top states
        # (observed: cut froze at 0.0 while residuals plateaued at O(1)).
        # MONOTONE: Cauchy interlacing (theta[j] <= lam_j(true)) makes a
        # rising cut always safe for modes above index j.
        j_cut = min(num_modes + 4, k_sub - 1)
        cut_new = float(min(theta[j_cut], 0.92 * theta[num_modes - 1]))
        cut = min(max(cut_new, cut), lam_hi * 0.95)
        lam_amp = float(max(theta[0], lam_hi))
        # filter sharpness must track the shrinking pass band: the
        # amplification of a mode at distance d above the cut goes as
        # exp(2 m sqrt(2 d / e)) with e ~ (cut - lo)/2 the damp half-width
        # — fix the per-pass gain instead of the degree
        d_gap = max(float(lam_hi) - max(cut, 0.0), 0.05 * abs(float(lam_hi)))
        degree = int(min(max(degree, 2.2 * np.sqrt(abs(lo) / d_gap)), 600))
        x = q
    if q is None or not np.all(np.isfinite(theta)):
        log.warning("TPU Chebyshev mode eigensolver produced a non-finite "
                    "basis; falling back to ARPACK.")
        return None
    t_loop = time.time() - t_loop0
    # ONE bulk device->host fetch of the final basis (the loop above keeps
    # every per-iteration quantity on device). device_get of the raw f32
    # block, NOT np.asarray(..., float64): the dtype-converting path is ~2x
    # slower over a tunneled TPU link (measured 85 s vs 15 s at 45 MB).
    t0 = time.time()
    q_np = np.asarray(jax.device_get(q)).astype(np.float64)
    t_fetch = time.time() - t0
    if debug:
        print(f"mode filter: {n_outer} outer iters in {t_loop:.1f}s; "
              f"basis fetch {t_fetch:.1f}s")

    rational_path = not true_is_real and sigma is not None
    t_polish0 = time.time()
    # --- host f64 polish: the f32 device iteration bottoms out at a noise
    # floor ~eps32 * ||M|| per pass (re-injected into every eigendirection
    # each matvec), which at large planes leaves O(1e-2) contamination in
    # deep-negative directions — visible as O(1) relative residuals no
    # polynomial work in f32 can remove. A few float64 filter passes on the
    # sparse proxy (noise floor eps64 * ||M|| ~ 1e-11) strip it: content
    # below the basis floor is damped ~1e4x per pass while the in-basis
    # span is resolved exactly by the f64 Rayleigh-Ritz.
    # the rational-refinement (PML/lossy) path only consumes the leading
    # nsel anchor columns (the resolvent sweeps build the rest of the
    # search space), so the host polish — the wall-time hog on slow hosts
    # (measured 185-250 s at 316^2 full-block) — runs on just those
    # columns there, with a lighter filter: its job is only to clean the
    # anchors enough that they stay DISTINCT (unpolished f32 anchors were
    # observed collapsing onto one continuum pair, starving the dedup).
    nsel = min(num_modes + 4, k_sub)
    if m_proxy is not None:
        ncols = min(nsel + 4, k_sub) if rational_path else k_sub
        n_pass = 3 if rational_path else 5
        deg_p = 50 if rational_path else 80
        xb = np.asarray(q_np @ s[:, :ncols], dtype=np.float64)
        lam_amp_p = float(max(theta[0], lam_hi))
        for it in range(n_pass):
            w = m_proxy @ xb
            hp = xb.T @ w
            theta_p, s_rot = _ordered_real_eig(hp)
            resid_blk = (w @ s_rot[:, :num_modes]
                         - (xb @ s_rot[:, :num_modes]) * theta_p[:num_modes])
            resid = np.linalg.norm(resid_blk, axis=0)
            scale = np.maximum(np.abs(theta_p[:num_modes]),
                               0.05 * abs(float(lam_hi)))
            guided_p = theta_p[:num_modes] > lam_edge
            tol_p = np.where(guided_p, tol, 50.0 * tol)
            if debug:
                print(f"mode polish: ritz={np.round(theta_p[:num_modes], 4)} "
                      f"resid={np.round(resid / scale, 8)}")
            xb = xb @ s_rot  # eigen-order the basis
            theta = np.concatenate([theta_p, theta[ncols:]]) \
                if ncols < len(theta) else theta_p
            if np.all(resid < tol_p * scale):
                break
            cut_p = float(theta_p[ncols - 1]) - 0.01 * abs(lo)
            xb = _host_cheb_filter(m_proxy, xb, lo, cut_p, lam_amp_p,
                                   degree=deg_p)
            xb = _cholqr2_host(xb)
        q_np = xb
        s = np.eye(ncols)
    if debug:
        print(f"mode filter: host f64 polish {time.time() - t_polish0:.1f}s")

    guided64 = theta[:num_modes] > lam_edge
    tol_vec = np.where(guided64, tol, 50.0 * tol)

    # --- float64 block-Krylov Rayleigh-Ritz refinement on the host operator:
    # RR over span([Q, MQ, M^2 Q]) squares down the f32 subspace error (and
    # recovers the complex parts the real basis cannot carry) for two cheap
    # sparse block-matvecs — the heavy iteration stayed on device.
    # trusted-arithmetic gate: re-verify the converged Ritz pairs with a
    # HOST float64 numpy evaluation of the same proxy operator. This is
    # immune to miscompiled device kernels (seen on hosts whose XLA:CPU
    # emits machine-mismatched AOT code) and to pseudospectral deception
    # of residuals measured with the same engine that produced the basis.
    # the pre-refinement gate only applies when the polish ran (real path):
    # on the rational path the basis intentionally skips the polish — its
    # ~1e-2 noise-floor contamination is damped by the resolvent sweeps
    # (components at theta_noise shrink by |theta_noise - sigma|^-1, a
    # ~1e3x suppression for the deep-negative bulk) and every residual the
    # refinement reports is computed in host float64 against the host
    # sparse operator, so the trusted-arithmetic property is preserved by
    # the per-pair `keep` gate below instead.
    if not rational_path:
        v_sel = q_np @ s[:, :num_modes]
        w64 = apply_real.apply_np64(
            v_sel.reshape(2, nx, ny, -1)).reshape(n2, -1)
        res64 = np.linalg.norm(w64 - v_sel * theta[:num_modes], axis=0)
        scale64 = np.maximum(np.abs(theta[:num_modes]),
                             0.05 * abs(float(lam_hi)))
        if debug:
            print("mode filter: trusted f64 resid "
                  f"{np.round(res64 / scale64, 7)}")
        if not np.all(np.isfinite(res64)) or np.any(
                res64 > 50 * tol_vec * scale64):
            log.warning(
                "TPU mode eigensolver failed the trusted float64 re-check "
                "(max rel resid %.2e); falling back to ARPACK."
                % float((res64 / scale64).max()))
            return None

    # final extraction against the TRUE operator: REFINED Ritz vectors
    # over the span of the WHOLE polished proxy block. Two non-obvious
    # choices, both forced by failure modes observed in the lab:
    # * Ordinary Rayleigh-Ritz is unusable: M is non-normal and any space
    #   containing high-energy directions lets RR mix them into the
    #   wanted pairs. Instead, anchor at each converged proxy Ritz value
    #   theta_j and take v_j = argmin_{v in span(W)} ||M v - theta_j v||
    #   (one small SVD per pair after reducing to a basis of
    #   span([W, M W])), then re-center theta_j at its Rayleigh quotient.
    #   No spurious mixing by construction.
    # * The search space must be the FULL k_sub block, not just the
    #   wanted columns (+Krylov images): the true eigenvector differs
    #   from the proxy one by the complex-stretched PML tail, whose
    #   expansion needs many moderate-k_t continuum proxy modes — the
    #   buffer columns. With only the wanted columns the best residual
    #   saturates at the proxy-vs-true vector difference (~|mode
    #   amplitude entering the PML|, percent level).
    t_ref0 = time.time()
    if not true_is_real and sigma is not None:
        # PML-stretched / lossy true operator: the proxy span cannot carry
        # the complex tail — rational refinement with one factorization
        v_start = (q_np @ s[:, :nsel]).astype(np.complex128)
        vals_b, cand, rel_b = _rational_refine(
            m_host, sigma, v_start, theta[:nsel], num_modes, lam_hi,
            lam_edge, tol, debug)
    else:
        # real true operator (no PML, lossless): proxy == truth up to the
        # PEC-penalty representation; per-anchor REFINED Ritz over the
        # whole polished block (ordinary RR would mix in high-energy
        # directions — M is still non-normal through the penalty rows)
        w_basis = _cholqr2_host((q_np @ s).astype(np.complex128))
        mw = m_host @ w_basis
        z = _extend_orthonormal(w_basis, mw)
        zw = z.conj().T @ w_basis
        zmw = z.conj().T @ mw
        vals_b = np.zeros(nsel, dtype=complex)
        rel_b = np.zeros(nsel)
        coefs = np.zeros((w_basis.shape[1], nsel), dtype=complex)
        for j in range(nsel):
            th = complex(theta[j])
            coef = None
            for _ in range(3):  # refined Ritz + Rayleigh-quotient recenter
                b_small = zmw - th * zw
                _, _, vh = np.linalg.svd(b_small, full_matrices=False)
                coef = vh[-1].conj()
                v_z = zw @ coef
                th = complex((v_z.conj() @ (zmw @ coef))
                             / max(float((v_z.conj() @ v_z).real), 1e-300))
            vals_b[j] = th
            # exact residual in the reduced basis (M v and v both live in
            # span(Z), so the small-norm equals the full-space norm);
            # normalize by ||v|| since w_basis is only near-orthonormal
            v_norm = max(float(np.linalg.norm(zw @ coef)), 1e-300)
            res_j = np.linalg.norm(zmw @ coef - th * (zw @ coef)) / v_norm
            rel_b[j] = res_j / max(abs(th), 0.05 * abs(lam_hi))
            coefs[:, j] = coef
        cand = w_basis @ coefs
        cand /= np.maximum(np.linalg.norm(cand, axis=0, keepdims=True),
                           1e-300)
    if debug:
        top = np.argsort(rel_b)[:6]
        print(f"refine: best pairs vals={np.round(vals_b[top], 3)} "
              f"rel={np.round(rel_b[top], 6)} ({time.time() - t_ref0:.1f}s)")
    order = np.argsort(-vals_b.real)
    # guided pairs (above the continuum edge) must be tight; below-edge
    # radiation samples are kept at a loose gate — their exact values are
    # discretization artifacts of the continuum in both solvers. Dedup:
    # refined-Ritz anchors can collapse onto the same eigenpair.
    keep = []
    for i in order:
        if vals_b[i].real > 1.2 * abs(lam_hi):
            continue
        if rel_b[i] >= (1e-3 if vals_b[i].real > lam_edge else 5e-2):
            continue
        dup = any(abs(vals_b[i] - vals_b[j])
                  < 1e-6 * max(abs(vals_b[j]), 1.0)
                  and abs(np.vdot(cand[:, i], cand[:, j])) > 0.9
                  for j in keep)
        if not dup:
            keep.append(i)
    keep = keep[:k_sub]
    if len(keep) < num_modes:
        log.warning(
            "TPU mode eigensolver refinement kept only %d/%d pairs; "
            "falling back to ARPACK." % (len(keep), num_modes))
        return None
    vals = vals_b[keep]
    vecs = cand[:, keep]
    return vals, vecs


def solver_mode() -> str:
    """'filter' | 'arpack' | 'auto' from TIDY3D_TPU_MODE_SOLVER."""
    return os.environ.get("TIDY3D_TPU_MODE_SOLVER", "auto").lower()


def use_filter_path(n2: int, has_offaxis: bool) -> bool:
    """Route the diagonal-path eigensolve to the device filter?

    auto: only when a non-CPU jax backend is live (the filter beats scipy
    on accelerators; on CPU, ARPACK's LU wins) and the problem is big
    enough to amortize compilation.
    """
    mode = solver_mode()
    if mode == "arpack" or has_offaxis:
        return False
    if mode == "filter":
        return True
    try:
        import jax

        backend = jax.default_backend()
    except Exception:  # pragma: no cover - jax always present
        return False
    return backend not in ("cpu",) and n2 >= 20000
