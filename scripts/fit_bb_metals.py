"""Evaluate the Rakic 1998 Brendel-Bormann metal models and fit them with
our FastDispersionFitter, emitting PoleResidue literals."""
import numpy as np
from scipy.special import wofz

EV = 1.0  # work in eV, convert at the end
HBAR_EVS = 6.582119569e-16  # eV*s

# Rakic et al., Appl. Opt. 37, 5271 (1998), Table 1 (BB model):
# (wp, f0, Gamma0, [(f_j, Gamma_j, w_j, sigma_j)...]) in eV
BB = {
  "Au": (9.03, 0.770, 0.050, [(0.054, 0.074, 0.218, 0.742),
                              (0.050, 0.035, 2.885, 0.349),
                              (0.312, 0.083, 4.069, 0.830),
                              (0.719, 0.125, 6.137, 1.246),
                              (1.648, 0.179, 27.97, 1.795)]),
  "Ag": (9.01, 0.821, 0.049, [(0.050, 0.189, 2.025, 1.894),
                              (0.133, 0.067, 5.185, 0.665),
                              (0.051, 0.019, 4.343, 0.189),
                              (0.467, 0.117, 9.809, 1.170),
                              (4.000, 0.052, 18.56, 0.516)]),
  "Al": (14.98, 0.526, 0.047, [(0.213, 0.312, 0.163, 0.013),
                               (0.060, 0.315, 1.561, 0.042),
                               (0.182, 1.587, 1.827, 0.256),
                               (0.014, 2.145, 4.495, 1.735)]),
  "Cu": (10.83, 0.562, 0.030, [(0.076, 0.056, 0.416, 0.562),
                               (0.081, 0.047, 2.849, 0.469),
                               (0.324, 0.113, 4.819, 1.131),
                               (0.726, 0.172, 8.136, 1.719)]),
  "W":  (13.22, 0.197, 0.057, [(0.006, 3.689, 0.481, 3.754),
                               (0.022, 0.277, 0.985, 0.059),
                               (0.136, 1.433, 1.962, 0.273),
                               (2.648, 4.555, 5.442, 1.912)]),
}


def eps_bb(w_ev, wp, f0, g0, osc):
    """BB eps(w) in the e^{-iwt} convention (Im eps >= 0 for loss)."""
    w = np.asarray(w_ev, dtype=complex)
    eps = 1.0 - f0 * wp**2 / (w * (w + 1j * g0))
    for f_j, g_j, w_j, s_j in osc:
        a = np.sqrt(w * (w + 1j * g_j))
        pref = 1j * np.sqrt(np.pi) * f_j * wp**2 / (2 * np.sqrt(2) * a * s_j)
        chi = pref * (wofz((a - w_j) / (np.sqrt(2) * s_j))
                      + wofz((a + w_j) / (np.sqrt(2) * s_j)))
        eps = eps + chi
    return eps


def main():
    import tidy3d_tpu  # noqa
    from tidy3d_tpu.plugins.dispersion import FastDispersionFitter

    # fit over 0.4 - 12 um (the photonics + IR band)
    wvl = np.geomspace(0.4, 12.0, 120)
    w_ev = 1.2398419843320026 / wvl  # eV <-> um
    for name, (wp, f0, g0, osc) in BB.items():
        eps = eps_bb(w_ev, wp, f0, g0, osc)
        nk = np.sqrt(eps)
        n = np.real(nk); k = np.imag(nk)
        # sanity: metals have large k in the IR
        fitter = FastDispersionFitter(wvl_um=wvl, n_data=n, k_data=np.abs(k))
        med, rms = fitter.fit(min_num_poles=4, max_num_poles=8,
                              tolerance_rms=5e-3)
        print(f"# {name}: BB fit rms = {rms:.3e}")
        print(f'"{name}": dict(eps_inf={med.eps_inf!r}, poles=[')
        for a, c in med.poles:
            print(f"    ({complex(a)!r}, {complex(c)!r}),")
        print("]),")
        # spot check at 3 wavelengths
        for wl in (0.6, 1.55, 5.0):
            ev = 1.2398419843320026 / wl
            e_t = eps_bb(np.array([ev]), wp, f0, g0, osc)[0]
            e_f = med.eps_model(2.99792458e14 / wl * 1.0)  # C_0[um]/wl
            print(f"#   wl={wl}: BB eps={e_t:.3f}, fit eps={e_f:.3f}")

main()
