"""Mode-solver wall-time benchmark: TPU Chebyshev filter vs scipy ARPACK.

BASELINE.md target: "Mode solve: wall time better than scipy shift-invert
path" at the reference's slow-path threshold (1e5 plane cells,
simulation.py:130). Run on the live jax backend (axon TPU):

    python scripts/mode_bench.py [ncells_side]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tidy3d_tpu.components.mode import ModeSpec  # noqa: E402
from tidy3d_tpu.constants import C_0  # noqa: E402
from tidy3d_tpu.plugins.mode import compute_modes  # noqa: E402

WL = 1.55
FREQ0 = C_0 / WL


def strip_eps(nx, ny, dl, n_core=3.0, n_clad=1.444, w=0.5, h=0.25):
    x_b = (np.arange(nx + 1) - nx / 2) * dl
    y_b = (np.arange(ny + 1) - ny / 2) * dl
    x_c = 0.5 * (x_b[1:] + x_b[:-1])
    y_c = 0.5 * (y_b[1:] + y_b[:-1])

    def eps_at(xs, ys):
        xx, yy = np.meshgrid(xs, ys, indexing="ij")
        core = (np.abs(xx) < w / 2) & (np.abs(yy) < h / 2)
        return np.where(core, n_core**2, n_clad**2).astype(complex)

    return ((eps_at(x_c, y_b[:-1]), eps_at(x_b[:-1], y_c),
             eps_at(x_b[:-1], y_b[:-1])), (x_b, y_b))


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 316
    nx, ny = side, side
    dl = 4.0 / side  # 4 um x 4 um window
    eps, coords = strip_eps(nx, ny, dl)
    spec = ModeSpec(num_modes=4, target_neff=2.4, num_pml=(12, 12))
    print(f"plane cells: {nx * ny} ({nx}x{ny}), matrix 2N = {2 * nx * ny}")

    import jax

    print("jax backend:", jax.default_backend())

    os.environ["TIDY3D_TPU_MODE_SOLVER"] = "filter"
    t0 = time.time()
    _, n_f = compute_modes(eps, coords, FREQ0, spec)
    t_filter = time.time() - t0
    print(f"filter (cold): {t_filter:.2f}s  neff={np.round(n_f.real, 6)}",
          flush=True)
    # second run: jit cache warm (realistic for freq sweeps)
    t0 = time.time()
    _, n_f2 = compute_modes(eps, coords, FREQ0, spec)
    t_filter_warm = time.time() - t0
    print(f"filter (warm): {t_filter_warm:.2f}s  neff={np.round(n_f2.real, 6)}",
          flush=True)

    if os.environ.get("TIDY3D_TPU_MODE_BENCH_SKIP_ARPACK") == "1":
        return
    os.environ["TIDY3D_TPU_MODE_SOLVER"] = "arpack"
    t0 = time.time()
    _, n_a = compute_modes(eps, coords, FREQ0, spec)
    t_arpack = time.time() - t0
    print(f"arpack:        {t_arpack:.2f}s  neff={np.round(n_a.real, 6)}")
    print(f"max |dneff|:   {np.abs(n_f.real - n_a.real).max():.2e}")
    print(f"speedup cold/warm: {t_arpack / t_filter:.2f}x / "
          f"{t_arpack / t_filter_warm:.2f}x")


if __name__ == "__main__":
    main()
