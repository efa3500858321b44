"""Per-piece timing of the fused FDTD step on the real TPU.

Times (a) the main fused kernel alone, (b) main + x-fixup, (c) the full
step including sources/monitors/shutoff bookkeeping, each as a jitted
50-step loop, and prints Gcell*steps/s for each.
"""

import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, state, n_outer=3):
    out = fn(state)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n_outer):
        t0 = time.perf_counter()
        out = fn(state)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import tidy3d_tpu as td
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower
    from tidy3d_tpu.constants import C_0

    n = int(os.environ.get("BENCH_GRID", "360"))
    steps = int(os.environ.get("PROBE_STEPS", "50"))
    freq0 = C_0 / 1.55
    dl = 0.05
    size = (n * dl, n * dl, n * dl)
    sim = td.Simulation(
        center=(0, 0, 0), size=size, run_time=1e-11,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=freq0, fwidth=freq0 / 5),
            polarization="Ez")],
        monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=0.0,
    )
    plan = lower(sim)
    runner = FDTDRunner(plan)
    print("shape:", runner.shape, "dtype:", runner.dtype,
          "fused:", runner.fused is not None,
          "bx:", getattr(runner.fused, "bx", None),
          "fixup_ok:", getattr(runner.fused, "fixup_ok", None),
          file=sys.stderr)
    ncells = float(np.prod(runner.shape))

    runner._pad_time_tables(steps)
    consts = jax.device_put(runner.consts)
    state0 = jax.jit(runner.init_state)()
    jax.block_until_ready(state0)

    fused = runner.fused

    # ---- (a) main kernel only ----
    @jax.jit
    def loop_main(state):
        def body(i, st):
            view = runner._views(st)[0]
            newE, newH, psi_k = fused.step_update(view, consts)
            new_psi = dict(st["psi"])
            new_psi.update(psi_k)
            out = dict(st)
            out.update({"E": newE, "H": newH, "psi": new_psi})
            return out
        return lax.fori_loop(0, steps, body, state)

    t = timed(loop_main, state0)
    print(f"main-kernel only : {ncells * steps / t / 1e9:8.2f} Gcell*steps/s"
          f"  ({t / steps * 1e3:.2f} ms/step)")

    # ---- (b) main + fixup ----
    if fused.fixup_ok:
        @jax.jit
        def loop_fix(state):
            def body(i, st):
                view = runner._views(st)[0]
                newE, newH, psi_k = fused.step_update(view, consts)
                new_psi = dict(st["psi"])
                new_psi.update(psi_k)
                newE, newH, new_psi = fused.x_fixup(
                    newE, newH, new_psi, view, consts)
                out = dict(st)
                out.update({"E": newE, "H": newH, "psi": new_psi})
                return out
            return lax.fori_loop(0, steps, body, state)

        t = timed(loop_fix, state0)
        print(f"main + x-fixup   : {ncells * steps / t / 1e9:8.2f} "
              f"Gcell*steps/s  ({t / steps * 1e3:.2f} ms/step)")

    # ---- (c) full step ----
    @jax.jit
    def loop_full(state):
        def body(i, st):
            return runner._step(i, st, consts)
        return lax.fori_loop(0, steps, body, state)

    t = timed(loop_full, state0)
    print(f"full step        : {ncells * steps / t / 1e9:8.2f} "
          f"Gcell*steps/s  ({t / steps * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
