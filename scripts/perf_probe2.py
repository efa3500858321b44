"""Stepwise instrumentation: where does the time go at 384^3?"""

import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

T0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


def main():
    import tidy3d_tpu as td
    from tidy3d_tpu.solver.fdtd import FDTDRunner
    from tidy3d_tpu.solver.lowering import lower
    from tidy3d_tpu.constants import C_0

    n = int(os.environ.get("BENCH_GRID", "360"))
    steps = int(os.environ.get("PROBE_STEPS", "20"))
    freq0 = C_0 / 1.55
    dl = 0.05
    sim = td.Simulation(
        center=(0, 0, 0), size=(n * dl,) * 3, run_time=1e-11,
        sources=[td.PointDipole(
            center=(0, 0, 0),
            source_time=td.GaussianPulse(freq0=freq0, fwidth=freq0 / 5),
            polarization="Ez")],
        monitors=[],
        boundary_spec=td.BoundarySpec.all_sides(td.PML()),
        grid_spec=td.GridSpec.uniform(dl=dl),
        shutoff=0.0,
    )
    mark("sim built")
    plan = lower(sim)
    mark("lowered")
    runner = FDTDRunner(plan)
    mark(f"runner built shape={runner.shape} bx={getattr(runner.fused,'bx',0)}"
         f" fixup={getattr(runner.fused, 'fixup_ok', None)}")
    runner._pad_time_tables(steps)
    consts = jax.device_put(runner.consts)
    jax.block_until_ready(consts)
    mark("consts on device")
    state0 = jax.jit(runner.init_state)()
    jax.block_until_ready(state0)
    mark("state on device")
    ncells = float(np.prod(runner.shape))
    fused = runner.fused

    # single main-kernel call, no loop
    @jax.jit
    def one_main(state):
        view = runner._views(state)[0]
        newE, newH, psi_k = fused.step_update(view, consts)
        out = dict(state)
        new_psi = dict(state["psi"])
        new_psi.update(psi_k)
        out.update({"E": newE, "H": newH, "psi": new_psi})
        return out

    lowered = one_main.lower(state0)
    mark("main kernel traced/lowered")
    compiled = lowered.compile()
    mark("main kernel COMPILED")
    st = compiled(state0)
    jax.block_until_ready(st)
    mark("main kernel ran once")
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        st = compiled(st)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    mark(f"main kernel: {best * 1e3:.2f} ms/step = "
         f"{ncells / best / 1e9:.2f} Gcell*steps/s (dispatch incl.)")

    # loop to amortize dispatch latency
    @jax.jit
    def loop_main(state):
        def body(i, s):
            view = runner._views(s)[0]
            newE, newH, psi_k = fused.step_update(view, consts)
            out = dict(s)
            new_psi = dict(s["psi"])
            new_psi.update(psi_k)
            out.update({"E": newE, "H": newH, "psi": new_psi})
            return out
        return lax.fori_loop(0, steps, body, state)

    c2 = loop_main.lower(state0).compile()
    mark("main loop compiled")
    st = c2(state0)
    jax.block_until_ready(st)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        st = c2(st)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    mark(f"main loop: {best / steps * 1e3:.2f} ms/step = "
         f"{ncells * steps / best / 1e9:.2f} Gcell*steps/s")

    if fused.fixup_ok:
        @jax.jit
        def loop_fix(state):
            def body(i, s):
                view = runner._views(s)[0]
                newE, newH, psi_k = fused.step_update(view, consts)
                new_psi = dict(s["psi"])
                new_psi.update(psi_k)
                newE, newH, new_psi = fused.x_fixup(
                    newE, newH, new_psi, view, consts)
                out = dict(s)
                out.update({"E": newE, "H": newH, "psi": new_psi})
                return out
            return lax.fori_loop(0, steps, body, state)

        c3 = loop_fix.lower(state0).compile()
        mark("fixup loop compiled")
        st = c3(state0)
        jax.block_until_ready(st)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            st = c3(st)
            jax.block_until_ready(st)
            best = min(best, time.perf_counter() - t0)
        mark(f"main+fixup loop: {best / steps * 1e3:.2f} ms/step = "
             f"{ncells * steps / best / 1e9:.2f} Gcell*steps/s")

    @jax.jit
    def loop_full(state):
        def body(i, s):
            return runner._step(i, s, consts)
        return lax.fori_loop(0, steps, body, state)

    c4 = loop_full.lower(state0).compile()
    mark("full loop compiled")
    st = c4(state0)
    jax.block_until_ready(st)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        st = c4(st)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    mark(f"full step loop: {best / steps * 1e3:.2f} ms/step = "
         f"{ncells * steps / best / 1e9:.2f} Gcell*steps/s")


if __name__ == "__main__":
    main()
