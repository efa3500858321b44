"""Temporal-blocking prototype: k leapfrog steps per HBM round trip.

Vacuum curl updates only (no PML/sources) — measures the achievable
throughput scaling before building the production kernel.

  python scripts/kernel_lab2.py [n] [k list] [bx list]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = ("Ex", "Ey", "Ez")
H = ("Hx", "Hy", "Hz")
CA, CB = 0.999, 0.37


def make_kstep(n, bx, k, dtype):
    """k full leapfrog steps in one pallas_call.

    Halo requirement: computing E then H k times starting from (E^n, H^n)
    on rows [s, s+bx) needs H^n on [s-k, s+bx+k) and E^n on [s-k, s+bx+k)
    (one-sided stencils mean asymmetric exact bounds; we take the symmetric
    superset: hw = k extra rows low and high for every field).
    """
    # halo width each side: the smallest multiple-of-(bx divisor) >= k so
    # halo windows stay block-aligned (index maps are in units of blocks)
    hw = k
    while bx % hw:
        hw += 1
    W = bx + 2 * hw  # extended row count held in VMEM
    rb = bx // hw    # main-block size in halo-block units

    def blk():
        return pl.BlockSpec((bx, n, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def lo_halo():
        # halo block units of hw rows: window [s-hw, s) = block (i*rb - 1)
        return pl.BlockSpec(
            (hw, n, n),
            lambda i: (jnp.maximum(i * rb - 1, 0), 0, 0),
            memory_space=pltpu.VMEM)

    def hi_halo():
        nb = n // hw
        return pl.BlockSpec(
            (hw, n, n),
            lambda i: (jnp.minimum(i * rb + rb, nb - 1), 0, 0),
            memory_space=pltpu.VMEM)

    names = []
    for c in E + H:
        names += [f"lo_{c}", f"in_{c}", f"hi_{c}"]
    out_names = [f"out_{c}" for c in E + H]

    def kernel(*refs):
        r = dict(zip(names + out_names, refs))

        # bf16 storage, f32 compute (Mosaic has no bf16 rotate; accuracy)
        def ext(c):
            return jnp.concatenate(
                [r[f"lo_{c}"][:], r[f"in_{c}"][:], r[f"hi_{c}"][:]],
                axis=0).astype(jnp.float32)

        fE = {c: ext(c) for c in E}
        fH = {c: ext(c) for c in H}

        def bd(f, axis):
            return f - pltpu.roll(f, 1, axis)

        def fd(f, axis):
            return pltpu.roll(f, f.shape[axis] - 1, axis) - f

        def bdx(f):  # backward diff along x via slice+concat
            return f - jnp.concatenate([f[:1], f[:-1]], axis=0)

        def fdx(f):  # forward diff along x
            return jnp.concatenate([f[1:], f[-1:]], axis=0) - f

        for step in range(k):
            # E update on all W rows (top/bottom rows use stale neighbors —
            # they are discarded; only [hw, hw+bx) is valid after k steps)
            dEx = bd(fH["Hz"], 1) - bd(fH["Hy"], 2)
            hx = fH["Hx"]
            dEy = bd(hx, 2) - bdx(fH["Hz"])
            dEz = bdx(fH["Hy"]) - bd(hx, 1)
            fE = {"Ex": CA * fE["Ex"] + CB * dEx,
                  "Ey": CA * fE["Ey"] + CB * dEy,
                  "Ez": CA * fE["Ez"] + CB * dEz}
            ex, ey, ez = fE["Ex"], fE["Ey"], fE["Ez"]
            dHx = fd(ez, 1) - fd(ey, 2)
            dHy = fd(ex, 2) - fdx(ez)
            dHz = fdx(ey) - fd(ex, 1)
            fH = {"Hx": CA * fH["Hx"] - CB * dHx,
                  "Hy": CA * fH["Hy"] - CB * dHy,
                  "Hz": CA * fH["Hz"] - CB * dHz}

        for c in E:
            r[f"out_{c}"][:] = fE[c][hw:hw + bx].astype(dtype)
        for c in H:
            r[f"out_{c}"][:] = fH[c][hw:hw + bx].astype(dtype)

    def group(fields):
        args = []
        specs = []
        for c in E + H:
            args += [fields[c], fields[c], fields[c]]
            specs += [lo_halo(), blk(), hi_halo()]
        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((n, n, n), dtype)] * 6,
            grid=(n // bx,),
            in_specs=specs,
            out_specs=[pl.BlockSpec((bx, n, n), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * 6,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(*args)
        return {c: outs[i] for i, c in enumerate(E + H)}

    return group


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                           else ["1", "2", "3", "4"])]
    bxs = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                            else ["8"])]
    groups = 10
    for dname, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fields = {c: jnp.zeros((n, n, n), dtype) for c in E + H}
        for k in ks:
            for bx in bxs:
                if n % bx:
                    continue
                try:
                    g = make_kstep(n, bx, k, dtype)

                    @jax.jit
                    def loop(fs):
                        out = lax.fori_loop(0, groups, lambda i, f: g(f), fs)
                        return out, jnp.sum(out["Ex"][:1, :1, :1])

                    r, s = loop(fields)
                    float(s)
                    best = 1e30
                    for _ in range(3):
                        t0 = time.perf_counter()
                        r, s = loop(r)
                        float(s)
                        best = min(best, time.perf_counter() - t0)
                    steps = groups * k
                    rate = n**3 * steps / best / 1e9
                    print(f"{dname} k={k} bx={bx}: "
                          f"{best / steps * 1e3:6.2f} ms/step  "
                          f"{rate:6.2f} Gcell*steps/s", flush=True)
                except Exception as e:
                    msg = str(e).split("\n")[0][:100]
                    print(f"{dname} k={k} bx={bx}: FAILED {msg}", flush=True)


if __name__ == "__main__":
    main()
