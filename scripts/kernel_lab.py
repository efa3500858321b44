"""Kernel micro-lab: isolate what the fused FDTD kernel pays for.

Variants (all one pallas_call per step, grid over x-blocks, same IO
pattern as the production kernel):
  curl    : full leapfrog curl update (rolls along y and z + x halos)
  noroll  : same arithmetic but neighbor = self (no lane/sublane shifts)
  copy    : pure read->write of the 6 fields (DMA ceiling)

Run on the real TPU:  python scripts/kernel_lab.py [n] [bx]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = ("Ex", "Ey", "Ez")
H = ("Hx", "Hy", "Hz")


def make_step(n, bx, variant, dtype=jnp.float32):
    ny = nz = n

    def blk():
        return pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def hi_plane():
        return pl.BlockSpec((1, ny, nz),
                            lambda i: (jnp.minimum(i * bx + bx, n - 1), 0, 0),
                            memory_space=pltpu.VMEM)

    def lo_plane():
        return pl.BlockSpec((1, ny, nz),
                            lambda i: (jnp.maximum(i * bx - 1, 0), 0, 0),
                            memory_space=pltpu.VMEM)

    names, specs = [], []
    for c in H:
        names.append(f"src_{c}"); specs.append(blk())
        names.append(f"hi_{c}"); specs.append(hi_plane())
    for c in ("Hy", "Hz"):
        names.append(f"lo_{c}"); specs.append(lo_plane())
    for c in E:
        names.append(f"old_{c}"); specs.append(blk())
    for c in ("Ey", "Ez"):
        names.append(f"hi_{c}"); specs.append(hi_plane())
    out_names = [f"out_{c}" for c in E + H]

    CA, CB = 0.999, 0.37

    def kernel(*refs):
        r = dict(zip(names + out_names, refs))
        fH = {c: r[f"src_{c}"][:] for c in H}
        fE = {c: r[f"old_{c}"][:] for c in E}

        if variant == "copy":
            for c in E:
                r[f"out_{c}"][:] = fE[c]
            for c in H:
                r[f"out_{c}"][:] = fH[c]
            return

        def bd(f, axis):
            if variant == "noroll":
                return f - f * 0.99
            return f - pltpu.roll(f, 1, axis)

        def fd(f, axis):
            if variant == "noroll":
                return f * 0.99 - f
            return pltpu.roll(f, f.shape[axis] - 1, axis) - f

        # extended H along x
        Hx_e = jnp.concatenate([fH["Hx"], r["hi_Hx"][:]], axis=0)
        Hy_e = jnp.concatenate([r["lo_Hy"][:], fH["Hy"], r["hi_Hy"][:]],
                               axis=0)
        Hz_e = jnp.concatenate([r["lo_Hz"][:], fH["Hz"], r["hi_Hz"][:]],
                               axis=0)
        Ey_e = jnp.concatenate([fE["Ey"], r["hi_Ey"][:]], axis=0)
        Ez_e = jnp.concatenate([fE["Ez"], r["hi_Ez"][:]], axis=0)

        newE = {}
        newE["Ex"] = CA * fE["Ex"] + CB * (bd(fH["Hz"], 1) - bd(fH["Hy"], 2))
        newE["Ey"] = CA * Ey_e + CB * (bd(Hx_e, 2)
                                       - (Hz_e[1:] - Hz_e[:-1]))
        newE["Ez"] = CA * Ez_e + CB * ((Hy_e[1:] - Hy_e[:-1])
                                       - bd(Hx_e, 1))
        for c in E:
            v = newE[c][:bx] if newE[c].shape[0] > bx else newE[c]
            r[f"out_{c}"][:] = v

        ex, ey, ez = newE["Ex"], newE["Ey"], newE["Ez"]
        newH = {}
        newH["Hx"] = CA * fH["Hx"] - CB * (fd(ez[:bx], 1) - fd(ey[:bx], 2))
        newH["Hy"] = CA * fH["Hy"] - CB * (fd(ex, 2) - (ez[1:] - ez[:-1]))
        newH["Hz"] = CA * fH["Hz"] - CB * ((ey[1:] - ey[:-1]) - fd(ex, 1))
        for c in H:
            r[f"out_{c}"][:] = newH[c]

    def step(fields):
        args = []
        for c in H:
            args += [fields[c], fields[c]]
        args += [fields["Hy"], fields["Hz"]]
        for c in E:
            args.append(fields[c])
        args += [fields["Ey"], fields["Ez"]]
        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((n, ny, nz), dtype)] * 6,
            grid=(n // bx,),
            in_specs=specs,
            out_specs=[pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * 6,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(*args)
        return {c: outs[i] for i, c in enumerate(E + H)}

    return step


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    bxs = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                            else ["4", "8"])]
    steps = 30
    dtypes = [("f32", jnp.float32)]
    if os.environ.get("LAB_BF16"):
        dtypes.append(("bf16", jnp.bfloat16))
    for dname, dtype in dtypes:
        fields = {c: jnp.zeros((n, n, n), dtype) for c in E + H}
        for variant in ("copy", "noroll", "curl"):
            for bx in bxs:
                if n % bx:
                    continue
                step = make_step(n, bx, variant, dtype)

                @jax.jit
                def loop(fs):
                    def body(i, f):
                        return step(f)
                    out = lax.fori_loop(0, steps, body, fs)
                    # relay gotcha: block_until_ready is unreliable; return a
                    # scalar that must be fetched to force synchronization
                    return out, jnp.sum(out["Ex"][:2, :2, :2])

                r, s = loop(fields)
                float(s)
                best = 1e30
                for _ in range(3):
                    t0 = time.perf_counter()
                    r, s = loop(r)
                    float(s)
                    best = min(best, time.perf_counter() - t0)
                rate = n**3 * steps / best / 1e9
                print(f"{dname} {variant:7s} bx={bx}: "
                      f"{best / steps * 1e3:6.2f} ms/step  {rate:6.2f} "
                      f"Gcell*steps/s", flush=True)


if __name__ == "__main__":
    main()
