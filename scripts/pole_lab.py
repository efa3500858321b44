"""Micro-lab: ADE pole-update formulations on realistic kstep window shapes.

All variants run VMEM-resident (inputs DMA'd once, R in-kernel fori_loop
repetitions accumulating into the output) so the number isolates VPU
compute + Mosaic scheduling, not HBM traffic or relay dispatch (each call
runs ~seconds of kernel time; relay adds ~0.1 s).

Variants:
  vpu_peak    : independent FMA chains on one (Wx, Wy, Z) f32 block
  pole_chan   : current production formulation — per-channel 3D slabs,
                unrolled over poles/comps (Au-like: 4 real + 3 complex
                poles, 1 shared mask)
  pole_packed : channel-packed (Wx, C, Wy, Z) arrays, per-channel coeff
                VECTORS broadcast on dim1, qr/qi swap + driver gather
                via dim-1 concats

Run: python scripts/pole_lab.py [variants...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Wx, Wy, Z = 24, 64, 128
NR, NC = 4, 3                   # real poles, complex poles (Au RBB-like)
C = NR * 3 + NC * 6             # packed channels (30)
R = 600                         # in-kernel fori_loop repetitions
GRID = 16
VMEM = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


def bench(fn, args, flops_per_rep, label):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"[{label}] compile+1st {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = fn(*args)
    s = float(jnp.sum(out))
    dt = time.time() - t0
    tf = flops_per_rep * R * GRID / dt / 1e12
    print(f"{label:12s}: {dt*1e3:8.2f} ms/call  {tf:6.2f} Tflop/s "
          f"(chk {s:.3e})", flush=True)
    return dt


def make_vpu_peak():
    F = 64   # FMAs per element per rep
    NACC = 8  # independent chains (avoid FMA latency serialization)

    def kernel(x_ref, o_ref):
        def body(r, accs):
            v = x_ref[:]
            out = []
            for i, a in enumerate(accs):
                for _ in range(F // NACC):
                    a = a * 1.000001 + v
                out.append(a)
            return tuple(out)
        accs = lax.fori_loop(0, R, body, tuple(
            jnp.full((Wx, Wy, Z), 0.1 * i, jnp.float32)
            for i in range(NACC)))
        o_ref[:] = sum(accs)

    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wx, Wy, Z), jnp.float32),
        compiler_params=VMEM,
    )
    x = jnp.ones((Wx, Wy, Z), jnp.float32)
    return jax.jit(f), (x,), 2 * F * Wx * Wy * Z


def _pole_consts():
    rng = np.random.default_rng(0)
    Ar = rng.uniform(0.9, 0.99, NR + NC)
    Ai = np.concatenate([np.zeros(NR), rng.uniform(0.01, 0.1, NC)])
    B0r = rng.uniform(-0.01, 0.01, NR + NC)
    B0i = np.concatenate([np.zeros(NR), rng.uniform(-0.01, 0.01, NC)])
    Gr = rng.uniform(-0.01, 0.01, NR + NC)
    Gi = np.concatenate([np.zeros(NR), rng.uniform(-0.01, 0.01, NC)])
    return Ar, Ai, B0r, B0i, Gr, Gi


# flop model shared by both pole variants (same math, same count)
POLE_FLOPS = Wx * Wy * Z * (
    3 * (2 * (NR + NC) + 2 * NC + 2)        # coupling sums + E update
    + 3 * (2 + 1)                           # esum + mes
    + 3 * (NR * 4 + NC * 10))               # Q recursion


def make_pole_chan(dtype=jnp.float32):
    """Mirror of the production per-channel formulation."""
    Ar, Ai, B0r, B0i, Gr, Gi = (
        [float(v) for v in a] for a in _pole_consts())

    def kernel(e_ref, m_ref, q_ref, o_ref):
        mask = m_ref[:]

        def body(r, carry):
            es = list(carry[:3])
            qs = list(carry[3:])
            new_es = []
            for ci in range(3):
                pt = None
                for p in range(NR + NC):
                    ch0 = p * 3 if p < NR else NR * 3 + (p - NR) * 6
                    t = Gr[p] * qs[ch0 + ci]
                    if Gi[p]:
                        t = t - Gi[p] * qs[ch0 + 3 + ci]
                    pt = t if pt is None else pt + t
                new_es.append(0.999 * es[ci] + 0.37 * pt)
            for ci in range(3):
                esum = new_es[ci] + es[ci]
                mes = mask * esum
                for p in range(NR + NC):
                    is_real = p < NR
                    ch0 = p * 3 if is_real else NR * 3 + (p - NR) * 6
                    qr = qs[ch0 + ci]
                    nqr = Ar[p] * qr
                    if not is_real:
                        qi = qs[ch0 + 3 + ci]
                        nqr = nqr - Ai[p] * qi
                        qs[ch0 + 3 + ci] = \
                            Ai[p] * qr + Ar[p] * qi + B0i[p] * mes
                    qs[ch0 + ci] = nqr + B0r[p] * mes
            return tuple(new_es) + tuple(qs)

        init = tuple(e_ref[:, ci] for ci in range(3)) \
            + tuple(q_ref[:, ch] for ch in range(C))
        fin = lax.fori_loop(0, R, body, init)
        o_ref[:] = fin[0] + fin[1] + fin[2] + fin[3]

    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((Wx, 3, Wy, Z), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wx, C, Wy, Z), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wx, Wy, Z), dtype),
        compiler_params=VMEM,
    )
    e = jnp.full((Wx, 3, Wy, Z), 0.01, dtype)
    m = jnp.ones((Wx, Wy, Z), dtype)
    q = jnp.zeros((Wx, C, Wy, Z), dtype)
    return jax.jit(f), (e, m, q), POLE_FLOPS


def make_pole_packed():
    """Channel-packed formulation: per-channel coefficient vectors on
    dim1, complex qr/qi swap + driver gather via dim-1 concats."""
    Ar, Ai, B0r, B0i, Gr, Gi = _pole_consts()
    # layout: [real qr (NR*3) | complex qr (NC*3) | complex qi (NC*3)]
    nQr = NR * 3 + NC * 3
    arv = np.concatenate([np.repeat(Ar[:NR], 3), np.repeat(Ar[NR:], 3),
                          np.repeat(Ar[NR:], 3)])
    aiv = np.concatenate([np.zeros(NR * 3), -np.repeat(Ai[NR:], 3),
                          np.repeat(Ai[NR:], 3)])
    b0v = np.concatenate([np.repeat(B0r[:NR], 3), np.repeat(B0r[NR:], 3),
                          np.repeat(B0i[NR:], 3)])
    grv = np.concatenate([np.repeat(Gr[:NR], 3), np.repeat(Gr[NR:], 3),
                          -np.repeat(Gi[NR:], 3)])
    cv_host = np.stack([arv, aiv, b0v, grv]).astype(np.float32) \
        .reshape(4, C, 1, 1)
    NSLOT = NR + 2 * NC  # 3-channel blocks in the layout

    def kernel(e_ref, m_ref, q_ref, cv_ref, o_ref):
        mask = m_ref[:]                      # (Wx, Wy, Z)
        ARV = cv_ref[0:1]
        AIV = cv_ref[1:2]
        B0V = cv_ref[2:3]
        GRV = cv_ref[3:4]

        def sub(carry):
            es, Q = carry                    # (Wx,3,Wy,Z), (Wx,C,Wy,Z)
            W = GRV * Q
            S = W[:, 0:3]
            for p in range(1, NSLOT):
                S = S + W[:, 3 * p:3 * p + 3]
            newE = 0.999 * es + 0.37 * S
            esum = newE + es
            mes = mask[:, None] * esum       # (Wx, 3, Wy, Z)
            drv = jnp.concatenate([mes] * NSLOT, axis=1)
            qswap = jnp.concatenate(
                [jnp.zeros_like(Q[:, :NR * 3]),
                 Q[:, nQr:], Q[:, NR * 3:nQr]], axis=1)
            newQ = ARV * Q + AIV * qswap + B0V * drv
            return newE, newQ

        es, Q = lax.fori_loop(0, R, lambda r, c: sub(c),
                              (e_ref[:], q_ref[:]))
        o_ref[:] = es[:, 0] + es[:, 1] + es[:, 2] + Q[:, 0]

    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((Wx, 3, Wy, Z), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wx, C, Wy, Z), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C, 1, 1), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wx, Wy, Z), jnp.float32),
        compiler_params=VMEM,
    )
    e = jnp.full((Wx, 3, Wy, Z), 0.01, jnp.float32)
    m = jnp.ones((Wx, Wy, Z), jnp.float32)
    q = jnp.zeros((Wx, C, Wy, Z), jnp.float32)
    cv = jnp.asarray(cv_host)
    return jax.jit(f), (e, m, q, cv), POLE_FLOPS


def main():
    variants = sys.argv[1:] or ["vpu_peak", "pole_packed", "pole_chan"]
    makers = {"vpu_peak": make_vpu_peak, "pole_chan": make_pole_chan,
              "pole_packed": make_pole_packed}
    makers.update(globals().get("makers_extra", {}))
    makers["pole_chan_bf16"] = lambda: make_pole_chan(jnp.bfloat16)
    for v in variants:
        fn, args, flops = makers[v]()
        bench(fn, args, flops, v)




def make_fma_peak():
    """Minimal-carry FMA chains: true VPU f32 ceiling."""
    F = 32

    def kernel(x_ref, o_ref):
        def body(r, carry):
            a, b = carry
            v = x_ref[:]
            for _ in range(F // 2):
                a = a * 1.0000001 + v
                b = b * 0.9999999 + v
            return (a, b)
        a, b = lax.fori_loop(0, R, body,
                             (jnp.zeros((Wx, Wy, Z), jnp.float32),
                              jnp.ones((Wx, Wy, Z), jnp.float32)))
        o_ref[:] = a + b

    f = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wx, Wy, Z), jnp.float32),
        compiler_params=VMEM,
    )
    x = jnp.full((Wx, Wy, Z), 1e-6, jnp.float32)
    return jax.jit(f), (x,), 2 * F * Wx * Wy * Z


def make_curl_mix():
    """E/H curl-like mix (rolls + FMAs) at the same window shape."""
    def kernel(x_ref, o_ref):
        def body(r, fs):
            e = list(fs[:3])
            h = list(fs[3:])
            for ci in range(3):
                d1 = (h[(ci + 1) % 3]
                      - pltpu.roll(h[(ci + 1) % 3], 1, 1)) * 0.5
                d2 = (h[(ci + 2) % 3]
                      - pltpu.roll(h[(ci + 2) % 3], 1, 2)) * 0.5
                e[ci] = 0.999 * e[ci] + 0.37 * (d1 - d2)
            for ci in range(3):
                d1 = (pltpu.roll(e[(ci + 1) % 3], Wy - 1, 1)
                      - e[(ci + 1) % 3]) * 0.5
                d2 = (pltpu.roll(e[(ci + 2) % 3], Z - 1, 2)
                      - e[(ci + 2) % 3]) * 0.5
                h[ci] = 0.999 * h[ci] - 0.37 * (d1 - d2)
            return tuple(e) + tuple(h)

        init = tuple(x_ref[:] * (0.1 * i + 0.1) for i in range(6))
        fin = lax.fori_loop(0, R, body, init)
        o_ref[:] = fin[0] + fin[3]

    f = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Wx, Wy, Z), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wx, Wy, Z), jnp.float32),
        compiler_params=VMEM,
    )
    x = jnp.full((Wx, Wy, Z), 0.01, jnp.float32)
    # 6 comps x (2 roll-ish + 5 arith) ~ count arith only: 6*9 flops
    return jax.jit(f), (x,), Wx * Wy * Z * 54


makers_extra = {"fma_peak": make_fma_peak, "curl_mix": make_curl_mix}


if __name__ == "__main__":
    main()
