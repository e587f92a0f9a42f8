#!/usr/bin/env python
"""Measure the lone-conv seam tax: HAT/DAT group-ending 3×3 convs sit
between Mosaic kernels (RHAG: OCAB → conv → +res → next HAB), and the r4
HLO dump showed XLA lowering convs in a transposed layout with relayout
copies at every custom-call boundary (PERF.md r4).

Variants (marginal ms/unit at the whole-image bench shape, distinct-params
chains):
  conv_xla          — lone XLA 3×3 conv C→C (no kernel neighbours)
  conv_into_kernel  — hab_kernel(conv(x), cx=x): conv output feeds pallas
  kernel_into_conv  — conv(hab_kernel(x, x)): pallas output feeds conv
  seam              — conv between two kernels (the real RHAG pattern)
  conv_pallas       — conv3x3_dense kernel alone
  seam_pallas       — conv3x3_dense between two kernels

Usage: python scripts/probe_seams.py [dtype] [names...]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.ops import windows as W  # noqa: E402

B, H, WW, C = 1, 352, 512, 180
NH, WS = 6, 16
N = WS * WS


def timeit(make_fn, inputs, n1=1, n2=4, iters=5):
    def chained(k):
        @jax.jit
        def f(xs):
            tot = jnp.float32(0.0)
            for i in range(k):
                out = make_fn(*xs[i])
                first = out[0] if isinstance(out, tuple) else out
                tot = tot + jnp.sum(first.astype(jnp.float32))
            return tot
        return f

    xs = inputs(n2)
    f1, f2 = chained(n1), chained(n2)
    t0 = time.time()
    float(f1(xs[:n1]))
    float(f2(xs))
    compile_s = time.time() - t0

    def med(f, a):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = med(f1, xs[:n1]), med(f2, xs)
    return (t2 - t1) * 1000 / (n2 - n1), compile_s


def main():
    dtype = jnp.dtype(sys.argv[1] if len(sys.argv) > 1 else "bfloat16")
    which = set(sys.argv[2:])
    k = jax.random.PRNGKey
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": str(dtype)}), flush=True)

    from freqfusion_tpu.ops.pallas.cab import conv3x3_dense
    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block

    ln1 = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32))
    bias = jax.random.normal(k(7), (NH, N, N)) * 0.1

    def mk_inputs(n):
        out = []
        for i in range(n):
            kk = lambda j: k(1000 * i + j)
            out.append((
                (jax.random.normal(kk(0), (B, H, WW, C)) * 0.2).astype(dtype),
                (jax.random.normal(kk(8), (3, 3, C, C)) * 0.02).astype(dtype),
                jnp.zeros((C,), dtype),
                (jax.random.normal(kk(3), (C, 3 * C)) * 0.05).astype(dtype),
                jnp.zeros((3 * C,), dtype),
                (jax.random.normal(kk(4), (C, C)) * 0.05).astype(dtype),
                jnp.zeros((C,), dtype),
                (jax.random.normal(kk(5), (C, 2 * C)) * 0.05).astype(dtype),
                jnp.zeros((2 * C,), dtype),
                (jax.random.normal(kk(6), (2 * C, C)) * 0.05).astype(dtype),
                jnp.zeros((C,), dtype),
            ))
        return out

    def conv(x, wc, bc):
        return jax.lax.conv_general_dilated(
            x, wc, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bc

    def hab(x, cx, rest):
        (wqkv, bqkv, wproj, bproj, w1, b1, w2, b2) = rest
        return fused_hab_block(x, cx, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                               w1, b1, w2, b2, bias, None, (WS, WS), NH, 0.01)

    def go(name, fn, **kw):
        if which and name not in which:
            return
        try:
            ms, cs = timeit(fn, mk_inputs, **kw)
            print(json.dumps({"probe": f"{name}.{dtype}", "ms": round(ms, 3),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)

    go("conv_xla", lambda x, wc, bc, *r: conv(x, wc, bc))
    go("conv_pallas", lambda x, wc, bc, *r: conv3x3_dense(x, wc, bc))
    go("kernel", lambda x, wc, bc, *r: hab(x, x, r))
    go("conv_into_kernel", lambda x, wc, bc, *r: hab(conv(x, wc, bc), x, r))
    go("kernel_into_conv", lambda x, wc, bc, *r: conv(hab(x, x, r), wc, bc))
    go("seam", lambda x, wc, bc, *r: hab(x + conv(hab(x, x, r), wc, bc),
                                         x, r))
    go("seam_pallas",
       lambda x, wc, bc, *r: hab(x + conv3x3_dense(hab(x, x, r), wc, bc),
                                 x, r))


if __name__ == "__main__":
    main()
