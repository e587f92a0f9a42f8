#!/usr/bin/env python
"""Decompose HAB kernel cost at the whole-image bench shape (1x352x512x180).

Questions this answers (PERF.md r3 open levers):
  1. Do bf16 inputs actually speed the fused kernels up ~3x (f32 multi-pass
     vs bf16 single-pass MXU), or was the +6% bf16-e2e number real?
  2. Where does HAB time go: attention (QK/PV, K=32-deep per head) vs the
     dense qkv/proj/MLP matmuls vs softmax/LN VPU work?
  3. What does the CAB XLA conv chain cost at this shape in each dtype?

Run on TPU: python scripts/probe_habparts.py [all|hab|wattn|mlp|cab|calib]
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.utils.runtime import enable_compilation_cache  # noqa: E402
from freqfusion_tpu.ops import windows as W  # noqa: E402
from freqfusion_tpu.ops.pallas.wattn import (  # noqa: E402
    fused_hab_block, fused_window_attention, fused_residual_ln_mlp)

B, H, WW, C = 1, 352, 512, 180
NH, WS = 6, 16
N = WS * WS
HID = 2 * C


def _chained(fn, chain):
    @jax.jit
    def chained(*a):
        tot = jnp.float32(0.0)
        for i in range(chain):
            # anti-CSE scale must survive the dtype: 1+1e-6 rounds to
            # exactly 1.0 in bf16 and XLA folds x*1 → x, collapsing the
            # whole chain to one call (measured: negative per-call times)
            scale = jnp.asarray(1.0 + i / 64.0, a[0].dtype)
            out = fn(a[0] * scale, *a[1:])
            first = out[0] if isinstance(out, tuple) else out
            tot = tot + jnp.sum(first.astype(jnp.float32))
        return tot
    return chained

def timeit(fn, *args, warmup=1, iters=5, c1=2, c2=10):
    """Times fn at two chain lengths and solves out the fixed per-dispatch
    tunnel overhead (~29 ms, PERF.md): t = (T2 - T1) / (c2 - c1)."""
    f1, f2 = _chained(fn, c1), _chained(fn, c2)
    t0 = time.time()
    for _ in range(warmup):
        float(f1(*args))
        float(f2(*args))
    compile_s = time.time() - t0

    def med(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = med(f1), med(f2)
    per_call = (t2 - t1) * 1000 / (c2 - c1)
    overhead = t1 * 1000 - c1 * per_call
    return per_call, compile_s, overhead


def report(name, ms, flops=None, overhead=None, **extra):
    rec = {"probe": name, "ms": round(ms, 3), **extra}
    if flops:
        rec["tflops"] = round(flops / (ms / 1e3) / 1e12, 1)
    if overhead is not None:
        rec["dispatch_ms"] = round(overhead, 1)
    print(json.dumps(rec), flush=True)


def mk(dtype):
    k = jax.random.PRNGKey
    x = (jax.random.normal(k(0), (B, H, WW, C)) * 0.2).astype(dtype)
    cx = (jax.random.normal(k(9), (B, H, WW, C)) * 0.2).astype(dtype)
    wqkv = (jax.random.normal(k(1), (C, 3 * C)) * 0.05).astype(dtype)
    bqkv = jnp.zeros((3 * C,), dtype)
    wproj = (jax.random.normal(k(2), (C, C)) * 0.05).astype(dtype)
    bproj = jnp.zeros((C,), dtype)
    bias = jax.random.normal(k(3), (NH, N, N)) * 0.1
    ln = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    w1 = (jax.random.normal(k(4), (C, HID)) * 0.05).astype(dtype)
    b1 = jnp.zeros((HID,), dtype)
    w2 = (jax.random.normal(k(5), (HID, C)) * 0.05).astype(dtype)
    b2 = jnp.zeros((C,), dtype)
    return x, cx, wqkv, bqkv, wproj, bproj, bias, ln, w1, b1, w2, b2


# FLOPs at this shape (per call)
PX = B * H * WW
F_DENSE = 2 * PX * C * (3 * C + C)            # qkv + proj
F_ATT = 2 * PX * 2 * (NH * 32) * N            # QK + PV at hdp=32
F_MLP = 2 * PX * 2 * C * HID                  # fc1 + fc2
F_HAB = F_DENSE + F_ATT + F_MLP


def probe_hab(dtype):
    x, cx, wqkv, bqkv, wproj, bproj, bias, (lw, lb), w1, b1, w2, b2 = mk(dtype)
    mask = W.shift_attn_mask(H, WW, WS, WS, 8, 8)
    for m, tag in ((None, "nomask"), (mask, "mask")):
        f = functools.partial(
            fused_hab_block, window=(WS, WS), num_heads=NH, conv_scale=0.01,
            mask=np.asarray(m) if m is not None else None)
        ms, cs, ov = timeit(
            lambda xx, *a: f(xx, *a), x, cx, lw, lb, lw, lb, wqkv, bqkv,
            wproj, bproj, w1, b1, w2, b2, bias)
        report(f"hab.{tag}.{dtype}", ms, flops=F_HAB, overhead=ov,
               compile_s=round(cs, 1))


def probe_wattn(dtype):
    x, cx, wqkv, bqkv, wproj, bproj, bias, _, *_ = mk(dtype)
    f = functools.partial(fused_window_attention, mask=None,
                          window=(WS, WS), num_heads=NH)
    ms, cs, ov = timeit(lambda *a: f(*a), x, wqkv, bqkv, wproj, bproj, bias)
    report(f"wattn.{dtype}", ms, flops=F_DENSE + F_ATT, overhead=ov,
           compile_s=round(cs, 1))


def probe_mlp(dtype):
    x, cx, *_ , (lw, lb), w1, b1, w2, b2 = mk(dtype)
    ms, cs, ov = timeit(lambda *a: fused_residual_ln_mlp(*a),
                    x, cx, lw, lb, w1, b1, w2, b2)
    report(f"resmlp.{dtype}", ms, flops=F_MLP, overhead=ov,
           compile_s=round(cs, 1))


def probe_cab(dtype):
    k = jax.random.PRNGKey
    mid = C // 3
    x = (jax.random.normal(k(0), (B, H, WW, C)) * 0.2).astype(dtype)
    w1 = (jax.random.normal(k(1), (3, 3, C, mid)) * 0.05).astype(dtype)
    w2 = (jax.random.normal(k(2), (3, 3, mid, C)) * 0.05).astype(dtype)

    def cab(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.gelu(y, approximate=False)
        return jax.lax.conv_general_dilated(
            y, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fl = 2 * PX * 9 * C * mid * 2
    ms, cs, ov = timeit(cab, x, w1, w2)
    report(f"cab_convs.{dtype}", ms, flops=fl, overhead=ov,
           compile_s=round(cs, 1))


def probe_calib(dtype):
    # MXU rate calibration: XLA matmul at the qkv shape [PX,180]x[180,1080]
    k = jax.random.PRNGKey
    a = (jax.random.normal(k(0), (PX, C)) * 0.2).astype(dtype)
    b = (jax.random.normal(k(1), (C, 6 * C)) * 0.05).astype(dtype)
    ms, cs, ov = timeit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
                    a, b)
    report(f"xla_matmul_k180.{dtype}", ms, flops=2 * PX * C * 6 * C,
           overhead=ov, compile_s=round(cs, 1))


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "shape": [B, H, WW, C]}), flush=True)
    enable_compilation_cache()
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    for dt in ("float32", "bfloat16"):
        if what in ("all", "calib"):
            probe_calib(dt)
        if what in ("all", "cab"):
            probe_cab(dt)
        if what in ("all", "mlp"):
            probe_mlp(dt)
        if what in ("all", "wattn"):
            probe_wattn(dt)
        if what in ("all", "hab"):
            probe_hab(dt)


if __name__ == "__main__":
    main()
