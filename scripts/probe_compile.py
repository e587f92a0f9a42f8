#!/usr/bin/env python
"""Per-kernel standalone compile+run timing at bench shapes.

Usage: python scripts/probe_compile.py [kernel ...]
Kernels: sgfn hab nafA nafB bandmha
Each prints {"kernel": ..., "compile_s": ..., "ms": ...}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first.astype(jnp.float32)))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(first.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return compile_s, float(np.median(ts) * 1000)


def k_sgfn():
    from freqfusion_tpu.ops.pallas.sgfn import fused_sgfn_tail
    rng = np.random.default_rng(0)
    c, hid = 180, 720
    a = jnp.asarray(rng.normal(size=(2, 192, 192, c)), jnp.float32) * 0.3
    s_ = jnp.asarray(rng.normal(size=(2, 192, 192, c)), jnp.float32) * 0.3
    return timeit(lambda x, y: fused_sgfn_tail(
        x, y, jnp.ones((c,)), jnp.zeros((c,)),
        jnp.asarray(rng.normal(size=(c, hid)), jnp.float32) * 0.05,
        jnp.zeros((hid,)), jnp.ones((hid // 2,)), jnp.zeros((hid // 2,)),
        jnp.asarray(rng.normal(size=(3, 3, 1, hid // 2)), jnp.float32) * 0.1,
        jnp.zeros((hid // 2,)),
        jnp.asarray(rng.normal(size=(hid // 2, c)), jnp.float32) * 0.05,
        jnp.zeros((c,))), a, s_)


def k_hab():
    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block
    rng = np.random.default_rng(0)
    c, nh, ws = 180, 6, 16
    n = ws * ws
    x = jnp.asarray(rng.normal(size=(2, 192, 192, c)), jnp.float32) * 0.3
    cx = jnp.asarray(rng.normal(size=(2, 192, 192, c)), jnp.float32) * 0.3
    args = dict(
        ln1_w=jnp.ones((c,)), ln1_b=jnp.zeros((c,)),
        ln2_w=jnp.ones((c,)), ln2_b=jnp.zeros((c,)),
        wqkv=jnp.asarray(rng.normal(size=(c, 3 * c)), jnp.float32) * 0.05,
        bqkv=jnp.zeros((3 * c,)),
        wproj=jnp.asarray(rng.normal(size=(c, c)), jnp.float32) * 0.05,
        bproj=jnp.zeros((c,)),
        w1=jnp.asarray(rng.normal(size=(c, 2 * c)), jnp.float32) * 0.05,
        b1=jnp.zeros((2 * c,)),
        w2=jnp.asarray(rng.normal(size=(2 * c, c)), jnp.float32) * 0.05,
        b2=jnp.zeros((c,)),
        bias=jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32) * 0.1)
    return timeit(lambda a, b: fused_hab_block(
        a, b, args["ln1_w"], args["ln1_b"], args["ln2_w"], args["ln2_b"],
        args["wqkv"], args["bqkv"], args["wproj"], args["bproj"],
        args["w1"], args["b1"], args["w2"], args["b2"], args["bias"], None,
        (ws, ws), nh, 0.01), x, cx)


def k_naf(stage):
    from freqfusion_tpu.ops.pallas.nafblock import (naf_block_stage_a,
                                                    naf_block_stage_b)
    rng = np.random.default_rng(0)
    c = 64
    x = jnp.asarray(rng.normal(size=(2, 768, 768, c)), jnp.float32) * 0.3
    if stage == "a":
        return timeit(lambda t: naf_block_stage_a(
            t, jnp.ones((c,)), jnp.zeros((c,)),
            jnp.asarray(rng.normal(size=(1, 1, c, 2 * c)), jnp.float32) * 0.05,
            jnp.zeros((2 * c,)),
            jnp.asarray(rng.normal(size=(3, 3, 1, 2 * c)), jnp.float32) * 0.1,
            jnp.zeros((2 * c,))), x)
    att = jnp.ones((2, 1, 1, c))
    return timeit(lambda g, t: naf_block_stage_b(
        g, t, att,
        jnp.asarray(rng.normal(size=(1, 1, c, c)), jnp.float32) * 0.05,
        jnp.zeros((c,)), jnp.zeros((c,)), jnp.ones((c,)), jnp.zeros((c,)),
        jnp.asarray(rng.normal(size=(1, 1, c, 2 * c)), jnp.float32) * 0.05,
        jnp.zeros((2 * c,)),
        jnp.asarray(rng.normal(size=(1, 1, c, c)), jnp.float32) * 0.05,
        jnp.zeros((c,)), jnp.zeros((c,))), x, x)


def k_xqkv():
    """DAT spatial branch at the whole-image bench shape (one 8x32 branch)."""
    from freqfusion_tpu.ops.pallas.wattn import fused_window_attention_xqkv
    rng = np.random.default_rng(0)
    cin, co, nh, wsh, wsw = 180, 90, 3, 8, 32
    n = wsh * wsw
    x = jnp.asarray(rng.normal(size=(1, 352, 512, cin)), jnp.float32) * 0.3
    wqkv = jnp.asarray(rng.normal(size=(cin, 3 * co)), jnp.float32) * 0.05
    bias = jnp.asarray(rng.normal(size=(nh, n, n)), jnp.float32) * 0.1
    return timeit(lambda a: fused_window_attention_xqkv(
        a, wqkv, jnp.zeros((3 * co,)), bias, None, (wsh, wsw), nh), x)


def k_bandmha():
    from freqfusion_tpu.ops.pallas.bandmha import fused_band_mha
    rng = np.random.default_rng(0)
    t, d, nh = 9, 64, 4
    x = jnp.asarray(rng.normal(size=(2, 192, 192, t, d)), jnp.float32) * 0.3
    return timeit(lambda a: fused_band_mha(
        a, jnp.asarray(rng.normal(size=(d, 3 * d)), jnp.float32) * 0.05,
        jnp.zeros((3 * d,)),
        jnp.asarray(rng.normal(size=(d, d)), jnp.float32) * 0.05,
        jnp.zeros((d,)), jnp.ones((d,)), jnp.zeros((d,)), nh), x)


KERNELS = {
    "sgfn": k_sgfn,
    "hab": k_hab,
    "nafA": lambda: k_naf("a"),
    "nafB": lambda: k_naf("b"),
    "bandmha": k_bandmha,
    "xqkv": k_xqkv,
}


def main():
    names = sys.argv[1:] or list(KERNELS)
    for n in names:
        try:
            compile_s, ms = KERNELS[n]()
            print(json.dumps({"kernel": n, "compile_s": round(compile_s, 1),
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": n, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
