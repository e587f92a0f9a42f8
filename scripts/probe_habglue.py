#!/usr/bin/env python
"""Decompose the in-model HAB glue at the whole-image bench shape.

probe_marginal (r4) measured the in-model fused-path HAB at ~12.7 ms bf16
while its known parts sum to ~5.5 (kernel 3.4 + CAB 1.5 + LN/rolls); this
probe times each glue candidate in isolation with the distinct-params
chain methodology:
  bias    — swin_bias_from_table(table) per call (runs in-jit per HAB)
  ocabias — oca_bias_from_table per call
  lncab   — apply_ln + CAB (conv chain + channel attention)
  rolls   — the 3 shift rolls
  kernel  — fused_hab_block with PREBUILT bias (the habparts number)
  kernel_bias — fused_hab_block + in-jit bias build (the in-model shape)

Usage: python scripts/probe_habglue.py [dtype]
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


def timeit(make_fn, inputs, n1=2, n2=8, iters=5):
    """Chain k distinct-input applications; (T2-T1)/(n2-n1) per call."""
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
    k = jax.random.PRNGKey
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": str(dtype)}), flush=True)

    def tables(n):
        return [(jax.random.normal(k(i), ((2 * WS - 1) ** 2, NH)) * 0.1,)
                for i in range(n)]

    def imgs(n):
        return [((jax.random.normal(k(100 + i), (B, H, WW, C)) * 0.2
                  ).astype(dtype),) for i in range(n)]

    which = set(sys.argv[2:])

    def go(name, fn, inputs, **kw):
        if which and name not in which:
            return
        try:
            ms, cs = timeit(fn, inputs, **kw)
            print(json.dumps({"probe": f"{name}.{dtype}", "ms": round(ms, 3),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)

    go("bias", lambda t: W.swin_bias_from_table(t, WS, WS), tables)
    go("ocabias", lambda t: W.oca_bias_from_table(t, WS, WS + WS // 2),
       lambda n: [(jax.random.normal(k(i), ((2 * WS + WS // 2 - 1) ** 2, NH))
                   * 0.1,) for i in range(n)])

    from freqfusion_tpu.models.hat import CAB
    cab = CAB(C, 3, 30)
    cv = cab.init(k(0), jnp.zeros((1, 2 * WS, 2 * WS, C), dtype))
    # serving casts the whole param tree to the serving dtype — f32 weights
    # here would promote every conv to f32 whole-image converts (seen in the
    # r4 HLO dump) and misstate the composition cost
    cv = jax.tree_util.tree_map(lambda a: a.astype(dtype), cv)

    def lncab(x):
        m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
        v = jnp.mean(jnp.square(x.astype(jnp.float32) - m), -1, keepdims=True)
        ln = ((x - m) * jax.lax.rsqrt(v + 1e-5)).astype(dtype)
        return cab.apply(cv, ln)

    go("lncab", lncab, imgs, n1=1, n2=4)
    go("rolls", lambda x: jnp.roll(jnp.roll(x, (-8, -8), (1, 2)) * 1.0001,
                                   (8, 8), (1, 2)), imgs, n1=1, n2=4)

    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block
    mask = np.asarray(W.shift_attn_mask(H, WW, WS, WS, 8, 8))

    def mk_hab_inputs(n):
        out = []
        for i in range(n):
            kk = lambda j: k(1000 * i + j)
            out.append((
                (jax.random.normal(kk(0), (B, H, WW, C)) * 0.2).astype(dtype),
                (jax.random.normal(kk(1), (B, H, WW, C)) * 0.2).astype(dtype),
                jax.random.normal(kk(2), ((2 * WS - 1) ** 2, NH)) * 0.1,
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

    ln1 = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32))

    def hab_prebuilt(x, cx, table, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
        bias = jax.random.normal(k(7), (NH, N, N)) * 0.1  # constant-folded
        return fused_hab_block(x, cx, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                               w1, b1, w2, b2, bias, mask, (WS, WS), NH, 0.01)

    def hab_inbias(x, cx, table, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
        bias = W.swin_bias_from_table(table, WS, WS)
        return fused_hab_block(x, cx, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                               w1, b1, w2, b2, bias, mask, (WS, WS), NH, 0.01)

    go("kernel", hab_prebuilt, mk_hab_inputs, n1=1, n2=4)
    go("kernel_bias", hab_inbias, mk_hab_inputs, n1=1, n2=4)

    # --- composed probes: the EXACT in-model fused-HAB sequence
    # (hat.py:199-216) from raw params, to bisect the in-model 13.3 ms vs
    # 6.7 ms parts-sum gap (probe_marginal hab_pallas vs the probes above)
    def composed(x, cx_unused, table, wqkv, bqkv, wproj, bproj,
                 w1, b1, w2, b2, shift=8):
        cx = lncab(x)
        bias = W.swin_bias_from_table(table, WS, WS)
        xs, cxs = x, cx
        if shift:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
            cxs = jnp.roll(cxs, (-shift, -shift), axis=(1, 2))
        out = fused_hab_block(xs, cxs, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                              w1, b1, w2, b2, bias,
                              mask if shift else None, (WS, WS), NH, 0.01)
        return jnp.roll(out, (shift, shift), axis=(1, 2)) if shift else out

    go("composed", composed, mk_hab_inputs, n1=1, n2=4)
    go("composed_noshift",
       lambda *a: composed(*a, shift=0), mk_hab_inputs, n1=1, n2=4)
    # rolls + kernel with an INDEPENDENT cab input (no LN/CAB on the
    # critical path): isolates roll/layout interaction with the kernel
    def kernel_roll(x, cx, table, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
        bias = W.swin_bias_from_table(table, WS, WS)
        xs = jnp.roll(x, (-8, -8), axis=(1, 2))
        cxs = jnp.roll(cx, (-8, -8), axis=(1, 2))
        out = fused_hab_block(xs, cxs, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                              w1, b1, w2, b2, bias, mask, (WS, WS), NH, 0.01)
        return jnp.roll(out, (8, 8), axis=(1, 2))

    go("kernel_roll", kernel_roll, mk_hab_inputs, n1=1, n2=4)

    # finer bisection of the composed-LN+CAB cost (6.8 ms vs 2.5 standalone):
    # pass   — cx := x (dual consumption, zero extra compute)
    # lnonly — cx := LN(x) (adds the f32 LN)
    # cabnoln— cx := CAB(x) (adds the convs, no LN)
    def _composed_cx(cx_fn):
        def f(x, cxu, table, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
            bias = W.swin_bias_from_table(table, WS, WS)
            return fused_hab_block(x, cx_fn(x), *ln1, *ln1, wqkv, bqkv,
                                   wproj, bproj, w1, b1, w2, b2, bias, None,
                                   (WS, WS), NH, 0.01)
        return f

    def _ln(x):
        m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
        v = jnp.mean(jnp.square(x.astype(jnp.float32) - m), -1, keepdims=True)
        return ((x - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)

    go("composed_pass", _composed_cx(lambda x: x), mk_hab_inputs, n1=1, n2=4)
    go("composed_lnonly", _composed_cx(_ln), mk_hab_inputs, n1=1, n2=4)
    go("composed_cabnoln", _composed_cx(lambda x: cab.apply(cv, x)),
       mk_hab_inputs, n1=1, n2=4)

    # r4 finding: CAB-in-composition costs ~6.9 ms vs 2.6 standalone — the
    # conv↔pallas interface. Try the alternative lowerings IN COMPOSITION
    # (probe_cab measured them XLA-to-XLA, where native conv wins):
    import os
    for impl in ("shift9", "im2col", "cnmajor"):
        os.environ["FREQFUSION_CAB_IMPL"] = impl
        go(f"composed_cabnoln_{impl}",
           _composed_cx(lambda x: cab.apply(cv, x)), mk_hab_inputs,
           n1=1, n2=4)
        os.environ.pop("FREQFUSION_CAB_IMPL", None)

    # --- r4 fix candidate: CAB as a Pallas kernel (ops/pallas/cab.py),
    # CA gate applied in-kernel via fused_hab_block's cab_scale operand —
    # pallas→pallas boundaries compose free (composed_pass/lnonly above)
    from freqfusion_tpu.ops.pallas.cab import cab_chain
    cp = cv["params"]
    cargs = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
             cp["conv1"]["kernel"], cp["conv1"]["bias"],
             cp["conv2"]["kernel"], cp["conv2"]["bias"])
    caw1 = cp["ca"]["fc1"]["kernel"].reshape(C, -1)
    cab1 = cp["ca"]["fc1"]["bias"]
    caw2 = cp["ca"]["fc2"]["kernel"].reshape(-1, C)
    cab2 = cp["ca"]["fc2"]["bias"]

    go("cabkernel", lambda x: cab_chain(x, *cargs)[0], imgs, n1=1, n2=4)

    def composed_cabkernel(x, cxu, table, wqkv, bqkv, wproj, bproj,
                           w1, b1, w2, b2, shift=8):
        u, sums = cab_chain(x, *cargs)
        pooled = sums / (H * WW)
        mid = jax.nn.relu(jnp.einsum("bxyc,cd->bxyd", pooled, caw1) + cab1)
        gate = jax.nn.sigmoid(jnp.einsum("bxyc,cd->bxyd", mid, caw2) + cab2)
        bias = W.swin_bias_from_table(table, WS, WS)
        xs, cxs = x, u
        if shift:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
            cxs = jnp.roll(cxs, (-shift, -shift), axis=(1, 2))
        out = fused_hab_block(xs, cxs, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                              w1, b1, w2, b2, bias,
                              mask if shift else None, (WS, WS), NH, 0.01,
                              cab_scale=gate)
        return jnp.roll(out, (shift, shift), axis=(1, 2)) if shift else out

    go("composed_cabkernel", composed_cabkernel, mk_hab_inputs, n1=1, n2=4)
    go("composed_cabkernel_noshift",
       lambda *a: composed_cabkernel(*a, shift=0), mk_hab_inputs, n1=1, n2=4)

    def composed_cabkernel_oshift(x, cxu, table, wqkv, bqkv, wproj, bproj,
                                  w1, b1, w2, b2):
        # the CAB-branch roll folded into the kernel store (out_shift)
        u, sums = cab_chain(x, *cargs, out_shift=8)
        pooled = sums / (H * WW)
        mid = jax.nn.relu(jnp.einsum("bxyc,cd->bxyd", pooled, caw1) + cab1)
        gate = jax.nn.sigmoid(jnp.einsum("bxyc,cd->bxyd", mid, caw2) + cab2)
        bias = W.swin_bias_from_table(table, WS, WS)
        xs = jnp.roll(x, (-8, -8), axis=(1, 2))
        out = fused_hab_block(xs, u, *ln1, *ln1, wqkv, bqkv, wproj, bproj,
                              w1, b1, w2, b2, bias, mask, (WS, WS), NH, 0.01,
                              cab_scale=gate)
        return jnp.roll(out, (8, 8), axis=(1, 2))

    go("composed_cabkernel_oshift", composed_cabkernel_oshift,
       mk_hab_inputs, n1=1, n2=4)


if __name__ == "__main__":
    main()
