#!/usr/bin/env python
"""Component-level TPU timing probes for the round-2 kernel work.

Small jits (fast compiles) that isolate where HAT-L's device time goes
(PERF.md: 732 ms/call at tile 192², batch 2 — 50% of the pipeline):

  matmul.*    lane-padding cost of the C=180 embed vs 192/256
  wattn.*     the window-attention chain (LN→qkv→partition→MHA→reverse→proj)
  parts.*     window partition/reverse + roll data movement alone
  hab.*       one full HAB block f32 vs bf16
  cab.*       the CAB conv branch
  naf.*       NAFNet block at width 64 vs 128

Run ON TPU (no JAX_PLATFORMS override): `python scripts/profile_tpu.py`.
Each probe prints one JSON line immediately (partial results survive
timeouts). Results feed PERF.md and the Pallas window-attention design.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, warmup=2, iters=5, chain=4):
    """Times `chain` dependent applications of fn, fetching a scalar at the
    end (block_until_ready under-blocks on the axon tunnel backend — a
    device→host scalar readback is the only reliable fence)."""

    @jax.jit
    def chained(*a):
        tot = jnp.float32(0.0)
        for i in range(chain):
            scale = jnp.asarray(1.0 + 1e-6 * i, a[0].dtype)
            out = fn(a[0] * scale, *a[1:])  # distinct consts defeat CSE
            first = out[0] if isinstance(out, tuple) else out
            tot = tot + jnp.sum(first.astype(jnp.float32))
        return tot

    for _ in range(warmup):
        float(chained(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000 / chain)


def report(name, ms, **extra):
    print(json.dumps({"probe": name, "ms": round(ms, 3), **extra}), flush=True)


def probe_matmul(dtype):
    """[HW·B, C] @ [C, 3C] — the qkv projection contraction at each embed."""
    n = 2 * 192 * 192
    for c in (180, 192, 256):
        x = jnp.ones((n, c), dtype)
        w = jnp.ones((c, 3 * c), dtype)
        ms = timeit(lambda a, b: a @ b, x, w, chain=16)
        flops = 2 * n * c * 3 * c
        report(f"matmul.c{c}.{dtype}", ms,
               tflops=round(flops / ms / 1e9, 2))


def _wattn(x, wqkv, wproj, table, num_heads, window):
    from freqfusion_tpu.ops import windows as W
    b, h, w, c = x.shape
    hd = c // num_heads
    n = window * window
    wins = W.window_partition(x, window, window)          # [B*nW, n, C]
    qkv = wins @ wqkv
    bw = wins.shape[0]
    qkv = qkv.reshape(bw, n, 3, num_heads, hd)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                      preferred_element_type=jnp.float32)
    rpi = W.relative_position_index(window, window).reshape(-1)
    bias = table[rpi].reshape(n, n, num_heads)
    attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bw, n, c).astype(x.dtype)
    out = out @ wproj
    return W.window_reverse(out, window, window, h, w)


def probe_wattn(dtype):
    """Full W-MSA chain at HAT-L geometry (192² tile, window 16)."""
    for c, heads in ((180, 6), (192, 6), (256, 8)):
        x = jnp.ones((2, 192, 192, c), dtype)
        wqkv = jnp.ones((c, 3 * c), dtype)
        wproj = jnp.ones((c, c), dtype)
        table = jnp.ones(((2 * 16 - 1) ** 2, heads), dtype)
        f = functools.partial(_wattn, num_heads=heads, window=16)
        ms = timeit(f, x, wqkv, wproj, table)
        report(f"wattn.c{c}.{dtype}", ms)


def probe_parts(dtype):
    """Window partition + reverse + roll only — pure data movement."""
    from freqfusion_tpu.ops import windows as W

    def f(x):
        s = jnp.roll(x, (-8, -8), axis=(1, 2))
        wins = W.window_partition(s, 16, 16)
        y = W.window_reverse(wins * 1.0001, 16, 16, x.shape[1], x.shape[2])
        return jnp.roll(y, (8, 8), axis=(1, 2))

    for c in (180, 192):
        x = jnp.ones((2, 192, 192, c), dtype)
        ms = timeit(f, x, chain=8)
        report(f"parts.c{c}.{dtype}", ms)


def probe_hab(dtype):
    """One full HAB block (attention + CAB + MLP) at HAT-L config."""
    from freqfusion_tpu.models.hat import HAB
    for c, heads in ((180, 6), (192, 6)):
        m = HAB(dim=c, num_heads=heads, window=16, shift=8, compress=3,
                squeeze=30, conv_scale=0.01, mlp_ratio=2.0)
        x = jnp.ones((2, 192, 192, c), dtype)
        params = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        ms = timeit(lambda a, p: m.apply(p, a), x, params)
        report(f"hab.c{c}.{dtype}", ms)


def probe_cab(dtype):
    from freqfusion_tpu.models.hat import CAB
    for c in (180, 192):
        m = CAB(features=c, compress=3, squeeze=30)
        x = jnp.ones((2, 192, 192, c), dtype)
        params = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        ms = timeit(lambda a, p: m.apply(p, a), x, params)
        report(f"cab.c{c}.{dtype}", ms)


def probe_naf(dtype):
    from freqfusion_tpu.models.nafnet import NAFBlock
    for w_ in (64, 128):
        m = NAFBlock(c=w_)
        x = jnp.ones((2, 256, 256, w_), dtype)
        params = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        ms = timeit(lambda a, p: m.apply(p, a), x, params)
        report(f"naf.w{w_}.{dtype}", ms)


def probe_mlp_ln(dtype):
    """LayerNorm + 2-layer MLP at each embed (the other half of a HAB)."""
    n = 2 * 192 * 192
    for c in (180, 192):
        x = jnp.ones((n, c), dtype)
        w1 = jnp.ones((c, 2 * c), dtype)
        w2 = jnp.ones((2 * c, c), dtype)

        def f(a, b1, b2):
            m = a.mean(-1, keepdims=True)
            v = jnp.square(a - m).mean(-1, keepdims=True)
            h = (a - m) * jax.lax.rsqrt(v + 1e-5)
            return jax.nn.gelu(h @ b1) @ b2

        ms = timeit(f, x, w1, w2, chain=16)
        report(f"mlp_ln.c{c}.{dtype}", ms)


PROBES = {
    "matmul": probe_matmul,
    "mlp_ln": probe_mlp_ln,
    "parts": probe_parts,
    "wattn": probe_wattn,
    "cab": probe_cab,
    "hab": probe_hab,
    "naf": probe_naf,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    dtypes = ("float32", "bfloat16")
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for name in names:
        for dt in dtypes:
            try:
                t0 = time.time()
                PROBES[name](dt)
                report(f"{name}.{dt}.total_wall", (time.time() - t0) * 1000)
            except Exception as e:  # keep going; partial data is still data
                print(json.dumps({"probe": f"{name}.{dt}", "error": str(e)[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
