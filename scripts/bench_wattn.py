#!/usr/bin/env python
"""TPU benchmark: fused Pallas window attention vs the XLA chain, and the
full HAB block with/without the kernel. Run on TPU."""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.hat import HAB, WindowAttention  # noqa: E402
from freqfusion_tpu.ops import windows as W  # noqa: E402
from freqfusion_tpu.ops.pallas.wattn import fused_window_attention  # noqa: E402


def timeit(fn, *args, warmup=2, iters=5, chain=8):
    @jax.jit
    def chained(*a):
        tot = jnp.float32(0.0)
        for i in range(chain):
            scale = jnp.asarray(1.0 + 1e-6 * i, a[0].dtype)
            out = fn(a[0] * scale, *a[1:])
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


def bench_wattn_kernel(dtype, c=180, nh=6, window=16, hw=192, b=2,
                       with_mask=False):
    x = (jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c)) * 0.2).astype(dtype)
    wqkv = (jax.random.normal(jax.random.PRNGKey(1), (c, 3 * c)) * 0.05).astype(dtype)
    bqkv = jnp.zeros((3 * c,), dtype)
    wproj = (jax.random.normal(jax.random.PRNGKey(2), (c, c)) * 0.05).astype(dtype)
    bproj = jnp.zeros((c,), dtype)
    n = window * window
    bias = jax.random.normal(jax.random.PRNGKey(3), (nh, n, n)) * 0.1
    mask = (W.shift_attn_mask(hw, hw, window, window, window // 2, window // 2)
            if with_mask else None)
    tag = f"c{c}.{'mask' if with_mask else 'nomask'}.{dtype}"

    for align, max_gh in ((32, 4), (32, 8), (0, 4)):
        f = functools.partial(fused_window_attention, mask=mask,
                              window=(window, window), num_heads=nh,
                              align=align, max_gh=max_gh)
        try:
            ms = timeit(lambda *a: f(*a), x, wqkv, bqkv, wproj, bproj, bias)
            report(f"wattn_pallas.a{align}g{max_gh}.{tag}", ms)
        except Exception as e:
            print(json.dumps({"probe": f"wattn_pallas.a{align}g{max_gh}.{tag}",
                              "error": str(e)[:300]}), flush=True)

    def xla(x, wqkv, bqkv, wproj, bproj, bias):
        hd = c // nh
        xw = W.window_partition(x, window, window)
        bw = xw.shape[0]
        qkv = (xw @ wqkv + bqkv).reshape(bw, n, 3, nh, hd)
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bw, n, c).astype(x.dtype)
        return W.window_reverse(out @ wproj + bproj, window, window, hw, hw)

    ms = timeit(xla, x, wqkv, bqkv, wproj, bproj, bias)
    report(f"wattn_xla.{tag}", ms)


def bench_hab(dtype, use_pallas, c=180, nh=6, window=16, hw=192, b=2, shift=8):
    m = HAB(dim=c, num_heads=nh, window=window, shift=shift, compress=3,
            squeeze=30, conv_scale=0.01, mlp_ratio=2.0, use_pallas=use_pallas)
    x = jnp.ones((b, hw, hw, c), dtype)
    params = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    ms = timeit(lambda a, p: m.apply(p, a), x, params, chain=4)
    report(f"hab.{'pallas' if use_pallas else 'xla'}.shift{shift}.{dtype}", ms)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for dt in ("float32", "bfloat16"):
        for with_mask in (False, True):
            bench_wattn_kernel(dt, with_mask=with_mask)
    for dt in ("float32", "bfloat16"):
        for up in (False, True):
            for shift in (0, 8):
                try:
                    bench_hab(dt, up, shift=shift)
                except Exception as e:
                    print(json.dumps({"probe": f"hab.{up}.{shift}.{dt}",
                                      "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
