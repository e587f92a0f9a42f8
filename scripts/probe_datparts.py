#!/usr/bin/env python
"""Marginal per-part costs of a DAT block at the whole-image bench shape.

DAT is ~690 ms of the 2440 ms whole-image forward (f32, PERF.md r3 table);
this decomposes one spatial + one channel block into LN/qkv/attention/AIM/
SGFN parts with the n-vs-2n distinct-params methodology (probe_marginal.py)
to find what the next kernel should fuse. Reference for the block anatomy:
/root/reference/src/models/dat/dat_arch.py:347-666.

Usage: python scripts/probe_datparts.py [dtype] [probe ...]
Env: PROBE_H/PROBE_W (default 352x512), PROBE_B (1).
"""

import json
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-registers the TPU platform even under
    # JAX_PLATFORMS=cpu; the config override must land before first use
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.dat import (  # noqa: E402
    DATB, AdaptiveSpatialAttention, AdaptiveChannelAttention, SGFN)
import flax.linen as nn  # noqa: E402


def time_once(fn, *args, iters=5):
    f = jax.jit(fn)
    float(f(*args))
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def marginal(make_module, x, n1=2, n2=6):
    m = make_module()
    plist = [m.init(jax.random.PRNGKey(i), x) for i in range(n2)]
    plist = jax.tree_util.tree_map(lambda a: a.astype(x.dtype), plist)

    def run(k):
        def fn(x0, ps):
            y = x0
            for i in range(k):
                y = m.apply(ps[i], y)
                y = y[0] if isinstance(y, tuple) else y
            return jnp.sum(y.astype(jnp.float32))
        return time_once(fn, x, plist[:k])

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1), t1, t2


class _QKV(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        q, k, v = jnp.split(nn.Dense(3 * self.c, name="qkv")(x), 3, axis=-1)
        return q + k + v  # keep all three live


class _LN(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    which = set(sys.argv[2:])
    b = int(os.environ.get("PROBE_B", "1"))
    h = int(os.environ.get("PROBE_H", "352"))
    w = int(os.environ.get("PROBE_W", "512"))
    c, heads, split = 180, 6, (8, 32)
    x = (jax.random.normal(jax.random.PRNGKey(9), (b, h, w, c)) * 0.2
         ).astype(dtype)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": dtype, "shape": list(x.shape)}), flush=True)

    probes = {
        # whole blocks, XLA vs kernels
        "datb_sp": lambda: DATB(c, heads, split, 4.0, True, False),
        "datb_sp_pallas": lambda: DATB(c, heads, split, 4.0, True, False,
                                       use_pallas=True),
        "datb_sp_shift_pallas": lambda: DATB(c, heads, split, 4.0, True,
                                             True, use_pallas=True),
        "datb_ch_pallas": lambda: DATB(c, heads, split, 4.0, False, False,
                                       use_pallas=True),
        # parts
        "ln": lambda: _LN(c),
        "qkv": lambda: _QKV(c),
        "attn_sp_pallas": lambda: AdaptiveSpatialAttention(
            c, heads, split, (4, 16), False, use_pallas=True),
        "attn_ch_pallas": lambda: AdaptiveChannelAttention(
            c, heads, use_pallas=True),
        "sgfn": lambda: SGFN(c, int(c * 4.0)),
    }
    for name, mk in probes.items():
        if which and name not in which:
            continue
        try:
            per, t1, t2 = marginal(mk, x)
            print(json.dumps({"probe": name, "marginal_ms": round(per, 2),
                              "t_n1": round(t1, 1), "t_n2": round(t2, 1)}),
                  flush=True)
        except Exception as e:  # keep probing the rest
            print(json.dumps({"probe": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
