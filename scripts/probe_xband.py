#!/usr/bin/env python
"""Cross-band module internals: where do EnhancedCrossBandWithLKA's ~44 ms
go at bench shapes (9 bands × [2,192,192,3])?  Times the full module, the
per-pixel band MHA alone, the folded LKA block alone, and the projection.

Usage: python scripts/probe_xband.py [dtype]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.layers import TorchMHA  # noqa: E402
from freqfusion_tpu.models.lka import (  # noqa: E402
    EnhancedCrossBandWithLKA, LKABlock)


def time_fn(fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(first))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    b, s, d, nb = 2, 192, 64, 9
    rng = np.random.default_rng(0)
    bands = [jnp.asarray(rng.uniform(size=(b, s, s, 3)), dtype)
             for _ in range(nb)]
    print(json.dumps({"devices": [str(dv) for dv in jax.devices()],
                      "dtype": dtype}), flush=True)

    mod = EnhancedCrossBandWithLKA(dim=d, num_bands=nb, num_heads=4)
    v = mod.init(jax.random.PRNGKey(0), [x[:1, :16, :16] for x in bands])
    ms = time_fn(lambda vv, bs: mod.apply(vv, bs), v, bands)
    print(json.dumps({"probe": "cross_band_full", "ms": round(ms, 1)}),
          flush=True)

    x5 = jnp.asarray(rng.uniform(size=(b, s, s, nb, d)), dtype)
    mha = TorchMHA(d, 4)
    vm = mha.init(jax.random.PRNGKey(1), x5[:1, :8, :8])
    ms = time_fn(lambda vv, t: mha.apply(vv, t), vm, x5)
    print(json.dumps({"probe": "band_mha_alone", "ms": round(ms, 1)}),
          flush=True)

    xf = jnp.asarray(rng.uniform(size=(nb * b, s, s, d)), dtype)
    lka = LKABlock(d)
    vl = lka.init(jax.random.PRNGKey(2), xf[:1, :32, :32])
    ms = time_fn(lambda vv, t: lka.apply(vv, t), vl, xf)
    print(json.dumps({"probe": "lka_block_folded", "ms": round(ms, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
