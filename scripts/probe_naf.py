#!/usr/bin/env python
"""NAFNetSR section costs: time config variants at bench shapes; deltas vs
full isolate the UNet levels, middle stack, and the bicubic pre-upsample.
Single-dispatch timings with scalar-readback fence (the ~29 ms dispatch
overhead cancels in deltas).

Usage: python scripts/probe_naf.py [dtype] [tile] [batch]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.nafnet import NAFNetSR  # noqa: E402
from freqfusion_tpu.ops.resize import upsample  # noqa: E402


def time_fn(fn, *args, iters=5):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)[0]))
    float(jnp.sum(f(*args)[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(b, tile, tile, 3)), dtype)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": dtype, "tile": tile, "batch": b}), flush=True)

    variants = {
        "full": {},
        "no_middle": dict(middle_blk_num=0),
        "no_enc0_dec3_blocks": dict(enc_blk_nums=(0, 2, 4, 8),
                                    dec_blk_nums=(2, 2, 2, 0)),
        "no_blocks_at_all": dict(middle_blk_num=0,
                                 enc_blk_nums=(0, 0, 0, 0),
                                 dec_blk_nums=(0, 0, 0, 0)),
    }
    base = None
    for name, overrides in variants.items():
        model = NAFNetSR(**overrides)
        v = model.init(jax.random.PRNGKey(0), lr[:1, :8, :8])
        v = jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, v)
        ms = time_fn(lambda vv, l: model.apply(vv, l), v, lr)
        rec = {"variant": name, "ms": round(ms, 1)}
        if name == "full":
            base = ms
        elif base is not None:
            rec["delta_vs_full_ms"] = round(base - ms, 1)
        print(json.dumps(rec), flush=True)

    # bicubic ×4 upsample alone
    f = jax.jit(lambda t: (upsample(t, 4, "bicubic"),))
    float(jnp.sum(f(lr)[0]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(f(lr)[0]))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"variant": "bicubic_upsample_only",
                      "ms": round(float(np.median(ts) * 1000), 1)}), flush=True)


if __name__ == "__main__":
    main()
