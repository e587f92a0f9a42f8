#!/usr/bin/env python
"""Fusion-head cost decomposition: time the jitted FusionHead at bench shapes
with each enable-flag toggled off; the delta vs the full config is that
component's cost. Single-dispatch timings with device→host fence (the ~29 ms
dispatch overhead cancels in the deltas).

Usage: python scripts/probe_head.py [dtype] [tile] [batch]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.fusion import FusionConfig, FusionHead  # noqa: E402


def time_fn(fn, *args, iters=5):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)))  # compile
    float(jnp.sum(f(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))  # fence via scalar readback
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hr = tile * 4

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(size=(b, tile, tile, 3)), dtype)
    experts = {k: jnp.asarray(rng.uniform(size=(b, hr, hr, 3)), dtype)
               for k in ("hat", "dat", "nafnet")}
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": dtype, "tile": tile, "batch": b}), flush=True)

    variants = {
        "full": {},
        "no_cross_band": dict(enable_cross_band_attn=False),
        "no_lka": dict(enable_lka=False),
        "no_multi_domain": dict(enable_multi_domain_freq=False),
        "no_hierarchical": dict(enable_hierarchical=False,
                                enable_multi_resolution=True),
        "no_dynamic": dict(enable_dynamic_selection=False),
        "no_edge": dict(enable_edge_enhance=False),
        "no_pallas": dict(use_pallas=False),
        "minimal": dict(enable_cross_band_attn=False, enable_lka=False,
                        enable_multi_domain_freq=False,
                        enable_hierarchical=False,
                        enable_multi_resolution=False,
                        enable_dynamic_selection=False,
                        enable_edge_enhance=False),
    }
    base = None
    for name, overrides in variants.items():
        try:
            cfg = FusionConfig(**overrides)
            head = FusionHead(cfg)
            with jax.default_device(jax.devices()[0]):
                v = head.init(jax.random.PRNGKey(0), lr, experts)
            v = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, v)
            ms = time_fn(lambda vv, l, e: head.apply(vv, l, e), v, lr, experts)
            rec = {"variant": name, "ms": round(ms, 1)}
            if name == "full":
                base = ms
            elif base is not None:
                rec["delta_vs_full_ms"] = round(base - ms, 1)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
