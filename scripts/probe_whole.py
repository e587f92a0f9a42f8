#!/usr/bin/env python
"""Per-component timing at the WHOLE-IMAGE bench shape (352x512, b1).

The r2 component table was measured at 192^2 b2 tiles; the whole-image
protocol runs ~2.3x worse per pixel than that table predicts. This probe
times each expert and the full model at the exact bench shape to locate
the regression. Usage:
  python scripts/probe_whole.py [hat dat nafnet full ...] [--dtype=float32]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.utils.runtime import (enable_compilation_cache,
                                          fast_random_variables)

import os
B = int(os.environ.get("PROBE_B", "1"))
H = int(os.environ.get("PROBE_H", "352"))
W = int(os.environ.get("PROBE_W", "512"))


def _fence(out):
    # block_until_ready is a no-op on the remote backend — fence with a
    # device→host scalar readback (PERF.md measurement methodology)
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first.astype(jnp.float32)))


def timeit(fn, v, x, n=6):
    t0 = time.time()
    _fence(fn(v, x))
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _fence(fn(v, x))
        ts.append(time.perf_counter() - t0)
    return compile_s, float(np.median(ts) * 1000)


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    dtype = jnp.float32
    for a in sys.argv[1:]:
        if a.startswith("--dtype="):
            dtype = jnp.dtype(a.split("=")[1])
    names = names or ["hat", "dat", "nafnet", "full"]
    enable_compilation_cache()
    use_pallas = "--pallas=0" not in sys.argv

    x = jnp.asarray(np.random.default_rng(0).uniform(size=(B, H, W, 3)),
                    dtype)
    for name in names:
        if name == "hat":
            from freqfusion_tpu.models.hat import HAT
            model = HAT(use_pallas=use_pallas)
        elif name == "dat":
            from freqfusion_tpu.models.dat import DAT
            model = DAT(use_pallas=use_pallas)
        elif name == "nafnet":
            from freqfusion_tpu.models.nafnet import NAFNetSR
            model = NAFNetSR(use_pallas=use_pallas)
        elif name == "full":
            from freqfusion_tpu.models.experts import FreqFusionSR
            from freqfusion_tpu.models.fusion import FusionConfig
            k = dict(use_pallas=True)
            model = FreqFusionSR(FusionConfig(use_pallas=True),
                                 hat_kwargs=k, dat_kwargs=k, nafnet_kwargs=k)
        else:
            raise ValueError(name)
        v = fast_random_variables(model, x)
        v = jax.device_put(jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and a.dtype == np.float32 else a, v),
            jax.devices()[0])
        if os.environ.get("PROBE_SUM") == "1":
            # in-jit scalar reduction (bench_hat_full methodology): outputs
            # never materialize in HBM; float() on the result fences
            def fn(vv, xx, m=model):
                out = m.apply(vv, xx)
                leaves = jax.tree_util.tree_leaves(out)
                return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        else:
            fn = jax.jit(lambda vv, xx, m=model: m.apply(vv, xx))
        fn = jax.jit(fn)
        compile_s, ms = timeit(fn, v, x)
        print(json.dumps({"component": name, "shape": [B, H, W, 3],
                          "dtype": str(np.dtype(dtype)),
                          "compile_s": round(compile_s, 1),
                          "ms_per_call": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
