#!/usr/bin/env python
"""NAFNet non-block ('glue') cost attribution (r5): probe_nafparts put the
UNet blocks at ~185 ms of NAFNet's 349 ms whole-image cost — this times
what the block probes can't see: the bicubic ×4 pre-upsample, intro/ending
3×3 convs at HR, the strided down / pixel-shuffle up convs, and the skip
adds, each as an n-vs-2n marginal or a direct jit where marginal doesn't
apply. Reference anatomy: nafnet/__init__.py:117-139 + nafnet_arch.py.

Usage: python scripts/probe_nafglue.py [dtype] [probe ...]
Env: PROBE_H/PROBE_W (default 352x512 LR -> 1408x2048 HR).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from freqfusion_tpu.utils.runtime import (enable_compilation_cache,
                                              wait_for_backend)
    enable_compilation_cache()
    wait_for_backend()

    from freqfusion_tpu.ops.resize import upsample
    from freqfusion_tpu.ops.common import pixel_shuffle

    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        sys.argv[1] if len(sys.argv) > 1 else "bfloat16"]
    names = sys.argv[2:] or ["bicubic_up", "intro", "ending", "downs",
                             "ups", "fullnaf", "blocksum_check"]
    lh = int(os.environ.get("PROBE_H", "352"))
    lw = int(os.environ.get("PROBE_W", "512"))
    h, w = 4 * lh, 4 * lw
    rng = np.random.default_rng(0)

    def mk(shape, dtype=None):
        return jnp.asarray(rng.uniform(size=shape), dtype or dt)

    def timeit(name, fn, *args, iters=6):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = jfn(*args)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                              .astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"probe": name,
                          "ms": round(float(np.median(ts)) * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    lr = mk((1, lh, lw, 3))
    hr3 = mk((1, h, w, 3))
    hr64 = mk((1, h, w, 64))

    for name in names:
        if name == "bicubic_up":
            timeit(name, lambda t: upsample(t, 4, "bicubic"), lr)
        elif name == "intro":
            k = mk((3, 3, 3, 64))
            b = mk((64,), jnp.float32)
            timeit(name, lambda t: jax.lax.conv_general_dilated(
                t, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b, hr3)
        elif name == "ending":
            k = mk((3, 3, 64, 3))
            b = mk((3,), jnp.float32)
            timeit(name, lambda t: jax.lax.conv_general_dilated(
                t, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b, hr64)
        elif name == "downs":
            # the 4 strided 2x2 downsample convs, chained at their real shapes
            ks = [mk((2, 2, 64 * 2 ** i, 128 * 2 ** i)) for i in range(4)]

            def chain(t):
                outs = []
                for i, k in enumerate(ks):
                    t = jax.lax.conv_general_dilated(
                        t, k, (2, 2), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    outs.append(jnp.sum(t.astype(jnp.float32)))
                return jnp.stack(outs)
            timeit(name, chain, hr64)
        elif name == "ups":
            # the 4 1x1 up convs + pixel_shuffle, at their real shapes
            ks = [mk((1, 1, 1024 // 2 ** i, 2048 // 2 ** i)) for i in range(4)]
            x0 = mk((1, h // 16, w // 16, 1024))

            def chain(t):
                outs = []
                for k in ks:
                    t = jnp.einsum("bhwc,cd->bhwd", t,
                                   k.reshape(k.shape[2], k.shape[3]))
                    t = pixel_shuffle(t, 2)
                    outs.append(jnp.sum(t.astype(jnp.float32)))
                    b_, hh, ww, cc = t.shape
                    t = mk((1, hh, ww, cc))  # fresh input at the next level
                return jnp.stack(outs)
            timeit(name, chain, x0)
        elif name == "fullnaf":
            from freqfusion_tpu.models.nafnet import NAFNetSR
            from freqfusion_tpu.utils.runtime import fast_random_variables
            m = NAFNetSR(use_pallas=True)
            v = fast_random_variables(m, jnp.zeros((1, lh, lw, 3), dt))
            v = jax.tree_util.tree_map(
                lambda a: a.astype(dt) if hasattr(a, "dtype")
                and a.dtype == jnp.float32 else a, v)
            v = jax.device_put(v)
            timeit(name, lambda vv, t: m.apply(vv, t)[0], v, lr)
        elif name == "blocksum_check":
            pass  # analysis-side: see PERF.md r5 NAF table
        else:
            raise ValueError(name)


if __name__ == "__main__":
    main()
