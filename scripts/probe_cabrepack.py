#!/usr/bin/env python
"""A/B the cab_chain 3-matmul lane-concat repack (FREQFUSION_CAB_REPACK)
against the shipped 9-tap kernel at the whole-image bench shape, plus an
on-TPU numeric delta so a miscompile (sub-128-lane concat class, PERF.md
Mosaic lessons) cannot slip through on timing alone.

Usage: python scripts/probe_cabrepack.py [dtype]   (TPU)
Env: PROBE_H/PROBE_W (352x512), PROBE_SHIFT (8).
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

    from freqfusion_tpu.utils.runtime import (enable_compilation_cache,
                                              wait_for_backend)
    enable_compilation_cache()
    wait_for_backend()

    from freqfusion_tpu.ops.pallas.cab import cab_chain, cab_chain_reference

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        sys.argv[1] if len(sys.argv) > 1 else "bfloat16"]
    h = int(os.environ.get("PROBE_H", "352"))
    w = int(os.environ.get("PROBE_W", "512"))
    shift = int(os.environ.get("PROBE_SHIFT", "8"))
    c, mid = 180, 60
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(1, h, w, c)) * 0.5, dtype)
    ln_w = jnp.asarray(1 + 0.1 * rng.normal(size=c), jnp.float32)
    ln_b = jnp.asarray(0.05 * rng.normal(size=c), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, mid)) * (0.3 / c), dtype)
    b1 = jnp.asarray(0.1 * rng.normal(size=mid), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, mid, c)) * (0.3 / mid), dtype)
    b2 = jnp.asarray(0.1 * rng.normal(size=c), jnp.float32)

    def timeit(name, fn, iters=8):
        t0 = time.time()
        out = fn(x)
        u = out[0] if isinstance(out, tuple) else out
        _ = float(jnp.sum(u.astype(jnp.float32)))  # fence
        compile_s = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(x)
            u = out[0] if isinstance(out, tuple) else out
            _ = float(jnp.sum(u.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"probe": name, "ms": round(
            float(np.median(ts)) * 1e3, 2), "compile_s": round(compile_s, 1)}),
            flush=True)
        return out

    variants = {
        "cab9tap_s0": jax.jit(lambda t: cab_chain(
            t, ln_w, ln_b, w1, b1, w2, b2, repack=False)),
        "cabrepack_s0": jax.jit(lambda t: cab_chain(
            t, ln_w, ln_b, w1, b1, w2, b2, repack=True)),
        "cab9tap_shift": jax.jit(lambda t: cab_chain(
            t, ln_w, ln_b, w1, b1, w2, b2, repack=False, out_shift=shift)),
        "cabrepack_shift": jax.jit(lambda t: cab_chain(
            t, ln_w, ln_b, w1, b1, w2, b2, repack=True, out_shift=shift)),
    }
    outs = {k: timeit(k, fn) for k, fn in variants.items()}

    # numeric check: repack vs 9-tap on hardware (same mdt → tight bound),
    # and both vs the f32 XLA reference (bf16-MXU class, PARITY.md r5)
    ref_u, ref_s = jax.jit(lambda t: cab_chain_reference(
        t, ln_w, ln_b, w1, b1, w2, b2))(x)
    for s0, s1 in (("cab9tap_s0", "cabrepack_s0"),
                   ("cab9tap_shift", "cabrepack_shift")):
        d = float(jnp.max(jnp.abs(outs[s0][0].astype(jnp.float32)
                                  - outs[s1][0].astype(jnp.float32))))
        print(json.dumps({"check": f"{s1}_vs_{s0}", "max_abs": d}), flush=True)
    d = float(jnp.max(jnp.abs(outs["cabrepack_s0"][0].astype(jnp.float32)
                              - ref_u.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref_u.astype(jnp.float32))))
    print(json.dumps({"check": "cabrepack_vs_f32ref", "max_abs": d,
                      "scale": scale}), flush=True)


if __name__ == "__main__":
    main()
