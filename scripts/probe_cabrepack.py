#!/usr/bin/env python
"""A/B the cab_chain 3-D-dot repack (FREQFUSION_CAB_REPACK) on hardware.

Timing is IN-MODEL (full HAT-L at the bench shape, comparable to the
PERF.md r5 table's 714.9 ms) — single-dispatch kernel timing is swamped by
the ~29 ms tunnel round trip (first version of this probe measured 28.7 ms
for a ~4 ms kernel; PERF.md methodology). Numerics are checked directly
(repack vs 9-tap on-chip, plus vs the f32 XLA reference).

History: the first r5 repack (lane-concat of dx-shifted views) MISCOMPILED
— tpu.concatenate with 180-lane pieces lands inputs at non-vreg lane
offsets ("result/input offset mismatch on non-concat dimension"), so the
sub-128 concat rule is really a 128-alignment rule. The shipped repack
contracts tap VIEWS with 3-D dot_general instead (no reshape, no concat).

Usage: python scripts/probe_cabrepack.py [dtype]   (TPU)
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
                                              fast_random_variables,
                                              wait_for_backend)
    enable_compilation_cache()
    wait_for_backend()

    from freqfusion_tpu.ops.pallas.cab import cab_chain, cab_chain_reference

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        sys.argv[1] if len(sys.argv) > 1 else "bfloat16"]
    h = int(os.environ.get("PROBE_H", "352"))
    w = int(os.environ.get("PROBE_W", "512"))
    c, mid = 180, 60
    rng = np.random.default_rng(0)

    # ---- numerics: repack vs 9tap on-chip (same mdt → tight bound) ----
    x = jnp.asarray(rng.normal(size=(1, h, w, c)) * 0.5, dtype)
    ln_w = jnp.asarray(1 + 0.1 * rng.normal(size=c), jnp.float32)
    ln_b = jnp.asarray(0.05 * rng.normal(size=c), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, mid)) * (0.3 / c), dtype)
    b1 = jnp.asarray(0.1 * rng.normal(size=mid), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, mid, c)) * (0.3 / mid), dtype)
    b2 = jnp.asarray(0.1 * rng.normal(size=c), jnp.float32)

    outs = {}
    for name, kw in (("tap9_s0", dict(repack=False)),
                     ("dot3d_s0", dict(repack=True)),
                     ("tap9_sh", dict(repack=False, out_shift=8)),
                     ("dot3d_sh", dict(repack=True, out_shift=8))):
        t0 = time.time()
        u, s = jax.jit(lambda t, kw=kw: cab_chain(
            t, ln_w, ln_b, w1, b1, w2, b2, **kw))(x)
        _ = float(jnp.sum(u.astype(jnp.float32)))
        outs[name] = u
        print(json.dumps({"compiled": name,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
    for a, b in (("tap9_s0", "dot3d_s0"), ("tap9_sh", "dot3d_sh")):
        d = float(jnp.max(jnp.abs(outs[a].astype(jnp.float32)
                                  - outs[b].astype(jnp.float32))))
        print(json.dumps({"check": f"{b}_vs_{a}", "max_abs": d}), flush=True)
    ref_u, _ = jax.jit(lambda t: cab_chain_reference(
        t, ln_w, ln_b, w1, b1, w2, b2))(x)
    d = float(jnp.max(jnp.abs(outs["dot3d_s0"].astype(jnp.float32)
                              - ref_u.astype(jnp.float32))))
    print(json.dumps({"check": "dot3d_vs_f32ref", "max_abs": d,
                      "scale": float(jnp.max(jnp.abs(
                          ref_u.astype(jnp.float32))))}), flush=True)

    # ---- timing: full HAT-L in-model A/B (the honest metric) ----
    from freqfusion_tpu.models.hat import HAT
    model = HAT(use_pallas=True)
    lr = jnp.asarray(rng.uniform(size=(1, h, w, 3)), dtype)
    v = fast_random_variables(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype")
        and a.dtype == jnp.float32 else a, v)
    v = jax.device_put(v)

    for mode in ("0", "1"):
        os.environ["FREQFUSION_CAB_REPACK"] = mode
        fwd = jax.jit(lambda vv, t: model.apply(vv, t)[0])
        t0 = time.time()
        _ = float(jnp.sum(fwd(v, lr).astype(jnp.float32)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fwd(v, lr).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"probe": f"hat_full_repack{mode}",
                          "ms": round(float(np.median(ts)) * 1e3, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
