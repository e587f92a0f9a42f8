#!/usr/bin/env python
"""Op-class timing vs geometry: which ops lose per-px efficiency at the
whole-image shape (1,352,512) vs the fast tile shape (2,192,192)?

Usage: PROBE_B=1 PROBE_H=352 PROBE_W=512 python scripts/probe_geometry.py \
          [hab cab conv ocab roll]
Prints one JSON line per op with ms_per_call and us_per_lr_px.
"""

import functools
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-registers the TPU platform even under
    # JAX_PLATFORMS=cpu; the config override must land before first jax use
    # (CLAUDE.md) — without it a CPU-intended probe grabs the TPU tunnel
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.utils.runtime import enable_compilation_cache

B = int(os.environ.get("PROBE_B", "1"))
H = int(os.environ.get("PROBE_H", "352"))
W = int(os.environ.get("PROBE_W", "512"))
C = 180
DT = os.environ.get("PROBE_DT", "float32")
REPS = 12  # stack distinct-weight copies so per-call overhead amortizes


def fence(out):
    first = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(first.astype(jnp.float32)))


def timeit(fn, *args, n=5):
    f = jax.jit(fn)  # one PjitFunction: timed calls hit its trace cache
    t0 = time.time()
    fence(f(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(f(*args))
        ts.append(time.perf_counter() - t0)
    return compile_s, float(np.median(ts) * 1000)


def report(name, compile_s, ms):
    px = B * H * W
    print(json.dumps({
        "op": name, "dt": DT, "shape": [B, H, W, C], "reps": REPS,
        "compile_s": round(compile_s, 1), "ms_per_call": round(ms, 1),
        "us_per_lr_px_per_rep": round(ms * 1000 / px / REPS, 3)}),
        flush=True)


def main():
    names = sys.argv[1:] or ["hab", "cab", "conv"]
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    dt = jnp.dtype(DT)
    x = jnp.asarray(rng.uniform(size=(B, H, W, C)), dt)

    if "hab" in names:
        from freqfusion_tpu.ops.pallas.wattn import fused_hab_block
        nh, ws = 6, 16
        n = ws * ws
        weights = []
        for r in range(REPS):
            weights.append(dict(
                wqkv=jnp.asarray(rng.normal(size=(C, 3 * C)), dt) * jnp.asarray(.05, dt),
                bqkv=jnp.zeros((3 * C,), dt),
                wproj=jnp.asarray(rng.normal(size=(C, C)), dt) * jnp.asarray(.05, dt),
                bproj=jnp.zeros((C,), dt),
                w1=jnp.asarray(rng.normal(size=(C, 2 * C)), dt) * jnp.asarray(.05, dt),
                b1=jnp.zeros((2 * C,), dt),
                w2=jnp.asarray(rng.normal(size=(2 * C, C)), dt) * jnp.asarray(.05, dt),
                b2=jnp.zeros((C,), dt),
                bias=jnp.asarray(rng.normal(size=(nh, n, n)), dt) * jnp.asarray(.1, dt)))

        def habs(a):
            for wd in weights:
                a = fused_hab_block(
                    a, a, jnp.ones((C,), dt), jnp.zeros((C,), dt), jnp.ones((C,), dt),
                    jnp.zeros((C,), dt), wd["wqkv"], wd["bqkv"], wd["wproj"],
                    wd["bproj"], wd["w1"], wd["b1"], wd["w2"], wd["b2"],
                    wd["bias"], None, (ws, ws), nh, 0.01)
            return a
        report("hab", *timeit(habs, x))

    if "cab" in names:
        ws_ = [(jnp.asarray(rng.normal(size=(3, 3, C, 60)), dt) * jnp.asarray(.05, dt),
                jnp.asarray(rng.normal(size=(3, 3, 60, C)), dt) * jnp.asarray(.05, dt))
               for _ in range(REPS)]

        def cabs(a):
            for w1, w2 in ws_:
                h = jax.lax.conv_general_dilated(
                    a, w1, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jax.nn.gelu(h)
                a = a + 0.01 * jax.lax.conv_general_dilated(
                    h, w2, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return a
        report("cab", *timeit(cabs, x))

    if "conv" in names:
        ws_ = [jnp.asarray(rng.normal(size=(3, 3, C, C)), dt) * jnp.asarray(.05, dt)
               for _ in range(REPS)]

        def convs(a):
            for w_ in ws_:
                a = jax.lax.conv_general_dilated(
                    a, w_, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return a
        report("conv", *timeit(convs, x))

    if "ocab" in names:
        # mirrors models/hat.py OCAB: qkv projected in XLA, inner attention
        # + output projection fused (fused_overlap_attention takes q/k/v)
        from freqfusion_tpu.ops.pallas.wattn import fused_overlap_attention
        nh, ws = 6, 16
        ovl = ws // 2                    # overlap px (ows - ws)
        wso = ws + ovl
        weights = []
        for r in range(REPS):
            weights.append(dict(
                wqkv=jnp.asarray(rng.normal(size=(C, 3 * C)), dt) * jnp.asarray(.05, dt),
                wproj=jnp.asarray(rng.normal(size=(C, C)), dt) * jnp.asarray(.05, dt),
                bproj=jnp.zeros((C,), dt),
                bias=jnp.asarray(rng.normal(size=(nh, ws * ws, wso * wso)),
                                 dt) * jnp.asarray(.1, dt)))

        def ocabs(a):
            for wd in weights:
                qkv = a @ wd["wqkv"]
                q, k, v = jnp.split(qkv, 3, axis=-1)
                a = fused_overlap_attention(q, k, v, wd["wproj"],
                                            wd["bproj"], wd["bias"],
                                            ws, ovl, nh)
            return a
        report("ocab", *timeit(ocabs, x))


if __name__ == "__main__":
    main()
