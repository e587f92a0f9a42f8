#!/usr/bin/env python
"""Marginal per-level NAFBlock costs at the whole-image bench shape.

NAFNet-SR upsamples bicubic x4 FIRST (nafnet/__init__.py:117-139 in the
reference), so its UNet's top level runs at HR (4H x 4W x 64) — at the
352x512 bench frame that's 1408x2048, where _pick_bh's default strip
budget (16 MB since r3's sweep; 8 MB before) picks bh=1 single-row strips
(1408-program grids). This probes each level's block cost XLA-vs-Pallas
and the strip-budget sensitivity, to see where NAFNet's ~437 ms (PERF.md
r3 table) actually goes. The 'pallas' variant with env unset measures the
16 MB default; sweep values set FREQFUSION_STRIP_BUDGET_MB per run (8
reproduces the old baseline).

Usage: python scripts/probe_nafparts.py [dtype] [probe ...]
Env: PROBE_H/PROBE_W (default 352x512 -> HR 1408x2048), PROBE_B (1),
     FREQFUSION_STRIP_BUDGET_MB (probed values get set per-run instead).
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

from freqfusion_tpu.models.nafnet import NAFBlock  # noqa: E402


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


def marginal(make_module, x, n1=1, n2=3):
    m = make_module()
    plist = [m.init(jax.random.PRNGKey(i), x) for i in range(n2)]
    plist = jax.tree_util.tree_map(lambda a: a.astype(x.dtype), plist)

    def run(k):
        def fn(x0, ps):
            y = x0
            for i in range(k):
                y = m.apply(ps[i], y)
            return jnp.sum(y.astype(jnp.float32))
        return time_once(fn, x, plist[:k])

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1), t1, t2


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    which = set(sys.argv[2:])
    b = int(os.environ.get("PROBE_B", "1"))
    h = int(os.environ.get("PROBE_H", "352")) * 4
    w = int(os.environ.get("PROBE_W", "512")) * 4
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": dtype, "hr": [h, w]}), flush=True)

    # (level name, channels, H, W) for the SIDD UNet at this frame
    levels = [("enc0", 64, h, w), ("enc1", 128, h // 2, w // 2),
              ("enc2", 256, h // 4, w // 4), ("enc3", 512, h // 8, w // 8),
              ("mid", 1024, h // 16, w // 16)]

    for name, c, lh, lw in levels:
        x = (jax.random.normal(jax.random.PRNGKey(1), (b, lh, lw, c)) * 0.2
             ).astype(dtype)
        for variant, use_pallas, budget in (
                ("xla", False, None),
                ("pallas", True, None),
                ("pallas_b24", True, "24"),
                ("pallas_b48", True, "48")):
            tag = f"{name}_{variant}"
            if which and tag not in which and name not in which:
                continue
            if budget is not None:
                os.environ["FREQFUSION_STRIP_BUDGET_MB"] = budget
            else:
                os.environ.pop("FREQFUSION_STRIP_BUDGET_MB", None)
            try:
                per, t1, t2 = marginal(
                    lambda c=c, p=use_pallas: NAFBlock(c, use_pallas=p), x)
                print(json.dumps({"probe": tag, "shape": [b, lh, lw, c],
                                  "marginal_ms": round(per, 2),
                                  "t_n1": round(t1, 1),
                                  "t_n2": round(t2, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"probe": tag, "error": repr(e)[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
