#!/usr/bin/env python
"""Marginal cost of HAT's CAB conv pair (3x3 180->60 + GELU + 3x3 60->180)
at the whole-image bench shape, across lowering strategies.

PERF.md r3 roofline: the 36 CABs are ~411 ms of HAT's 1074 ms at ~25% MXU
util (thin channels vs 128-lane tiling). The candidates are the PRODUCTION
lowerings in freqfusion_tpu/ops/convchain.py (imported, not duplicated, so
the probe times exactly what FREQFUSION_CAB_IMPL will run):

  conv     — lax.conv_general_dilated NHWC (current production default)
  shift9   — sum of 9 shifted 1x1 matmuls (per-tap [N,180]@[180,60])
  im2col   — explicit [B,H,W,9C] patch concat -> one matmul (K=1620)
  cnmajor  — [C, N_px] layout: W[out,in] @ X[in, N_px] with pixels in lanes

Each variant computes conv1+GELU+conv2 (no CA; it's ~1 ms). n-vs-2n
distinct-params marginal methodology (scripts/probe_marginal.py).
Reference anatomy: /root/reference/src/models/hat/hat_arch.py:129-150 (CAB).

Usage: python scripts/probe_cab.py [dtype] [variant ...]
Env: PROBE_H/PROBE_W (352x512), PROBE_B (1).
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from freqfusion_tpu.ops.convchain import conv3x3_chain  # noqa: E402

C, MID = 180, 60
VARIANTS = ("conv", "shift9", "im2col", "cnmajor")


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


def make_params(key, dtype, n):
    ks = jax.random.split(key, 2 * n)
    out = []
    for i in range(n):
        w1 = (jax.random.normal(ks[2 * i], (3, 3, C, MID)) * 0.05).astype(dtype)
        w2 = (jax.random.normal(ks[2 * i + 1], (3, 3, MID, C)) * 0.05).astype(dtype)
        out.append((w1, jnp.zeros((MID,), dtype), w2, jnp.zeros((C,), dtype)))
    return out


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    which = set(sys.argv[2:])
    b = int(os.environ.get("PROBE_B", "1"))
    h = int(os.environ.get("PROBE_H", "352"))
    w = int(os.environ.get("PROBE_W", "512"))
    x = (jax.random.normal(jax.random.PRNGKey(0), (b, h, w, C)) * 0.2
         ).astype(dtype)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": dtype, "shape": list(x.shape)}), flush=True)

    n1, n2 = 2, 6
    params = make_params(jax.random.PRNGKey(1), dtype, n2)
    ref = None
    for name in VARIANTS:
        if which and name not in which:
            continue
        try:
            fn = lambda t, *ps, name=name: conv3x3_chain(t, *ps, impl=name)
            y = jax.jit(fn)(x, *params[0])
            if ref is None:
                ref = np.asarray(y, dtype=np.float32)
            else:
                err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
                if err > 5e-2:
                    print(json.dumps({"variant": name,
                                      "MISMATCH_maxerr": err}), flush=True)

            def run(k, fn=fn):
                def body(x0, ps):
                    y0 = x0
                    for i in range(k):
                        y0 = fn(y0, *ps[i])
                    return jnp.sum(y0.astype(jnp.float32))
                return time_once(body, x, params[:k])

            t1, t2 = run(n1), run(n2)
            per = (t2 - t1) / (n2 - n1)
            print(json.dumps({"variant": name, "marginal_ms": round(per, 2),
                              "t_n1": round(t1, 1), "t_n2": round(t2, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
