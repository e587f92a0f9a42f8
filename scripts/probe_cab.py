#!/usr/bin/env python
"""Marginal cost of HAT's CAB conv pair (3x3 180->60 + GELU + 3x3 60->180)
at the whole-image bench shape, across lowering strategies.

PERF.md r3 roofline: the 36 CABs are ~411 ms of HAT's 1074 ms at ~25% MXU
util (thin channels vs 128-lane tiling). Candidates:

  xla      — lax.conv_general_dilated NHWC (current production path)
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

C, MID = 180, 60


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


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def make_params(key, dtype, n):
    ks = jax.random.split(key, 2 * n)
    out = []
    for i in range(n):
        w1 = (jax.random.normal(ks[2 * i], (3, 3, C, MID)) * 0.05).astype(dtype)
        w2 = (jax.random.normal(ks[2 * i + 1], (3, 3, MID, C)) * 0.05).astype(dtype)
        out.append((w1, w2))
    return out


def v_xla(x, w1, w2):
    def conv(t, w_):
        return jax.lax.conv_general_dilated(
            t, w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return conv(gelu(conv(x, w1)), w2)


def _shift9(x):
    # [B,H,W,C] -> list of 9 shifted views (zero-padded), tap order (dy,dx)
    b, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    return [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]


def v_shift9(x, w1, w2):
    def conv(t, w_):
        taps = _shift9(t)
        acc = None
        for i, tv in enumerate(taps):
            contrib = jnp.einsum("bhwc,cd->bhwd", tv, w_[i // 3, i % 3],
                                 preferred_element_type=jnp.float32)
            acc = contrib if acc is None else acc + contrib
        return acc.astype(t.dtype)
    return conv(gelu(conv(x, w1)), w2)


def v_im2col(x, w1, w2):
    def conv(t, w_):
        cin = t.shape[-1]
        patches = jnp.concatenate(_shift9(t), axis=-1)  # [B,H,W,9*cin]
        return jnp.einsum("bhwk,kd->bhwd", patches,
                          w_.reshape(9 * cin, -1),
                          preferred_element_type=jnp.float32).astype(t.dtype)
    return conv(gelu(conv(x, w1)), w2)


def v_cnmajor(x, w1, w2):
    # channels in sublanes, pixels in lanes: one transpose in, one out
    b, h, w, c = x.shape
    n = h * w

    def conv(tc, w_, cin, cout):  # tc: [B,cin,N] with N = H*W (pixels)
        img = tc.reshape(b, cin, h, w)
        imgp = jnp.pad(img, [(0, 0), (0, 0), (1, 1), (1, 1)])
        acc = None
        for dy in range(3):
            for dx in range(3):
                tv = imgp[:, :, dy:dy + h, dx:dx + w].reshape(b, cin, n)
                contrib = jnp.einsum("oc,bcn->bon", w_[dy, dx].T, tv,
                                     preferred_element_type=jnp.float32)
                acc = contrib if acc is None else acc + contrib
        return acc.astype(tc.dtype)

    tc = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, n)
    tc = conv(tc, w1, C, MID)
    tc = gelu(tc)
    tc = conv(tc, w2, MID, C)
    return jnp.transpose(tc.reshape(b, C, h, w), (0, 2, 3, 1))


VARIANTS = {"xla": v_xla, "shift9": v_shift9, "im2col": v_im2col,
            "cnmajor": v_cnmajor}


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
    for name, fn in VARIANTS.items():
        if which and name not in which:
            continue
        try:
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
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
