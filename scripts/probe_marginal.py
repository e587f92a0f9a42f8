#!/usr/bin/env python
"""Marginal-cost probes: time n vs 2n stacked copies of a component with
DISTINCT params in single dispatches; (t2-t1)/n is the true per-copy device
cost — immune to the ~29 ms dispatch overhead, CSE, and weight reuse.

Usage: python scripts/probe_marginal.py [dtype] [probe ...]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.hat import (CAB, HAB, OCAB, RHAG, Mlp,  # noqa: E402
                                       WindowAttention)


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


def marginal(make_module, x, n1=2, n2=6, train_sig=False, init_x=None):
    """Stack k distinct-param copies; return per-copy marginal ms.

    `init_x` (default x) may be a smaller shape: params here are
    H/W-independent, and init at the bench shape compiles a full forward
    per copy."""
    m = make_module()
    plist = [m.init(jax.random.PRNGKey(i), init_x if init_x is not None
                    else x) for i in range(n2)]
    plist = jax.tree_util.tree_map(lambda a: a.astype(x.dtype), plist)

    def run(k):
        def fn(x0, ps):
            y = x0
            for i in range(k):
                y = m.apply(ps[i], y)
                y = y[0] if isinstance(y, tuple) else y
            return jnp.sum(y.astype(jnp.float32))
        return time_once(fn, x, plist[:k])

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1), t1, t2


def report(name, per, t1, t2):
    print(json.dumps({"probe": name, "marginal_ms": round(per, 2),
                      "t_n1": round(t1, 1), "t_n2": round(t2, 1)}), flush=True)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    which = set(sys.argv[2:])
    c, heads, window = 180, 6, 16
    # default 192² b2 (the r2 table's shape); PROBE_H/W/B target the
    # whole-image bench shape (1,352,512)
    b = int(os.environ.get("PROBE_B", "2"))
    hh = int(os.environ.get("PROBE_H", "192"))
    ww = int(os.environ.get("PROBE_W", "192"))
    x = (jax.random.normal(jax.random.PRNGKey(9), (b, hh, ww, c)) * 0.2).astype(dtype)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "dtype": dtype}), flush=True)

    probes = {
        "hab": lambda: HAB(c, heads, window, 8, 3, 30, 0.01, 2.0),
        "hab_noshift": lambda: HAB(c, heads, window, 0, 3, 30, 0.01, 2.0),
        "hab_pallas": lambda: HAB(c, heads, window, 8, 3, 30, 0.01, 2.0,
                                  use_pallas=True),
        # bisection variants for the in-model (13.3 ms) vs parts-sum
        # (6.7 ms) gap: shift-0 removes rolls+mask; compress=90 makes the
        # CAB branch ~free (mid 2 channels) without changing structure
        "hab_pallas_noshift": lambda: HAB(c, heads, window, 0, 3, 30, 0.01,
                                          2.0, use_pallas=True),
        "hab_pallas_thincab": lambda: HAB(c, heads, window, 8, 90, 30, 0.01,
                                          2.0, use_pallas=True),
        "wattn": lambda: WindowAttention(c, window, heads),
        "wattn_pallas": lambda: WindowAttention(c, window, heads,
                                                use_pallas=True),
        "cab": lambda: CAB(c, 3, 30),
        "mlp": lambda: Mlp(2 * c, c),
        "ocab": lambda: OCAB(c, window, 0.5, heads, 2.0),
        "ocab_pallas": lambda: OCAB(c, window, 0.5, heads, 2.0,
                                    use_pallas=True),
        # one full production RHAG (6 HABs scanned as 3 pairs + OCAB +
        # conv + skip): HAT-L is 12 of these — accounts scan/glue costs
        # the per-block probes can't see
        "rhag_pallas": lambda: RHAG(c, 6, heads, window, 3, 30, 0.01,
                                    0.5, 2.0, use_pallas=True),
        "rhag_xla": lambda: RHAG(c, 6, heads, window, 3, 30, 0.01,
                                 0.5, 2.0, use_pallas=False),
    }

    def _datb(spatial, shift=False, use_pallas=False):
        from freqfusion_tpu.models.dat import DATB
        return lambda: DATB(c, heads, (8, 32), 4.0, spatial, shift,
                            use_pallas=use_pallas)

    probes["datb_spatial"] = _datb(True)
    probes["datb_spatial_pallas"] = _datb(True, use_pallas=True)
    probes["datb_spatial_shift"] = _datb(True, shift=True)
    probes["datb_channel"] = _datb(False)

    # NAFNet blocks run at HR resolution (×4 the tile): probe at the real
    # production pixel load — 768² for a 192² tile — but batch 1 to fit.
    from freqfusion_tpu.models.nafnet import NAFBlock
    xn = (jax.random.normal(jax.random.PRNGKey(3), (1, 768, 768, 64)) * 0.2
          ).astype(dtype)
    xn2 = (jax.random.normal(jax.random.PRNGKey(4), (1, 384, 384, 128)) * 0.2
           ).astype(dtype)
    naf_probes = {
        "nafblock_w64_hr": (lambda: NAFBlock(64), xn),
        "nafblock_w128_half": (lambda: NAFBlock(128), xn2),
    }

    # init at f32 regardless of probe dtype: rng-init params are f32, and a
    # mixed f32-param/bf16-input init makes scan carries dtype-unstable
    # (production inits at f32 and casts whole variable trees after)
    init_x = jnp.zeros((1, 2 * window, 2 * window, c), jnp.float32)
    for name, mk in probes.items():
        if which and name not in which:
            continue
        try:
            if name.startswith("rhag"):
                per, t1, t2 = marginal(mk, x, n1=1, n2=3, init_x=init_x)
            else:
                per, t1, t2 = marginal(mk, x, init_x=init_x)
            report(f"{name}.{dtype}", per, t1, t2)
        except Exception as e:
            print(json.dumps({"probe": f"{name}.{dtype}",
                              "error": str(e)[:300]}), flush=True)
    for name, (mk, xi) in naf_probes.items():
        if which and name not in which:
            continue
        try:
            per, t1, t2 = marginal(mk, xi, n1=1, n2=3)
            report(f"{name}.{dtype}", per, t1, t2)
        except Exception as e:
            print(json.dumps({"probe": f"{name}.{dtype}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
