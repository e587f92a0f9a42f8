#!/usr/bin/env python
"""On-TPU numeric parity for the r4 kernels (cab_chain / conv3x3_dense /
the shifted-HAB CAB_KERNEL path) — VERDICT r4 #7 + ADVICE #1.

The r4 kernels shipped with interpret-mode (CPU) parity only; this runs
the real Mosaic lowering on the chip and records max|Δ| vs the XLA twin,
the same methodology PARITY.md used for the r2 wattn kernels. The shifted
case specifically exercises the out_shift folded store (sublane-dim
two-slice write + %-permuted output index map) that ADVICE #1 flagged as
numerically unproven on this Mosaic build.

Usage: python scripts/parity_tpu.py  (needs the TPU tunnel)
Prints one JSON line per check.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from freqfusion_tpu.utils.runtime import (enable_compilation_cache,
                                          wait_for_backend)


def maxdiff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))


def main():
    enable_compilation_cache()
    wait_for_backend()
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 96, 256, 180
    mid = C // 3

    def mk(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)

    x = mk(B, H, W, C, scale=0.5)
    ln_w, ln_b = mk(C, scale=0.2) + 1.0, mk(C, scale=0.1)
    w1, b1 = mk(3, 3, C, mid, scale=0.05), mk(mid, scale=0.05)
    w2, b2 = mk(3, 3, mid, C, scale=0.05), mk(C, scale=0.05)

    from freqfusion_tpu.ops.pallas.cab import (cab_chain, cab_chain_reference,
                                               conv3x3_dense)

    uref, sref = jax.jit(cab_chain_reference)(x, ln_w, ln_b, w1, b1, w2, b2)
    uref = np.asarray(uref)
    sref = np.asarray(sref)

    for dtype in (jnp.float32, jnp.bfloat16):
        xd = x.astype(dtype)
        for shift in (0, 8):
            u, s = jax.jit(
                lambda xx, sh=shift: cab_chain(xx, ln_w, ln_b, w1, b1,
                                               w2, b2, out_shift=sh))(xd)
            ur = (np.roll(uref, (-shift, -shift), axis=(1, 2))
                  if shift else uref)
            print(json.dumps({
                "check": "cab_chain", "dtype": str(np.dtype(dtype)),
                "shift": shift, "shape": [B, H, W, C],
                "max_abs_u": maxdiff(jnp.asarray(ur), u),
                "max_abs_sums": maxdiff(jnp.asarray(sref), s),
                "out_scale": float(np.abs(ur).max()),
            }), flush=True)

        # conv3x3_dense vs the XLA conv (HIGHEST precision)
        y = jax.jit(lambda xx: conv3x3_dense(xx, w2.transpose(0, 1, 3, 2)
                                             [:, :, :C, :mid], b1))(xd)
        yref = jax.lax.conv_general_dilated(
            x, w2.transpose(0, 1, 3, 2)[:, :, :C, :mid], (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b1
        print(json.dumps({
            "check": "conv3x3_dense", "dtype": str(np.dtype(dtype)),
            "max_abs": maxdiff(yref, y),
            "out_scale": float(jnp.abs(yref).max()),
        }), flush=True)

    # full shifted HAB module: FREQFUSION_CAB_KERNEL=1 vs 0 (both use the
    # fused_hab_block pallas path; the delta isolates the folded CAB store)
    from freqfusion_tpu.models.hat import HAB
    hab = HAB(dim=C, num_heads=6, window=16, shift=8, compress=3,
              squeeze=30, conv_scale=0.01, mlp_ratio=2.0, use_pallas=True)
    v = hab.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, C)))
    for dtype in (jnp.float32, jnp.bfloat16):
        xd = (x * 0.1).astype(dtype)
        outs = {}
        for flag in ("1", "0"):
            os.environ["FREQFUSION_CAB_KERNEL"] = flag
            outs[flag] = jax.jit(lambda vv, xx: hab.apply(vv, xx))(v, xd)
            _ = float(jnp.sum(outs[flag].astype(jnp.float32)))  # fence
            jax.clear_caches()  # env is read at trace time
        print(json.dumps({
            "check": "shifted_hab_cabkernel_1_vs_0",
            "dtype": str(np.dtype(dtype)),
            "max_abs": maxdiff(outs["1"], outs["0"]),
            "out_scale": float(jnp.abs(outs["0"].astype(jnp.float32)).max()),
        }), flush=True)
    os.environ.pop("FREQFUSION_CAB_KERNEL", None)


if __name__ == "__main__":
    main()
