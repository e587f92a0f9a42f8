#!/usr/bin/env python
"""Dump the optimized HLO of the composed CAB→fused-HAB link to find the
ops that explain the ~6 ms composition overhead (probe_habglue r4:
composed_cabnoln 10.1 ms vs parts-sum ~4.3 — lowering-independent, so the
cost must be visible as scheduled ops: copies / relayouts / fusions).

Usage: python scripts/probe_habhlo.py [dtype] [cab_impl]
"""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.ops import windows as W  # noqa: E402

B, H, WW, C = 1, 352, 512, 180
NH, WS = 6, 16
N = WS * WS


def main():
    dtype = jnp.dtype(sys.argv[1] if len(sys.argv) > 1 else "bfloat16")
    k = jax.random.PRNGKey

    from freqfusion_tpu.models.hat import CAB
    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block

    if len(sys.argv) > 2:
        import os
        os.environ["FREQFUSION_CAB_IMPL"] = sys.argv[2]

    cab = CAB(C, 3, 30)
    cv = cab.init(k(0), jnp.zeros((1, 2 * WS, 2 * WS, C), dtype))
    # serving casts the param tree to the serving dtype; f32 weights here
    # would promote every conv to f32 whole-image converts (r4 HLO dump)
    cv = jax.tree_util.tree_map(lambda a: a.astype(dtype), cv)
    ln1 = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32))

    def composed2(x, table, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
        # two links of the chain so the kernel→CAB boundary also appears
        for _ in range(2):
            bias = W.swin_bias_from_table(table, WS, WS)
            x = fused_hab_block(x, cab.apply(cv, x), *ln1, *ln1, wqkv, bqkv,
                                wproj, bproj, w1, b1, w2, b2, bias, None,
                                (WS, WS), NH, 0.01)
        return jnp.sum(x.astype(jnp.float32))

    args = (
        (jax.random.normal(k(1), (B, H, WW, C)) * 0.2).astype(dtype),
        jax.random.normal(k(2), ((2 * WS - 1) ** 2, NH)) * 0.1,
        (jax.random.normal(k(3), (C, 3 * C)) * 0.05).astype(dtype),
        jnp.zeros((3 * C,), dtype),
        (jax.random.normal(k(4), (C, C)) * 0.05).astype(dtype),
        jnp.zeros((C,), dtype),
        (jax.random.normal(k(5), (C, 2 * C)) * 0.05).astype(dtype),
        jnp.zeros((2 * C,), dtype),
        (jax.random.normal(k(6), (2 * C, C)) * 0.05).astype(dtype),
        jnp.zeros((C,), dtype),
    )
    lowered = jax.jit(composed2).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"=== optimized HLO: {len(txt.splitlines())} lines ===")
    # entry-computation schedule: ops with big shapes or copy/transpose
    pat = re.compile(r"^\s*(%?[\w.-]+) = (\S+) (copy|transpose|convert|"
                     r"fusion|custom-call|convolution|reshape|bitcast|"
                     r"dynamic-slice|concatenate|slice|pad)\(")
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        shape = m.group(2)
        # only print ops touching >=4 MB payloads to keep the dump readable
        dims = re.findall(r"(\d+(?:,\d+)*)\]", shape)
        sz = 0
        dm = re.match(r"(bf16|f32|f16|s32|u8)\[([\d,]*)\]", shape)
        if dm:
            nums = [int(x) for x in dm.group(2).split(",") if x]
            sz = int(np.prod(nums)) * (2 if dm.group(1) in ("bf16", "f16")
                                       else 4)
        if sz >= 4_000_000 or m.group(3) in ("custom-call", "convolution"):
            print(f"{sz/1e6:8.1f}MB  {m.group(3):12s} {line.strip()[:240]}")


if __name__ == "__main__":
    main()
