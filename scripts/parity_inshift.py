#!/usr/bin/env python
"""On-TPU numeric parity for the in_shift quadrant path (r5): full HAT-L
forward with FREQFUSION_HAB_INSHIFT=1 vs 0 at the bench shape, identical
weights — a Mosaic miscompile in the modular index maps or the sublane
concats would show here and nowhere else (interpret parity is exact).

Usage: python scripts/parity_inshift.py [dtype]   (TPU)
"""

import json
import os
import sys

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

    from freqfusion_tpu.models.hat import HAT

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        sys.argv[1] if len(sys.argv) > 1 else "bfloat16"]
    rng = np.random.default_rng(0)
    model = HAT(use_pallas=True)
    lr = jnp.asarray(rng.uniform(size=(1, 352, 512, 3)), dtype)
    v = fast_random_variables(model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype")
        and a.dtype == jnp.float32 else a, v)
    v = jax.device_put(v)

    outs = {}
    for mode in ("0", "1"):
        os.environ["FREQFUSION_HAB_INSHIFT"] = mode
        sr, feat = jax.jit(lambda vv, t: model.apply(vv, t))(v, lr)
        outs[mode] = (np.asarray(sr.astype(jnp.float32)),
                      np.asarray(feat.astype(jnp.float32)))
    d_sr = float(np.max(np.abs(outs["0"][0] - outs["1"][0])))
    d_ft = float(np.max(np.abs(outs["0"][1] - outs["1"][1])))
    print(json.dumps({"check": "hat_inshift1_vs_0", "max_abs_sr": d_sr,
                      "max_abs_feat": d_ft,
                      "sr_scale": float(np.max(np.abs(outs["0"][0])))}),
          flush=True)
    assert d_sr < 1e-2 and d_ft < 1.0, (d_sr, d_ft)


if __name__ == "__main__":
    main()
