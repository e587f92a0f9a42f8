#!/usr/bin/env python
"""Full-expert forward timing on TPU (single-dispatch, the ~29 ms tunnel
overhead rides on top). Usage:
  python scripts/bench_expert_full.py {hat|dat|nafnet|fusion} [dtype] [pallas 0/1]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.utils.runtime import enable_compilation_cache  # noqa: E402


def build(which, dtype, use_pallas):
    if which == "hat":
        from freqfusion_tpu.models.hat import HAT
        model = HAT(use_pallas=use_pallas)
        x = jnp.ones((2, 192, 192, 3), dtype)
    elif which == "dat":
        from freqfusion_tpu.models.dat import DAT
        model = DAT(use_pallas=use_pallas)
        x = jnp.ones((2, 192, 192, 3), dtype)
    elif which == "nafnet":
        from freqfusion_tpu.models.nafnet import NAFNetSR
        model = NAFNetSR(use_pallas=use_pallas)
        x = jnp.ones((2, 192, 192, 3), dtype)
    else:
        raise ValueError(which)
    return model, x


def main():
    which = sys.argv[1]
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    use_pallas = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    enable_compilation_cache()

    model, x = build(which, dtype, use_pallas)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)

    @jax.jit
    def fwd(p, a):
        out = model.apply(p, a)
        first = out[0] if isinstance(out, tuple) else out
        return jnp.sum(first.astype(jnp.float32))

    t0 = time.time()
    float(fwd(params, x))
    print(json.dumps({"compile_s": round(time.time() - t0, 1)}), flush=True)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(fwd(params, x))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "probe": f"{which}_full.{dtype}.{'pallas' if use_pallas else 'xla'}",
        "ms_per_call": round(float(np.median(ts)) * 1000, 1)}), flush=True)


if __name__ == "__main__":
    main()
