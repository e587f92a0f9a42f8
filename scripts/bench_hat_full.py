#!/usr/bin/env python
"""Full HAT-L forward on TPU: f32 vs bf16 end-to-end, XLA vs Pallas wattn.

Single-dispatch timing (the ~29 ms tunnel per-call overhead is reported
separately by scripts' overhead probe and subtracted mentally — a full model
call is one dispatch, so the number here is what production sees per tile
chunk). Usage: python scripts/bench_hat_full.py [dtype] [use_pallas 0/1]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from freqfusion_tpu.models.hat import HAT  # noqa: E402
from freqfusion_tpu.utils.runtime import enable_compilation_cache  # noqa: E402


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    use_pallas = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    enable_compilation_cache()

    model = HAT(use_pallas=use_pallas)
    x = jnp.ones((2, 192, 192, 3), dtype)
    t0 = time.time()
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               jnp.ones((1, 16, 16, 3))))
    # init on tiny input (params are shape-independent), then cast
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 3)))
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)

    @jax.jit
    def fwd(p, a):
        sr, feat = model.apply(p, a)
        return jnp.sum(sr.astype(jnp.float32)) + jnp.sum(
            feat.astype(jnp.float32))

    t0 = time.time()
    float(fwd(params, x))
    print(json.dumps({"compile_s": round(time.time() - t0, 1)}), flush=True)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(fwd(params, x))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "probe": f"hat_full.{dtype}.{'pallas' if use_pallas else 'xla'}",
        "ms_per_call": round(float(np.median(ts)) * 1000, 1),
        "all": [round(t * 1000, 1) for t in ts]}), flush=True)


if __name__ == "__main__":
    main()
