#!/usr/bin/env python
"""Attribute cached-vs-live train-step cost layer by layer (r5).

RESOLVED: an early r5 ad-hoc measurement saw 6.2 s/step cached vs 0.9 s
live — that was tunnel contention (another TPU process), not real. This
probe on an idle chip measured (bf16? no — f32 data, batch 14, patch 64):
head_fwd 152 ms, head_fwdbwd 160, cached_l1 161, cached_full 180,
live_full 677 — cached wins 3.8x (the live step's non-differentiated
frozen experts prune their backward, PERF.md r3, which is why the gap is
below the reference's 10-20x CUDA claim). Layers:

  head_fwd        FusionHead forward only (cached inputs)
  head_fwdbwd     value_and_grad of l1(head(x)) — isolates the head VJP
  cached_l1       full cached train step with an l1-only criterion
  cached_full     full cached train step, stage-1 weights (the bench)
  live_full       full live train step, stage-1 weights (the bench)

Usage: python scripts/probe_train.py [probe ...]   (TPU)
Env: FREQFUSION_TRAIN_BATCH/PATCH (default 14/64).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.utils.runtime import (enable_compilation_cache,
                                              wait_for_backend)
    enable_compilation_cache()
    wait_for_backend()

    from freqfusion_tpu.losses import CombinedLoss
    from freqfusion_tpu.models.fusion import FusionConfig, FusionHead
    from freqfusion_tpu.training.schedule import warmup_then_cosine_restarts
    from freqfusion_tpu.training.steps import (init_train_state,
                                               make_optimizer,
                                               make_train_step)

    batch = int(os.environ.get("FREQFUSION_TRAIN_BATCH", "14"))
    patch = int(os.environ.get("FREQFUSION_TRAIN_PATCH", "64"))
    names = sys.argv[1:] or ["head_fwd", "head_fwdbwd", "cached_l1",
                             "cached_full", "live_full"]
    s = 4
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.uniform(size=shape), jnp.float32)

    data = {
        "lr": mk((batch, patch, patch, 3)),
        "hr": mk((batch, s * patch, s * patch, 3)),
        "expert_outputs": {k: mk((batch, s * patch, s * patch, 3))
                           for k in ("hat", "dat", "nafnet")},
        "expert_features": {
            "hat": mk((batch, patch, patch, 180)) * 0.1,
            "dat": mk((batch, patch, patch, 180)) * 0.1,
            "nafnet": mk((batch, patch, patch, 64)) * 0.1,
        },
    }
    model = FusionHead(FusionConfig())
    tx = make_optimizer(warmup_then_cosine_restarts(1.5e-4, 5, 50))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), data)
    state = jax.device_put(state)
    data = jax.device_put(data)
    drng = jax.random.PRNGKey(1)

    def timeit(name, fn, *args, iters=5, donate=None):
        jfn = jax.jit(fn) if donate is None else jax.jit(
            fn, donate_argnums=donate)
        t0 = time.time()
        out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))  # fence
        compile_s = time.time() - t0
        ts = []
        cur = args
        for _ in range(iters):
            t0 = time.perf_counter()
            out = jfn(*cur)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.sum(leaf.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"probe": name, "batch": batch, "patch": patch,
                          "compile_s": round(compile_s, 1),
                          "ms": round(float(np.median(ts)) * 1e3, 1)}),
              flush=True)

    for name in names:
        if name == "head_fwd":
            def fwd(params, bs, d):
                sr = model.apply({"params": params, "batch_stats": bs},
                                 d["lr"], d["expert_outputs"],
                                 d["expert_features"])
                return jnp.sum(sr.astype(jnp.float32))
            timeit(name, fwd, state.params, state.batch_stats, data)
        elif name == "head_fwdbwd":
            def fb(params, bs, d):
                def loss(p):
                    sr, _ = model.apply(
                        {"params": p, "batch_stats": bs},
                        d["lr"], d["expert_outputs"], d["expert_features"],
                        True, rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=["batch_stats"])
                    return jnp.mean(jnp.abs(jnp.clip(sr, 0, 1) - d["hr"]))
                l, g = jax.value_and_grad(loss)(params)
                return l
            timeit(name, fb, state.params, state.batch_stats, data)
        elif name in ("cached_l1", "cached_full"):
            weights = ({"l1": 1.0, "ssim": 0, "fft": 0, "charbonnier": 0,
                        "l2": 0, "vgg": 0, "swt": 0, "edge": 0}
                       if name == "cached_l1" else
                       {"l1": 1.0, "ssim": 0.1, "fft": 0.05,
                        "charbonnier": 0, "l2": 0, "vgg": 0, "swt": 0,
                        "edge": 0})
            crit = CombinedLoss(weights)
            step = make_train_step(model, crit, tx)

            def run(st, d, r):
                st2, metrics = step(st, d, r)
                return metrics["total"]
            timeit(name, run, state, data, drng)
        elif name == "live_full":
            from freqfusion_tpu.models.experts import FreqFusionSR
            from freqfusion_tpu.training.steps import (
                TrainState, make_frozen_expert_optimizer,
                make_live_train_step)
            from freqfusion_tpu.utils.runtime import fast_random_variables

            lmodel = FreqFusionSR(FusionConfig(use_pallas=True),
                                  hat_kwargs=dict(use_pallas=True),
                                  dat_kwargs=dict(use_pallas=True),
                                  nafnet_kwargs=dict(use_pallas=True))
            ltx = make_frozen_expert_optimizer(
                warmup_then_cosine_restarts(1.5e-4, 5, 50))

            class _Init:
                def init(self, rng_, lr_):
                    return lmodel.init(rng_, lr_, with_features=True)

            variables = fast_random_variables(_Init(), data["lr"])
            lstate = TrainState(variables["params"],
                                variables.get("batch_stats", {}),
                                ltx.init(variables["params"]), jnp.asarray(0))
            lstate = jax.device_put(lstate)
            crit = CombinedLoss({"l1": 1.0, "ssim": 0.1, "fft": 0.05,
                                 "charbonnier": 0, "l2": 0, "vgg": 0,
                                 "swt": 0, "edge": 0})
            lstep = make_live_train_step(lmodel, crit, ltx)

            def lrun(st, d, r):
                st2, metrics = lstep(st, d, r)
                return metrics["total"]
            timeit(name, lrun, lstate,
                   {"lr": data["lr"], "hr": data["hr"]}, drng)
        else:
            raise ValueError(name)


if __name__ == "__main__":
    main()
