#!/usr/bin/env python
"""Decompose the cached train step's BACKWARD cost (r5): bench_train
measured 6.3 s/step at batch 14 / 64-px patches while the head forward is
only 152 ms — a ~40x fwd/bwd ratio that smells like a conv-VJP or resize-VJP
pathology on this backend. probe_train's earlier 'cached_full 180 ms' was
a DCE artifact (the wrapper returned only the loss, so XLA pruned the
backward — lesson recorded in PERF.md).

Times value_and_grad of l1(head(x)) with each FusionConfig enable-flag
toggled off (probe_head.py methodology, full-state output so nothing is
DCE'd); the delta vs the full config is that component's fwd+bwd cost.

Usage: python scripts/probe_headbwd.py [probe ...]   (TPU)
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

TOGGLES = [
    "step_l1",      # the exact make_train_step (optimizer incl.), l1 loss
    "full",
    "no_hierarchical",
    "no_lka",
    "no_edge_enhance",
    "no_multi_domain_freq",
    "no_dynamic_selection",
    "no_cross_band_attn",
    "no_adaptive_bands",
    "no_multi_resolution",
    "no_collaborative",
    "loss_ssim",
    "loss_fft",
]


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

    batch = int(os.environ.get("FREQFUSION_TRAIN_BATCH", "14"))
    patch = int(os.environ.get("FREQFUSION_TRAIN_PATCH", "64"))
    names = sys.argv[1:] or TOGGLES
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
    data = jax.device_put(data)

    def timeit(name, cfg, weights, iters=3):
        model = FusionHead(cfg)
        variables = model.init(jax.random.PRNGKey(0), data["lr"],
                               data["expert_outputs"],
                               data["expert_features"])
        params = jax.device_put(variables["params"])
        bs = jax.device_put(variables.get("batch_stats", {}))
        crit = CombinedLoss(weights)

        def loss_fn(p, d):
            sr, _ = model.apply(
                {"params": p, "batch_stats": bs},
                d["lr"], d["expert_outputs"], d["expert_features"], True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            total, _ = crit(jnp.clip(sr, 0.0, 1.0), d["hr"])
            return total

        # return the FULL grad tree so nothing can be dead-code-eliminated
        jfn = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.time()
        l, g = jfn(params, data)
        _ = float(l) + float(jnp.sum(jax.tree_util.tree_leaves(g)[0]))
        compile_s = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            l, g = jfn(params, data)
            _ = float(l) + float(jnp.sum(jax.tree_util.tree_leaves(g)[0]))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"probe": name, "batch": batch, "patch": patch,
                          "compile_s": round(compile_s, 1),
                          "ms": round(float(np.median(ts)) * 1e3, 1)}),
              flush=True)

    L1 = {"l1": 1.0, "ssim": 0, "fft": 0, "charbonnier": 0,
          "l2": 0, "vgg": 0, "swt": 0, "edge": 0}

    def timeit_step(name, weights, iters=3):
        """The exact production step (make_train_step, donated) — bridges
        the value_and_grad probes to bench_train's number."""
        from freqfusion_tpu.training.schedule import warmup_then_cosine_restarts
        from freqfusion_tpu.training.steps import (init_train_state,
                                                   make_optimizer,
                                                   make_train_step)
        model = FusionHead(FusionConfig())
        tx = make_optimizer(warmup_then_cosine_restarts(1.5e-4, 5, 50))
        state = jax.device_put(init_train_state(
            model, tx, jax.random.PRNGKey(0), data))
        step = make_train_step(model, CombinedLoss(weights), tx)
        jfn = jax.jit(step, donate_argnums=0)
        drng = jax.random.PRNGKey(1)
        t0 = time.time()
        state, metrics = jfn(state, data, drng)
        _ = float(metrics["total"])
        compile_s = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            state, metrics = jfn(state, data, drng)
            _ = float(metrics["total"])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"probe": name, "batch": batch, "patch": patch,
                          "compile_s": round(compile_s, 1),
                          "ms": round(float(np.median(ts)) * 1e3, 1)}),
              flush=True)

    for name in names:
        if name == "step_l1":
            timeit_step(name, L1)
        elif name == "step_full":
            # the EXACT bench_train cached program (stage-1 weights +
            # optimizer): if this reproduces ~6.3 s while step_l1 and the
            # single-term value_and_grad probes stay <0.5 s, the pathology
            # is the ssim+fft COMBINATION in one graph
            timeit_step(name, {**L1, "ssim": 0.1, "fft": 0.05})
        elif name == "step_ssim":
            timeit_step(name, {**L1, "ssim": 0.1})
        elif name == "step_fft":
            timeit_step(name, {**L1, "fft": 0.05})
        elif name == "full":
            timeit(name, FusionConfig(), L1)
        elif name.startswith("no_"):
            timeit(name, FusionConfig(**{f"enable_{name[3:]}": False}), L1)
        elif name == "loss_ssim":
            timeit(name, FusionConfig(), {**L1, "ssim": 0.1})
        elif name == "loss_fft":
            timeit(name, FusionConfig(), {**L1, "fft": 0.05})
        else:
            raise ValueError(name)


if __name__ == "__main__":
    main()
