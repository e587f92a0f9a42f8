#!/usr/bin/env python
"""Cached-mode training throughput (imgs/sec) — the reference's per-epoch
rate metric (train.py:1160-1163 prints imgs/sec; BASELINE.md rows
"Cached-training speedup 10-20x" and the batch-14 / 64x64-LR-patch recipe).

Measures the jitted FusionHead train step (CombinedLoss stage-1 weights,
AdamW + clip, the production cached path) on synthetic batches at the
reference's training shapes: LR 64x64, HR 256x256, batch 14 (override via
env). Steady-state over N steps, compile excluded. Data-parallel over all
local devices when more than one is visible.

FREQFUSION_TRAIN_MODE=live benches the live-expert step instead (frozen
experts in-graph, the reference's non-cached path, train.py:413-523) so the
cached-vs-live speedup claim (cached_dataset.py:43: "10-20x") gets a
measured TPU counterpart.

Usage: python scripts/bench_train.py  [env: FREQFUSION_TRAIN_BATCH,
FREQFUSION_TRAIN_PATCH, FREQFUSION_TRAIN_STEPS, FREQFUSION_BENCH_DTYPE,
FREQFUSION_TRAIN_MODE=cached|live]
Prints one JSON line {"metric": "..._train_imgs_per_sec", ...}.
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
    steps = int(os.environ.get("FREQFUSION_TRAIN_STEPS", "20"))
    dtype = os.environ.get("FREQFUSION_BENCH_DTYPE", "float32")
    mode = os.environ.get("FREQFUSION_TRAIN_MODE", "cached")

    n_dev = len(jax.devices())
    if n_dev > 1:
        batch += (-batch) % n_dev

    # stage-1 weights of the reference curriculum (configs/train_config.yaml)
    criterion = CombinedLoss({"l1": 1.0, "ssim": 0.1, "fft": 0.05,
                              "charbonnier": 0, "l2": 0, "vgg": 0,
                              "swt": 0, "edge": 0})

    rng = np.random.default_rng(0)
    s = 4

    def mk(shape):
        return jnp.asarray(rng.uniform(size=shape), jnp.float32)

    if mode == "live":
        from freqfusion_tpu.models.experts import FreqFusionSR
        from freqfusion_tpu.training.steps import (TrainState,
                                                   make_frozen_expert_optimizer,
                                                   make_live_train_step)
        from freqfusion_tpu.utils.runtime import fast_random_variables

        model = FreqFusionSR(FusionConfig(use_pallas=True),
                             hat_kwargs=dict(use_pallas=True),
                             dat_kwargs=dict(use_pallas=True),
                             nafnet_kwargs=dict(use_pallas=True))
        tx = make_frozen_expert_optimizer(
            warmup_then_cosine_restarts(1.5e-4, 5, 50))
        data = {"lr": mk((batch, patch, patch, 3)),
                "hr": mk((batch, s * patch, s * patch, 3))}
        # weight values don't affect throughput; real init costs minutes.
        # with_features must bind statically (eval_shape traces positional
        # args, and `if with_features` needs a concrete bool)
        class _Init:
            def init(self, rng, lr):
                return model.init(rng, lr, with_features=True)

        variables = fast_random_variables(_Init(), data["lr"])
        state = TrainState(variables["params"],
                           variables.get("batch_stats", {}),
                           tx.init(variables["params"]), jnp.asarray(0))
        step_fn = make_live_train_step(model, criterion, tx)
    else:
        model = FusionHead(FusionConfig())
        tx = make_optimizer(warmup_then_cosine_restarts(1.5e-4, 5, 50))
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
        state = init_train_state(model, tx, jax.random.PRNGKey(0), data)
        step_fn = make_train_step(model, criterion, tx)
    if dtype == "bfloat16":
        data = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), data)
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from freqfusion_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_dev)
        repl = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, repl)
        data = jax.device_put(data, dsh)
        drng = jax.device_put(jax.random.PRNGKey(1), repl)
        jitted = jax.jit(step_fn, in_shardings=(repl, dsh, repl),
                         out_shardings=(repl, repl), donate_argnums=0)
    else:
        state = jax.device_put(state)
        data = jax.device_put(data)
        drng = jax.random.PRNGKey(1)
        jitted = jax.jit(step_fn, donate_argnums=0)

    t0 = time.time()
    state, metrics = jitted(state, data, drng)
    # fence with a scalar readback (block_until_ready is a no-op on the
    # remote backend — PERF.md methodology)
    loss0 = float(metrics["total"])
    compile_s = time.time() - t0
    print(f"# first step {compile_s:.1f}s (incl. compile), loss {loss0:.4f}",
          file=sys.stderr, flush=True)

    t0 = time.time()
    for _ in range(steps):
        state, metrics = jitted(state, data, drng)
    _ = float(metrics["total"])  # fence
    dt = (time.time() - t0) / steps
    rate = batch / dt
    print(json.dumps({"metric": f"{mode}_train_imgs_per_sec",
                      "value": round(rate, 2), "unit": "imgs/s",
                      "batch": batch, "patch": patch, "dtype": dtype,
                      "devices": n_dev,
                      "step_ms": round(dt * 1e3, 1)}))


if __name__ == "__main__":
    main()
