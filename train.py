#!/usr/bin/env python
"""Training driver (reference train.py equivalent, TPU-native).

Full loop: YAML config + CLI overrides → seeding → cached (or live-expert)
dataloaders → FusionHead build → CombinedLoss with the 3-stage curriculum →
AdamW + warmup + CosineAnnealingWarmRestarts + grad-accum → EMA →
CheckpointManager (atomic, best-K, resume incl. historical best) →
data-parallel jitted step over the device mesh → per-epoch validation
(PSNR/SSIM, Y channel, border 4) with EMA-applied weights.

Cached mode (the 10–20× path, reference train.py:251-383) trains the
~1.2M-param fusion head against precomputed expert outputs/features produced
by scripts/extract_features.py. Live mode runs the frozen experts inside the
same jitted step.
"""

import argparse
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_config(path: str, overrides: argparse.Namespace) -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if overrides.batch_size:
        cfg["data"]["batch_size"] = overrides.batch_size
    if overrides.epochs:
        cfg["train"]["epochs"] = overrides.epochs
    if overrides.data_root:
        cfg["data"]["root"] = overrides.data_root
    if overrides.cached is not None:
        cfg["data"]["cached"] = overrides.cached
    if overrides.debug:
        cfg["train"]["epochs"] = min(cfg["train"]["epochs"], 2)
        cfg["data"]["batch_size"] = min(cfg["data"]["batch_size"], 2)
        cfg["data"]["repeat"] = 1
        cfg["train"]["validate_every"] = 1
    return cfg


def build_model(cfg: dict):
    from freqfusion_tpu.models.fusion import FusionConfig, FusionHead

    m = cfg["model"]
    fc = FusionConfig(
        fusion_dim=m["fusion_dim"], num_heads=m["num_heads"],
        refine_depth=m["refine_depth"], refine_channels=m["refine_channels"],
        enable_hierarchical=m["enable_hierarchical"],
        enable_lka=m["enable_lka"],
        enable_edge_enhance=m["enable_edge_enhance"],
        enable_multi_domain_freq=m["enable_multi_domain_freq"],
        enable_dynamic_selection=m["enable_dynamic_selection"],
        enable_cross_band_attn=m["enable_cross_band_attn"],
        enable_adaptive_bands=m["enable_adaptive_bands"],
        enable_multi_resolution=m["enable_multi_resolution"],
        enable_collaborative=m["enable_collaborative"])
    return FusionHead(fc)


def train(cfg: dict):
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.data.cached import CachedFeatureDataset, batch_iterator
    from freqfusion_tpu.losses import CombinedLoss
    from freqfusion_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated_sharding)
    from freqfusion_tpu.training.checkpoint import CheckpointManager
    from freqfusion_tpu.training.ema import EMA
    from freqfusion_tpu.training.schedule import (
        MultiStageLossScheduler, warmup_then_cosine_restarts)
    from freqfusion_tpu.training.steps import (
        TrainState, init_train_state, make_eval_step, make_optimizer,
        make_train_step)
    from freqfusion_tpu.utils.logger import MetricsLogger, ProgressLogger, get_file_logger
    from freqfusion_tpu.utils.metrics import MetricCalculator
    from freqfusion_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    log = get_file_logger("train", os.path.join(cfg["train"]["log_dir"], "train.log"))
    rng = np.random.default_rng(cfg["seed"])

    # ---- data -----------------------------------------------------------
    live_mode = not cfg["data"]["cached"]
    if live_mode:
        return train_live(cfg, log)
    train_ds = CachedFeatureDataset(cfg["data"]["cached_train_dir"],
                                    augment=True, seed=cfg["seed"])
    val_ds = CachedFeatureDataset(cfg["data"]["cached_val_dir"], augment=False)
    log.info(f"train samples: {len(train_ds)}, val samples: {len(val_ds)}")

    # ---- model / loss / optim ------------------------------------------
    model = build_model(cfg)
    stages = MultiStageLossScheduler(cfg["loss"]["stages"])
    criterion = CombinedLoss(stages.weights_for_epoch(0),
                             swt_wavelet=cfg["loss"]["swt_wavelet"],
                             swt_level=cfg["loss"]["swt_level"])

    batch_size = cfg["data"]["batch_size"]
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    opt_cfg = cfg["optim"]
    schedule = warmup_then_cosine_restarts(
        opt_cfg["lr"], opt_cfg["warmup_epochs"] * steps_per_epoch,
        opt_cfg["t0_epochs"] * steps_per_epoch, opt_cfg["t_mult"])
    tx = make_optimizer(schedule, opt_cfg["weight_decay"],
                        opt_cfg["grad_clip"], opt_cfg["accumulation_steps"])

    sample = next(batch_iterator(train_ds, batch_size, seed=0))
    sample = {k: (jnp.asarray(v) if not isinstance(v, dict)
                  else {kk: jnp.asarray(vv) for kk, vv in v.items()})
              for k, v in sample.items()}
    state = init_train_state(model, tx, jax.random.PRNGKey(cfg["seed"]), sample)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(state.params))
    log.info(f"trainable fusion-head params: {n_params/1e6:.2f}M")

    # ---- mesh -----------------------------------------------------------
    mesh = make_mesh(cfg["parallel"]["n_devices"])
    repl, data_sh = replicated_sharding(mesh), batch_sharding(mesh)
    state = jax.device_put(state, repl)
    ema = EMA(state.params, cfg["ema"]["decay"]) if cfg["ema"]["enabled"] else None

    ckpt = CheckpointManager(cfg["train"]["checkpoint_dir"],
                             max_best=cfg["train"]["max_best"],
                             save_every=cfg["train"]["save_every"])
    metrics_log = MetricsLogger(cfg["train"]["log_dir"])

    # ---- resume ---------------------------------------------------------
    start_epoch = 0
    resumed = ckpt.load()
    if resumed is not None:
        from flax import serialization
        opt_state = serialization.from_state_dict(
            jax.device_get(state.opt_state), resumed["opt_state"])
        state = jax.device_put(TrainState(
            resumed["params"], resumed["batch_stats"],
            jax.tree_util.tree_map(jnp.asarray, opt_state),
            jnp.asarray(resumed.get("step", 0))), repl)
        if ema and resumed.get("ema_state"):
            ema.load_state_dict(resumed["ema_state"])
        start_epoch = int(resumed["epoch"]) + 1
        log.info(f"resumed from epoch {resumed['epoch']} "
                 f"(best {ckpt.best_value()})")

    eval_step = jax.jit(make_eval_step(model))
    train_step = None
    current_stage = None

    progress = ProgressLogger(cfg["train"]["epochs"])
    global_step = int(state.step)

    for epoch in range(start_epoch, cfg["train"]["epochs"]):
        # stage transitions re-jit the step with the new loss set
        stage_idx = stages.stage_index(epoch)
        if stage_idx != current_stage:
            current_stage = stage_idx
            criterion.set_weights(stages.weights_for_epoch(epoch))
            log.info("loss " + stages.describe(epoch))
            # donate the state (params+opt-state): the old buffers are dead
            # after each step, so XLA aliases them instead of double-buffering
            train_step = jax.jit(make_train_step(model, criterion, tx),
                                 in_shardings=(repl, data_sh, repl),
                                 out_shardings=(repl, repl),
                                 donate_argnums=0)

        n_images = 0
        from freqfusion_tpu.data.cached import prefetch
        for batch in prefetch(batch_iterator(train_ds, batch_size, shuffle=True,
                                             seed=cfg["seed"] + epoch)):
            batch = jax.device_put(batch, data_sh)
            drng = jax.device_put(
                jax.random.PRNGKey(rng.integers(2**31)), repl)
            state, metrics = train_step(state, batch, drng)
            if ema:
                ema.update(state.params)
            global_step += 1
            n_images += batch_size
            if global_step % cfg["train"]["print_freq"] == 0:
                metrics_log.scalars(
                    {k: float(v) for k, v in metrics.items()}, global_step,
                    prefix="train/")
                metrics_log.scalars(
                    {"lr": float(schedule(global_step))}, global_step, "opt/")
            if global_step % (cfg["train"]["print_freq"] * 10) == 0:
                metrics_log.histograms(jax.device_get(state.params),
                                       global_step, prefix="params/")

        log.info(progress.epoch_summary(epoch, n_images))

        # ---- validation -------------------------------------------------
        do_val = (epoch >= cfg["train"]["validate_start"]
                  and epoch % cfg["train"]["validate_every"] == 0)
        val_metrics = {}
        if do_val:
            eval_params = ema.apply(state.params) if ema else state.params
            eval_state = state._replace(params=eval_params)
            calc = MetricCalculator(crop_border=4, y_channel=True)
            shown = False
            for batch in batch_iterator(val_ds, batch_size, shuffle=False,
                                        drop_last=False):
                pad = batch_size - batch["lr"].shape[0]
                if pad:  # static-shape batch padding
                    batch = jax.tree_util.tree_map(
                        lambda a: np.concatenate([a, a[-1:].repeat(pad, 0)]), batch)
                sr = np.asarray(eval_step(eval_state, jax.device_put(batch, data_sh)))
                n_real = batch_size - pad
                calc.update(sr[:n_real], batch["hr"][:n_real])
                if not shown:
                    metrics_log.images("val/lr_sr_hr", batch["lr"][0], sr[0],
                                       batch["hr"][0], epoch)
                    shown = True
            if ema:
                state = state._replace(params=ema.restore())
            val_metrics = calc.compute()
            metrics_log.scalars({"psnr": val_metrics["psnr"],
                                 "ssim": val_metrics["ssim"]}, epoch, "val/")
            log.info(f"  val: PSNR {val_metrics['psnr']:.3f} dB, "
                     f"SSIM {val_metrics['ssim']:.4f}")

        # ---- checkpointing ---------------------------------------------
        is_best = bool(val_metrics) and ckpt.is_best(val_metrics["psnr"])
        if is_best or ckpt.should_save(epoch):
            payload = {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
                "step": int(state.step),
                "ema_state": ema.state_dict() if ema else {},
            }
            ckpt.save_checkpoint(epoch, payload,
                                 val_metrics or {"psnr": 0.0}, is_best)

    metrics_log.close()
    log.info(f"done; best PSNR {ckpt.best_value()}")
    return ckpt.best_value()


def train_live(cfg: dict, log):
    """Live-expert training at full reference parity (train.py:413-523,
    640-659, 715-801, 908-974): frozen experts in-graph, EMA over the
    trainable fusion subtree, per-epoch validation (PSNR/SSIM, Y, border 4)
    on fixed-shape center crops, best-K checkpoints with resume, prefetch,
    and mesh data-parallel sharding. ~10–20× slower than cached mode."""
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.data.augment import CenterCrop, TrainAugmentation
    from freqfusion_tpu.data.cached import prefetch
    from freqfusion_tpu.data.dataset import SRDataset, find_split_dirs
    from freqfusion_tpu.infer.io import _load_expert_params
    from freqfusion_tpu.losses import CombinedLoss
    from freqfusion_tpu.models.experts import FreqFusionSR
    from freqfusion_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated_sharding)
    from freqfusion_tpu.training.checkpoint import CheckpointManager
    from freqfusion_tpu.training.ema import EMA
    from freqfusion_tpu.training.schedule import (
        MultiStageLossScheduler, warmup_then_cosine_restarts)
    from freqfusion_tpu.training.steps import (
        TrainState, init_live_train_state, make_frozen_expert_optimizer,
        make_live_eval_step, make_live_train_step)
    from freqfusion_tpu.utils.logger import MetricsLogger, ProgressLogger
    from freqfusion_tpu.utils.metrics import MetricCalculator

    import numpy as np

    lr_dir, hr_dir = find_split_dirs(cfg["data"]["root"], "train",
                                     cfg["data"]["scale"])
    ds = SRDataset(lr_dir, hr_dir, cfg["data"]["lr_patch"],
                   cfg["data"]["scale"], repeat=cfg["data"]["repeat"],
                   augment=TrainAugmentation(cfg["data"]["lr_patch"],
                                             cfg["data"]["scale"],
                                             seed=cfg["seed"]))
    try:
        va_lr, va_hr = find_split_dirs(cfg["data"]["root"], "val",
                                       cfg["data"]["scale"])
        val_ds = SRDataset(va_lr, va_hr, cfg["data"]["lr_patch"],
                           cfg["data"]["scale"],
                           augment=CenterCrop(cfg["data"]["lr_patch"],
                                              cfg["data"]["scale"]))
    except FileNotFoundError:
        val_ds = None
    log.info(f"live mode: {len(ds)} train samples, "
             f"{len(val_ds) if val_ds else 0} val samples "
             "(frozen experts in-graph)")

    expert_kwargs = cfg["model"].get("expert_kwargs") or {}
    model = FreqFusionSR(build_model(cfg).cfg, **expert_kwargs)
    model_dir = cfg.get("model_dir", "model_zoo/team29")
    batch_size = cfg["data"]["batch_size"]
    steps_per_epoch = max(len(ds) // batch_size, 1)
    opt_cfg = cfg["optim"]
    schedule = warmup_then_cosine_restarts(
        opt_cfg["lr"], opt_cfg["warmup_epochs"] * steps_per_epoch,
        opt_cfg["t0_epochs"] * steps_per_epoch, opt_cfg["t_mult"])
    tx = make_frozen_expert_optimizer(schedule, opt_cfg["weight_decay"],
                                      opt_cfg["grad_clip"],
                                      opt_cfg["accumulation_steps"])
    stages = MultiStageLossScheduler(cfg["loss"]["stages"])
    criterion = CombinedLoss(stages.weights_for_epoch(0),
                             swt_wavelet=cfg["loss"]["swt_wavelet"],
                             swt_level=cfg["loss"]["swt_level"])

    def batch_iter(dataset, epoch, shuffle=True):
        brng = np.random.default_rng(cfg["seed"] + epoch)
        order = brng.permutation(len(dataset)) if shuffle \
            else np.arange(len(dataset))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            items = [dataset[int(j)] for j in order[i:i + batch_size]]
            yield {"lr": np.stack([it["lr"] for it in items]),
                   "hr": np.stack([it["hr"] for it in items])}

    rng = np.random.default_rng(cfg["seed"])
    sample = next(batch_iter(ds, 0, shuffle=False))
    state = init_live_train_state(model, tx, jax.random.PRNGKey(cfg["seed"]),
                                  sample)
    # converted expert checkpoints replace the random-initialized experts
    vars_np = {"params": jax.device_get(dict(state.params))}
    vars_np = _load_expert_params(vars_np, model_dir)
    state = state._replace(params=jax.tree_util.tree_map(
        jnp.asarray, vars_np["params"]))

    mesh = make_mesh(cfg["parallel"]["n_devices"])
    repl, data_sh = replicated_sharding(mesh), batch_sharding(mesh)
    state = jax.device_put(state, repl)
    # EMA shadows only the trainable fusion subtree (the frozen experts never
    # move); mirrors the reference's EMA over head params (train.py:908-912)
    ema = (EMA(state.params["fusion"], cfg["ema"]["decay"])
           if cfg["ema"]["enabled"] else None)

    ckpt = CheckpointManager(cfg["train"]["checkpoint_dir"],
                             max_best=cfg["train"]["max_best"],
                             save_every=cfg["train"]["save_every"])
    metrics_log = MetricsLogger(cfg["train"]["log_dir"])

    start_epoch = 0
    resumed = ckpt.load()
    if resumed is not None:
        from flax import serialization
        params = dict(jax.device_get(state.params))
        params["fusion"] = resumed["params"]["fusion"] \
            if "fusion" in resumed["params"] else resumed["params"]
        opt_state = serialization.from_state_dict(
            jax.device_get(state.opt_state), resumed["opt_state"])
        state = jax.device_put(TrainState(
            jax.tree_util.tree_map(jnp.asarray, params),
            jax.tree_util.tree_map(jnp.asarray, resumed["batch_stats"]),
            jax.tree_util.tree_map(jnp.asarray, opt_state),
            jnp.asarray(resumed.get("step", 0))), repl)
        if ema and resumed.get("ema_state"):
            ema.load_state_dict(resumed["ema_state"])
        start_epoch = int(resumed["epoch"]) + 1
        log.info(f"resumed live training from epoch {resumed['epoch']} "
                 f"(best {ckpt.best_value()})")

    eval_step = jax.jit(make_live_eval_step(model))
    train_step = None
    current_stage = None
    progress = ProgressLogger(cfg["train"]["epochs"])
    global_step = int(state.step)

    for epoch in range(start_epoch, cfg["train"]["epochs"]):
        stage_idx = stages.stage_index(epoch)
        if stage_idx != current_stage:
            current_stage = stage_idx
            criterion.set_weights(stages.weights_for_epoch(epoch))
            log.info("loss " + stages.describe(epoch))
            # donation matters most here: the state carries the ~100M frozen
            # expert params — without aliasing every step double-buffers them
            train_step = jax.jit(make_live_train_step(model, criterion, tx),
                                 in_shardings=(repl, data_sh, repl),
                                 out_shardings=(repl, repl),
                                 donate_argnums=0)

        n_images = 0
        for batch in prefetch(batch_iter(ds, epoch)):
            batch = jax.device_put(batch, data_sh)
            drng = jax.device_put(
                jax.random.PRNGKey(int(rng.integers(2**31))), repl)
            state, metrics = train_step(state, batch, drng)
            if ema:
                ema.update(state.params["fusion"])
            global_step += 1
            n_images += batch_size
            if global_step % cfg["train"]["print_freq"] == 0:
                metrics_log.scalars(
                    {k: float(v) for k, v in metrics.items()}, global_step,
                    prefix="train/")
                metrics_log.scalars(
                    {"lr": float(schedule(global_step))}, global_step, "opt/")
        log.info(progress.epoch_summary(epoch, n_images))

        do_val = (val_ds is not None
                  and epoch >= cfg["train"]["validate_start"]
                  and epoch % cfg["train"]["validate_every"] == 0)
        val_metrics = {}
        if do_val:
            if ema:
                params = dict(state.params)
                params["fusion"] = ema.apply(state.params["fusion"])
                eval_state = state._replace(params=params)
            else:
                eval_state = state
            calc = MetricCalculator(crop_border=4, y_channel=True)
            for batch in batch_iter(val_ds, 0, shuffle=False):
                sr = np.asarray(eval_step(eval_state,
                                          jax.device_put(batch, data_sh)))
                calc.update(sr, batch["hr"])
            if ema:
                ema.restore()
            val_metrics = calc.compute()
            metrics_log.scalars({"psnr": val_metrics["psnr"],
                                 "ssim": val_metrics["ssim"]}, epoch, "val/")
            log.info(f"  val: PSNR {val_metrics['psnr']:.3f} dB, "
                     f"SSIM {val_metrics['ssim']:.4f}")

        is_best = bool(val_metrics) and ckpt.is_best(val_metrics["psnr"])
        if is_best or ckpt.should_save(epoch):
            # only the trainable head + stats are checkpointed (~12 MB, the
            # reference fusion-ckpt schema); experts reload from model_zoo
            ckpt.save_checkpoint(epoch, {
                "params": {"fusion": jax.device_get(state.params["fusion"])},
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
                "step": int(state.step),
                "ema_state": ema.state_dict() if ema else {}},
                val_metrics or {"psnr": 0.0}, is_best)

    metrics_log.close()
    log.info(f"live done; best PSNR {ckpt.best_value()}")
    return ckpt.best_value()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train_config.yaml")
    ap.add_argument("--batch_size", type=int)
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--data_root", type=str)
    ap.add_argument("--cached", action=argparse.BooleanOptionalAction, default=None)
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()
    cfg = load_config(args.config, args)
    train(cfg)


if __name__ == "__main__":
    main()
