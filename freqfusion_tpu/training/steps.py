"""Jitted train/eval steps for fusion-head training (cached mode).

The production training path (train.py:251-383 in the reference) feeds
precomputed expert outputs/features from the cached dataset, so the step
trains only the ~1.2M-param FusionHead. Data-parallel over the mesh: batch
sharded on ('data',), params/opt-state replicated; XLA inserts the gradient
psum. Gradient accumulation uses optax.MultiSteps (reference
accumulation_steps, train.py:163-221); clipping at global-norm 1.0.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import CombinedLoss
from ..models.fusion import FusionHead


class TrainState(NamedTuple):
    params: Dict
    batch_stats: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr_schedule, weight_decay: float = 1e-4,
                   clip_norm: float = 1.0, accum_steps: int = 1):
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr_schedule, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def init_train_state(model: FusionHead, tx, rng, sample_batch) -> TrainState:
    variables = model.init(
        rng, sample_batch["lr"], sample_batch["expert_outputs"],
        sample_batch.get("expert_features"))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), jnp.asarray(0))


def make_train_step(model: FusionHead, criterion: CombinedLoss, tx):
    """Returns a jittable step(state, batch, rng) → (state, metrics)."""

    def loss_fn(params, batch_stats, batch, rng):
        (sr, updates) = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["lr"], batch["expert_outputs"],
            batch.get("expert_features"), True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        sr = jnp.clip(sr, 0.0, 1.0)
        total, components = criterion(sr, batch["hr"])
        return total, (components, updates["batch_stats"])

    def step(state: TrainState, batch, rng):
        (loss, (components, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(components)
        metrics["grad_norm"] = gnorm
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    return step


def make_frozen_expert_optimizer(lr_schedule, weight_decay: float = 1e-4,
                                 clip_norm: float = 1.0, accum_steps: int = 1):
    """Live-mode optimizer: the 'experts' params subtree is frozen with
    optax.set_to_zero (no AdamW moments are ever allocated for the ~100M
    frozen expert params — the reference freezes with requires_grad=False,
    expert_loader.py:371-377), everything else gets the standard chain."""
    inner = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr_schedule, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )

    def labels(params):
        return {k: jax.tree_util.tree_map(
                    lambda _: "freeze" if k == "experts" else "train", v)
                for k, v in params.items()}

    tx = optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()},
                               labels)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def init_live_train_state(model, tx, rng, sample_batch) -> TrainState:
    """Live-expert mode: model is FreqFusionSR; only fusion params train."""
    variables = model.init(rng, sample_batch["lr"], with_features=True)
    return TrainState(variables["params"], variables.get("batch_stats", {}),
                      tx.init(variables["params"]), jnp.asarray(0))


def make_live_train_step(model, criterion: CombinedLoss, tx):
    """Train step for live mode (frozen experts inside the jitted program).

    Differentiates ONLY w.r.t. the non-expert subtree: the experts are
    strictly upstream of every trainable param, so passing their ~100M
    params as a non-differentiated argument prunes the entire expert
    weight-cotangent computation out of the backward pass (the reference
    gets the same effect from requires_grad=False,
    expert_loader.py:371-377). Expert updates are still explicitly zeroed
    so a plain (unmasked) AdamW's weight decay cannot touch frozen
    weights (reference enhanced_fusion.py:137)."""

    def loss_fn(train_params, expert_params, batch_stats, batch, rng):
        params = dict(train_params)
        if expert_params is not None:
            params["experts"] = expert_params
        sr, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["lr"], True, True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        sr = jnp.clip(sr, 0.0, 1.0)
        total, components = criterion(sr, batch["hr"])
        return total, (components, updates["batch_stats"])

    def step(state: TrainState, batch, rng):
        train_params = dict(state.params)
        expert_params = train_params.pop("experts", None)
        (loss, (components, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train_params, expert_params,
                                   state.batch_stats, batch, rng)
        # rebuild the full-tree grads the optimizer expects (zeros for the
        # frozen subtree — optax.multi_transform/set_to_zero never reads them)
        grads = dict(grads)
        if expert_params is not None:
            grads["experts"] = jax.tree_util.tree_map(
                jnp.zeros_like, expert_params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = dict(updates)
        if "experts" in updates:
            updates["experts"] = jax.tree_util.tree_map(
                jnp.zeros_like, updates["experts"])
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(components)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    return step


def make_live_eval_step(model):
    """Eval step for live mode (FreqFusionSR: experts in-graph, no features,
    train=False — mirrors the reference's validate_epoch live forward,
    train.py:413-523)."""

    def step(state: TrainState, batch):
        sr = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["lr"])
        return jnp.clip(sr, 0.0, 1.0)

    return step


def make_eval_step(model: FusionHead):
    def step(state: TrainState, batch):
        sr = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["lr"], batch["expert_outputs"],
            batch.get("expert_features"))
        return jnp.clip(sr, 0.0, 1.0)

    return step
