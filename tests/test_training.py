"""Training infra: schedules, EMA, train step, mesh-sharded step on 8 CPUs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.losses import CombinedLoss
from freqfusion_tpu.models.fusion import FusionConfig, FusionHead
from freqfusion_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated_sharding)
from freqfusion_tpu.training.ema import EMA
from freqfusion_tpu.training.schedule import (
    MultiStageLossScheduler, warmup_then_cosine_restarts)
from freqfusion_tpu.training.steps import (
    init_train_state, make_eval_step, make_optimizer, make_train_step)


def _tiny_model():
    return FusionHead(FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                                   refine_channels=8))


def _batch(b=2, h=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr": jnp.asarray(rng.uniform(size=(b, h, h, 3)), jnp.float32),
        "hr": jnp.asarray(rng.uniform(size=(b, 4 * h, 4 * h, 3)), jnp.float32),
        "expert_outputs": {
            k: jnp.asarray(rng.uniform(size=(b, 4 * h, 4 * h, 3)), jnp.float32)
            for k in ("hat", "dat", "nafnet")},
        "expert_features": {
            "hat": jnp.asarray(rng.normal(size=(b, h, h, 180)) * 0.1, jnp.float32),
            "dat": jnp.asarray(rng.normal(size=(b, h, h, 180)) * 0.1, jnp.float32),
            "nafnet": jnp.asarray(rng.normal(size=(b, h, h, 64)) * 0.1, jnp.float32),
        },
    }


def test_warmup_then_sgdr_schedule():
    sch = warmup_then_cosine_restarts(1e-3, warmup_steps=10, t0_steps=50, t_mult=2)
    assert float(sch(0)) < 1e-4          # warmup start
    assert abs(float(sch(10)) - 1e-3) < 1e-6
    assert float(sch(35)) < 1e-3          # decaying inside first cycle
    assert float(sch(61)) > float(sch(59))  # restart jumps back up


def test_sgdr_matches_torch_scheduler():
    """cosine_warm_restarts must track torch CosineAnnealingWarmRestarts."""
    torch = pytest.importorskip("torch")
    from freqfusion_tpu.training.schedule import cosine_warm_restarts

    base_lr, t0, t_mult = 1.5e-4, 50, 2
    sch = cosine_warm_restarts(base_lr, t0, t_mult)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    tsch = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=t_mult)
    for step in range(220):
        ours = float(sch(step))
        theirs = tsch.get_last_lr()[0]
        assert abs(ours - theirs) < 1e-8, (step, ours, theirs)
        opt.step()
        tsch.step()


def test_multistage_scheduler():
    stages = [
        {"epochs": [0, 80], "stage_name": "a", "weights": {"l1": 1.0}},
        {"epochs": [80, 150], "stage_name": "b", "weights": {"l1": 0.75, "swt": 0.2}},
        {"epochs": [150, 200], "stage_name": "c", "weights": {"l1": 0.6, "swt": 0.25}},
    ]
    s = MultiStageLossScheduler(stages)
    assert s.stage_index(0) == 0 and s.stage_index(79) == 0
    assert s.stage_index(80) == 1 and s.stage_index(199) == 2
    assert s.stage_index(500) == 2  # clamps
    assert s.is_transition(0) and not s.is_transition(5)
    assert s.is_transition(80)
    with pytest.raises(ValueError):
        MultiStageLossScheduler([{"epochs": [10, 20], "weights": {}}])


def test_ema_tracks_params():
    params = {"w": jnp.zeros(3)}
    ema = EMA(params, decay=0.5)
    ema.update({"w": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 0.5)
    live = ema.apply({"w": jnp.full(3, 7.0)})
    np.testing.assert_allclose(np.asarray(live["w"]), 0.5)
    back = ema.restore()
    np.testing.assert_allclose(np.asarray(back["w"]), 7.0)
    state = ema.state_dict()
    ema2 = EMA(params)
    ema2.load_state_dict(state)
    np.testing.assert_allclose(np.asarray(ema2.shadow["w"]), 0.5)


def test_train_step_decreases_loss():
    model = _tiny_model()
    criterion = CombinedLoss({"l1": 1.0, "charbonnier": 0, "l2": 0, "vgg": 0,
                              "swt": 0, "fft": 0, "edge": 0, "ssim": 0})
    tx = make_optimizer(lambda _: 1e-2)
    batch = _batch()
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, criterion, tx))
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_train_step_sharded_on_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    model = _tiny_model()
    criterion = CombinedLoss({"l1": 1.0, "charbonnier": 0, "l2": 0, "vgg": 0,
                              "swt": 0, "fft": 0, "edge": 0, "ssim": 0})
    tx = make_optimizer(lambda _: 1e-3)
    batch = _batch(b=8)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)

    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    state = jax.device_put(state, repl)
    batch = jax.device_put(batch, data)
    rng = jax.device_put(jax.random.PRNGKey(1), repl)
    step = jax.jit(make_train_step(model, criterion, tx),
                   in_shardings=(repl, data, repl), out_shardings=(repl, repl))
    new_state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["total"]))
    # params stayed replicated and identical across devices
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_live_train_step_matches_full_diff():
    """The production live step differentiates only the non-expert subtree
    (the experts are upstream of every trainable param, so their weight
    cotangents are pure waste). It must be numerically identical to a
    naive twin that differentiates the FULL tree and zeroes expert grads."""
    import optax
    from freqfusion_tpu.models.experts import FreqFusionSR
    from freqfusion_tpu.training.steps import (
        TrainState, init_live_train_state, make_live_train_step)

    tiny = dict(
        hat_kwargs=dict(embed_dim=24, depths=(1,), num_heads=(2,), window=4,
                        squeeze=6),
        dat_kwargs=dict(embed_dim=32, depths=(1,), num_heads=(2,),
                        split_size=(2, 4), expansion=2.0),
        nafnet_kwargs=dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                           dec_blk_nums=(1, 1)))
    model = FreqFusionSR(FusionConfig(fusion_dim=16, num_heads=2,
                                      refine_depth=2, refine_channels=8), **tiny)
    criterion = CombinedLoss({"l1": 1.0, "charbonnier": 0, "l2": 0, "vgg": 0,
                              "swt": 0.2, "fft": 0.05, "edge": 0, "ssim": 0})
    tx = make_optimizer(lambda _: 1e-2)
    rng = np.random.default_rng(1)
    batch = {"lr": jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32),
             "hr": jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)}
    state = init_live_train_state(model, tx, jax.random.PRNGKey(0), batch)

    def full_diff_step(state, batch, drng):
        def loss_fn(params, batch_stats):
            sr, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["lr"], True, True,
                rngs={"dropout": drng}, mutable=["batch_stats"])
            sr = jnp.clip(sr, 0.0, 1.0)
            total, components = criterion(sr, batch["hr"])
            return total, (components, updates["batch_stats"])

        (_, (components, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        grads = dict(grads)
        grads["experts"] = jax.tree_util.tree_map(jnp.zeros_like,
                                                  grads["experts"])
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = dict(updates)
        updates["experts"] = jax.tree_util.tree_map(jnp.zeros_like,
                                                    updates["experts"])
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), \
            dict(components)

    drng = jax.random.PRNGKey(1)
    prod_state, prod_metrics = jax.jit(
        make_live_train_step(model, criterion, tx))(state, batch, drng)
    ref_state, ref_metrics = jax.jit(full_diff_step)(state, batch, drng)

    np.testing.assert_allclose(float(prod_metrics["total"]),
                               float(ref_metrics["total"]), rtol=1e-6)
    for p, r in zip(jax.tree_util.tree_leaves(prod_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=2e-6, atol=2e-7)


def test_live_train_step_freezes_experts():
    from freqfusion_tpu.models.experts import FreqFusionSR
    from freqfusion_tpu.training.steps import (
        init_live_train_state, make_live_train_step)

    tiny = dict(
        hat_kwargs=dict(embed_dim=24, depths=(1,), num_heads=(2,), window=4,
                        squeeze=6),
        dat_kwargs=dict(embed_dim=32, depths=(1,), num_heads=(2,),
                        split_size=(2, 4), expansion=2.0),
        nafnet_kwargs=dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                           dec_blk_nums=(1, 1)))
    model = FreqFusionSR(FusionConfig(fusion_dim=16, num_heads=2,
                                      refine_depth=2, refine_channels=8), **tiny)
    criterion = CombinedLoss({"l1": 1.0, "charbonnier": 0, "l2": 0, "vgg": 0,
                              "swt": 0, "fft": 0, "edge": 0, "ssim": 0})
    tx = make_optimizer(lambda _: 1e-2)
    rng = np.random.default_rng(0)
    batch = {"lr": jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32),
             "hr": jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)}
    state = init_live_train_state(model, tx, jax.random.PRNGKey(0), batch)
    before = jax.tree_util.tree_map(np.asarray, state.params["experts"])
    step = jax.jit(make_live_train_step(model, criterion, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    after = state.params["experts"]
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_eval_step():
    model = _tiny_model()
    tx = make_optimizer(lambda _: 1e-3)
    batch = _batch()
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
    sr = jax.jit(make_eval_step(model))(state, batch)
    assert sr.shape == batch["hr"].shape
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0
