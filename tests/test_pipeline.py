"""Live pipeline: ensemble composition + end-to-end tiled PNG→PNG inference."""

import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.infer.tiling import tiled_sr
from freqfusion_tpu.models.experts import ExpertEnsemble, FreqFusionSR
from freqfusion_tpu.models.fusion import FusionConfig

TINY = dict(
    hat_kwargs=dict(embed_dim=24, depths=(2,), num_heads=(2,), window=4, squeeze=6),
    dat_kwargs=dict(embed_dim=32, depths=(2,), num_heads=(2,), split_size=(2, 4),
                    expansion=2.0),
    nafnet_kwargs=dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                       dec_blk_nums=(1, 1)),
)


def test_ensemble_shapes():
    model = ExpertEnsemble(**TINY)
    x = jnp.zeros((1, 16, 16, 3))
    out = jax.eval_shape(
        lambda: model.init_with_output(jax.random.PRNGKey(0), x)[0])
    outputs, features = out
    assert outputs["hat"].shape == (1, 64, 64, 3)
    assert features["hat"].shape == (1, 16, 16, 24)
    assert features["nafnet"].shape == (1, 16, 16, 8)  # resized to LR


def test_full_model_end_to_end_tiled():
    model = FreqFusionSR(FusionConfig(), **TINY)
    tile = 16
    dummy = jnp.zeros((1, tile, tile, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy)

    fwd = jax.jit(lambda v, t: model.apply(v, t))

    def forward_batch(tiles):
        return np.asarray(fwd(variables, jnp.asarray(tiles)))

    lr = np.random.default_rng(0).uniform(size=(24, 40, 3)).astype(np.float32)
    sr = tiled_sr(lr, forward_batch, tile=tile, overlap=4, batch=1)
    assert sr.shape == (96, 160, 3)
    assert sr.min() >= 0.0 and sr.max() <= 1.0


@pytest.mark.slow
def test_mesh_sharded_tiled_inference_matches_single_device():
    """Sharding the tile batch over the 8-device mesh must be bitwise-free of
    the sharding (same program, psum-free data parallel)."""
    from freqfusion_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated_sharding)

    model = FreqFusionSR(FusionConfig(), **TINY)
    tile, batch = 16, 8
    dummy = jnp.zeros((batch, tile, tile, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy)

    mesh = make_mesh(8)
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    v_sharded = jax.device_put(variables, repl)
    fwd_sharded = jax.jit(lambda v, t: model.apply(v, t),
                          in_shardings=(repl, data), out_shardings=data)
    fwd_single = jax.jit(lambda v, t: model.apply(v, t))

    lr = np.random.default_rng(1).uniform(size=(30, 40, 3)).astype(np.float32)

    def fb_sharded(tiles):
        return np.asarray(fwd_sharded(v_sharded, jax.device_put(
            jnp.asarray(tiles), data)))

    def fb_single(tiles):
        return np.asarray(fwd_single(variables, jnp.asarray(tiles)))

    sr_sharded = tiled_sr(lr, fb_sharded, tile=tile, overlap=4, batch=batch)
    sr_single = tiled_sr(lr, fb_single, tile=tile, overlap=4, batch=batch)
    np.testing.assert_allclose(sr_sharded, sr_single, atol=1e-5)


@pytest.mark.slow
def test_experts_are_frozen_in_training():
    model = FreqFusionSR(FusionConfig(), **TINY)
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    variables = model.init(jax.random.PRNGKey(0), x, with_features=True)

    def loss(params):
        sr = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, with_features=True, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])[0]
        return jnp.mean(jnp.square(sr))

    g = jax.grad(loss)(variables["params"])
    expert_grads = jax.tree_util.tree_leaves(g["experts"])
    fusion_grads = jax.tree_util.tree_leaves(g["fusion"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in expert_grads)
    assert any(float(jnp.abs(l).max()) > 0.0 for l in fusion_grads)
