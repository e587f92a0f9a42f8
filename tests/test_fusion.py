"""Fusion head: shape/range invariants + full parity vs the torch reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.fusion import FusionConfig, FusionHead
from freqfusion_tpu.utils.convert import fill_params, filter_unused, fusion_key_fn

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _inputs(b=1, h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    outs = {n: rng.uniform(size=(b, 4 * h, 4 * w, 3)).astype(np.float32)
            for n in ("hat", "dat", "nafnet")}
    feats = {"hat": rng.standard_normal((b, h, w, 180)).astype(np.float32) * 0.1,
             "dat": rng.standard_normal((b, h, w, 180)).astype(np.float32) * 0.1,
             "nafnet": rng.standard_normal((b, h, w, 64)).astype(np.float32) * 0.1}
    return lr, outs, feats


def _to_jnp(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


@pytest.mark.slow
def test_shapes_and_range():
    lr, outs, feats = _inputs()
    model = FusionHead(FusionConfig())
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(lr), _to_jnp(outs))
    sr = model.apply(params, jnp.asarray(lr), _to_jnp(outs))
    assert sr.shape == (1, 48, 64, 3)
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0


def test_param_count_near_reference():
    """Trainable head should be ~1.2M params (BASELINE.md)."""
    lr, outs, feats = _inputs()
    model = FusionHead(FusionConfig())
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(lr), _to_jnp(outs),
                        _to_jnp(feats))
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params["params"]))
    assert 0.8e6 < n < 2.0e6, n


def _torch_reference(cfg_kwargs=None):
    import torch
    ref_mod = ref_import("src.models.enhanced_fusion")
    torch.manual_seed(0)
    kwargs = dict(
        expert_ensemble=None, num_experts=3, num_bands=3, block_size=8,
        upscale=4, fusion_dim=64, num_heads=4, refine_depth=4,
        refine_channels=64, enable_hierarchical=True, enable_lka=True,
        enable_edge_enhance=True, enable_multi_domain_freq=True,
        enable_dynamic_selection=True, enable_cross_band_attn=True,
        enable_adaptive_bands=True, enable_multi_resolution=True,
        enable_collaborative=True)
    kwargs.update(cfg_kwargs or {})
    ref = ref_mod.CompleteEnhancedFusionSR(**kwargs).eval()
    with torch.no_grad():  # randomize so parity is meaningful
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)
    return ref


@requires_reference
def test_parity_shipped_config_inference():
    """Eval-path parity (no collaborative) with the full shipped MODEL_CONFIG."""
    import torch
    ref = _torch_reference()
    lr, outs, feats = _inputs()
    model = FusionHead(FusionConfig())
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(lr), _to_jnp(outs),
                           _to_jnp(feats))
    sd = torch_state_dict_numpy(ref)
    new_params, rep_p = fill_params(variables["params"], sd, fusion_key_fn)
    assert not rep_p["missing"], rep_p["missing"][:8]
    new_stats, rep_s = fill_params(variables["batch_stats"], sd, fusion_key_fn)
    assert not rep_s["missing"], rep_s["missing"][:8]
    leftover = [k for k in filter_unused(rep_p["unused"])
                if k not in {fusion_key_fn(p) for p in []}]
    # batch_stats keys consumed in the second pass are "unused" in the first
    leftover = [k for k in leftover if "running_" not in k]
    assert not leftover, leftover[:8]

    sr = model.apply({"params": new_params, "batch_stats": new_stats},
                     jnp.asarray(lr), _to_jnp(outs))
    with torch.no_grad():
        ref_sr = ref.forward_with_precomputed(
            to_nchw(lr), {k: to_nchw(v) for k, v in outs.items()}, None)
    np.testing.assert_allclose(np.asarray(sr), to_nhwc(ref_sr),
                               atol=2e-4, rtol=1e-3)


@requires_reference
def test_parity_cached_training_path_with_collaborative():
    import torch
    ref = _torch_reference()
    lr, outs, feats = _inputs(seed=5)
    model = FusionHead(FusionConfig())
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(lr), _to_jnp(outs),
                           _to_jnp(feats))
    sd = torch_state_dict_numpy(ref)
    new_params, _ = fill_params(variables["params"], sd, fusion_key_fn)
    new_stats, _ = fill_params(variables["batch_stats"], sd, fusion_key_fn)

    sr = model.apply({"params": new_params, "batch_stats": new_stats},
                     jnp.asarray(lr), _to_jnp(outs), _to_jnp(feats))
    with torch.no_grad():  # torch eval → dropout off, matching train=False
        ref_sr = ref.forward_with_precomputed(
            to_nchw(lr), {k: to_nchw(v) for k, v in outs.items()},
            {k: to_nchw(v) for k, v in feats.items()})
    np.testing.assert_allclose(np.asarray(sr), to_nhwc(ref_sr),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_gradients_flow_training():
    lr, outs, feats = _inputs(b=2, h=8, w=8, seed=7)
    model = FusionHead(FusionConfig())
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(lr), _to_jnp(outs),
                           _to_jnp(feats))

    def loss(params):
        sr, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(lr), _to_jnp(outs), _to_jnp(feats), True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return jnp.mean(jnp.square(sr))

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    nonzero = sum(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.6, (nonzero, len(leaves))
