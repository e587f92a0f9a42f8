"""Baseline fusion variants: shape/range/softmax invariants (the reference's
own embedded test style, fusion_network.py:1340-1460)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.fusion_blocks import FrequencyRouter
from freqfusion_tpu.models.fusion_variants import (
    EnhancedMultiFusionSR, FrequencyAwareFusion, MultiResolutionFusion)
from freqfusion_tpu.data.augment import FrequencyAugmentation


def _inputs(b=1, h=16, seed=0):
    rng = np.random.default_rng(seed)
    lr = jnp.asarray(rng.uniform(size=(b, h, h, 3)).astype(np.float32))
    outs = [jnp.asarray(rng.uniform(size=(b, 4 * h, 4 * h, 3)).astype(np.float32))
            for _ in range(3)]
    return lr, outs


def test_router_softmax_sums_to_one():
    lr, _ = _inputs()
    router = FrequencyRouter()
    params = router.init(jax.random.PRNGKey(0), lr)
    w = router.apply(params, lr)
    assert w.shape == (1, 16, 16, 3, 3)
    np.testing.assert_allclose(np.asarray(w.sum(axis=-2)), 1.0, atol=1e-5)


def test_frequency_aware_fusion_shapes_and_range():
    lr, outs = _inputs()
    model = FrequencyAwareFusion()
    params = model.init(jax.random.PRNGKey(0), lr, outs)
    fused = model.apply(params, lr, outs)
    assert fused.shape == (1, 64, 64, 3)
    assert float(fused.min()) >= 0.0 and float(fused.max()) <= 1.0


def test_frequency_aware_fusion_interpolates_experts():
    """With identical expert outputs, the fusion must roughly reproduce them
    (routing weights sum to 1)."""
    lr, _ = _inputs(seed=1)
    same = jnp.ones((1, 64, 64, 3)) * 0.5
    model = FrequencyAwareFusion(use_residual=False)
    params = model.init(jax.random.PRNGKey(0), lr, [same] * 3)
    fused = model.apply(params, lr, [same] * 3)
    # refine conv adds a small 0.1-scaled perturbation around 0.5
    assert abs(float(fused.mean()) - 0.5) < 0.1


def test_multi_resolution_fusion():
    lr, outs = _inputs(h=64)  # experts at 256
    model = MultiResolutionFusion()
    params = model.init(jax.random.PRNGKey(0), lr, outs)
    fused = model.apply(params, lr, outs)
    assert fused.shape == (1, 256, 256, 3)
    assert float(fused.min()) >= 0.0 and float(fused.max()) <= 1.0


def test_enhanced_multifusion_wrapper():
    lr, outs = _inputs()
    named = dict(zip(("hat", "dat", "nafnet"), outs))
    model = EnhancedMultiFusionSR()
    params = model.init(jax.random.PRNGKey(0), lr, named)
    fused = model.apply(params, lr, named)
    assert fused.shape == (1, 64, 64, 3)


def test_frequency_aware_fusion_parity_vs_reference():
    from ref_utils import has_reference, has_torch, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy
    if not (has_reference() and has_torch()):
        import pytest
        pytest.skip("reference/torch unavailable")
    import torch
    from freqfusion_tpu.utils.convert import fill_params, fusion_key_fn

    ref_mod = ref_import("src.models.fusion_network")
    torch.manual_seed(0)
    ref = ref_mod.FrequencyAwareFusion(num_experts=3, num_bands=3,
                                       use_residual=True,
                                       use_multiscale=True).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    rng = np.random.default_rng(7)
    lr = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    outs = [rng.uniform(size=(1, 64, 64, 3)).astype(np.float32) for _ in range(3)]

    model = FrequencyAwareFusion()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(lr),
                           [jnp.asarray(o) for o in outs])
    sd = torch_state_dict_numpy(ref)
    new_p, rep = fill_params(variables["params"], sd, fusion_key_fn)
    assert not rep["missing"], rep["missing"][:5]
    new_s, _ = fill_params(variables["batch_stats"], sd, fusion_key_fn)

    ours = model.apply({"params": new_p, "batch_stats": new_s},
                       jnp.asarray(lr), [jnp.asarray(o) for o in outs])
    with torch.no_grad():
        theirs = ref(to_nchw(lr), [to_nchw(o) for o in outs])
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                               atol=2e-4, rtol=1e-3)


def test_frequency_augmentation_preserves_when_identity():
    aug = FrequencyAugmentation(prob=1.0, low_range=(1.0, 1.0),
                                mid_range=(1.0, 1.0), high_range=(1.0, 1.0),
                                seed=0)
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(12, 20, 3)).astype(np.float32)
    hr = rng.uniform(size=(48, 80, 3)).astype(np.float32)
    lr2, hr2 = aug(lr, hr)
    np.testing.assert_allclose(lr2, lr, atol=1e-4)
    np.testing.assert_allclose(hr2, hr, atol=1e-4)


def test_frequency_augmentation_changes_bands():
    aug = FrequencyAugmentation(prob=1.0, high_range=(1.5, 1.5), seed=0)
    rng = np.random.default_rng(1)
    hr = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    _, hr2 = aug(hr[::4, ::4].copy(), hr)
    assert np.abs(hr2 - hr).max() > 1e-3
