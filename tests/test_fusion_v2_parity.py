"""enhanced_fusion_v2 private variant blocks: torch parity with converted
random weights (VERDICT round-1 coverage row 18 — V2 previously reused the
shared blocks instead of re-implementing its own variant set)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.fusion_v2 import (
    AdaptiveFrequencyDecompositionV2, CollaborativeFeatureLearningV2,
    CrossBandAttentionV2, DynamicExpertSelectorV2, MultiResolutionFusionV2)
from freqfusion_tpu.utils.convert import fill_params, v2_key_fn

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _randomize(ref, seed=0):
    import torch
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return ref


def _convert(model, ref, *args):
    variables = model.init(jax.random.PRNGKey(0), *args)
    sd = torch_state_dict_numpy(ref)
    params, rep = fill_params(variables["params"], sd, v2_key_fn)
    assert not rep["missing"], rep["missing"][:6]
    return {"params": params}


@requires_reference
def test_v2_adaptive_decomposition_parity():
    import torch
    ref_mod = ref_import("src.models.enhanced_fusion_v2")
    ref = _randomize(ref_mod.AdaptiveFrequencyDecomposition(block_size=8)).eval()
    x = np.random.default_rng(0).uniform(size=(2, 16, 24, 3)).astype(np.float32)
    model = AdaptiveFrequencyDecompositionV2(8)
    variables = _convert(model, ref, jnp.asarray(x))
    low, mid, high, (lt, ht) = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        rl, rm, rh, (rlt, rht) = ref(to_nchw(x))
    np.testing.assert_allclose(np.asarray(lt)[:, None], rlt.numpy(), atol=1e-5)
    for ours, theirs in ((low, rl), (mid, rm), (high, rh)):
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   atol=2e-4, rtol=1e-3)


@requires_reference
def test_v2_cross_band_parity():
    import torch
    ref_mod = ref_import("src.models.enhanced_fusion_v2")
    ref = _randomize(ref_mod.CrossBandAttention(3, 32, 4), 1).eval()
    rng = np.random.default_rng(1)
    bands = [rng.uniform(size=(1, 12, 16, 3)).astype(np.float32)
             for _ in range(3)]
    model = CrossBandAttentionV2(3, 32, 4)
    variables = _convert(model, ref, [jnp.asarray(b) for b in bands])
    ours = model.apply(variables, [jnp.asarray(b) for b in bands])
    with torch.no_grad():
        theirs = ref([to_nchw(b) for b in bands])
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(t),
                                   atol=2e-4, rtol=1e-3)


@requires_reference
def test_v2_collaborative_parity():
    import torch
    ref_mod = ref_import("src.models.enhanced_fusion_v2")
    ref = _randomize(ref_mod.CollaborativeFeatureLearning(), 2).eval()
    rng = np.random.default_rng(2)
    feats = {"hat": rng.standard_normal((1, 8, 8, 180)).astype(np.float32) * .1,
             "dat": rng.standard_normal((1, 8, 8, 180)).astype(np.float32) * .1,
             "nafnet": rng.standard_normal((1, 8, 8, 64)).astype(np.float32) * .1}
    outs = [rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
            for _ in range(3)]
    model = CollaborativeFeatureLearningV2()
    jf = {k: jnp.asarray(v) for k, v in feats.items()}
    jo = [jnp.asarray(o) for o in outs]
    variables = _convert(model, ref, jf, jo)
    ours = model.apply(variables, jf, jo)
    with torch.no_grad():
        theirs = ref({k: to_nchw(v) for k, v in feats.items()},
                     [to_nchw(o) for o in outs])
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(t),
                                   atol=2e-4, rtol=1e-3)


@requires_reference
def test_v2_multi_resolution_parity():
    import torch
    ref_mod = ref_import("src.models.enhanced_fusion_v2")
    ref = _randomize(ref_mod.MultiResolutionFusion(3), 3).eval()
    rng = np.random.default_rng(3)
    lr = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    outs = [rng.uniform(size=(1, 256, 256, 3)).astype(np.float32)
            for _ in range(3)]
    model = MultiResolutionFusionV2(3)
    variables = _convert(model, ref, jnp.asarray(lr),
                         [jnp.asarray(o) for o in outs])
    ours = model.apply(variables, jnp.asarray(lr),
                       [jnp.asarray(o) for o in outs])
    with torch.no_grad():
        theirs = ref(to_nchw(lr), [to_nchw(o) for o in outs])
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                               atol=2e-4, rtol=1e-3)


@requires_reference
def test_v2_dynamic_selector_parity():
    import torch
    ref_mod = ref_import("src.models.enhanced_fusion_v2")
    ref = _randomize(ref_mod.DynamicExpertSelector(3, 32, 3), 4).eval()
    rng = np.random.default_rng(4)
    lr = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    model = DynamicExpertSelectorV2(32, 3)
    variables = _convert(model, ref, jnp.asarray(lr))
    gates, diff = model.apply(variables, jnp.asarray(lr))
    with torch.no_grad():
        rg, rd = ref(to_nchw(lr))
    np.testing.assert_allclose(np.asarray(gates), to_nhwc(rg),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(diff), to_nhwc(rd),
                               atol=2e-4, rtol=1e-3)
