"""FusionHead config-matrix coverage: every enable-flag toggled off once
(regression for the round-1 `enable_hierarchical=False` crash), plus torch
parity for the non-hierarchical MultiResolutionFusion fallback
(enhanced_fusion.py:221-228, 558-568).

The flat router branch (hierarchical AND multi_resolution both off) has no
torch parity test: the reference feeds 128-channel multiscale features into a
router constructed for 3 input channels (enhanced_fusion.py:571-573 vs
fusion_network.py:409-419) and crashes — we route from the LR image instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.fusion import FusionConfig, FusionHead

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _inputs(b=1, h=16, seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.uniform(size=(b, h, h, 3)).astype(np.float32)
    outs = {n: jnp.asarray(rng.uniform(size=(b, 4 * h, 4 * h, 3)).astype(np.float32))
            for n in ("hat", "dat", "nafnet")}
    feats = {"hat": jnp.asarray(rng.standard_normal((b, h, h, 180)).astype(np.float32) * 0.1),
             "dat": jnp.asarray(rng.standard_normal((b, h, h, 180)).astype(np.float32) * 0.1),
             "nafnet": jnp.asarray(rng.standard_normal((b, h, h, 64)).astype(np.float32) * 0.1)}
    return jnp.asarray(lr), outs, feats


_FLAGS = [
    "enable_hierarchical",
    "enable_lka",
    "enable_edge_enhance",
    "enable_multi_domain_freq",
    "enable_dynamic_selection",
    "enable_cross_band_attn",
    "enable_adaptive_bands",
    "enable_multi_resolution",
    "enable_collaborative",
]


@pytest.mark.parametrize(
    "off",
    [(f,) for f in _FLAGS] + [("enable_hierarchical", "enable_multi_resolution")],
    ids=lambda off: "+".join(f[len("enable_"):] for f in off))
def test_every_flag_off_once(off):
    """No single disabled improvement (and the flat-router fallback) may
    crash either the eval or the cached-training path."""
    cfg = FusionConfig(**{f: False for f in off})
    lr, outs, feats = _inputs()
    model = FusionHead(cfg)
    variables = model.init(jax.random.PRNGKey(0), lr, outs, feats)

    sr_eval = model.apply(variables, lr, outs)
    assert sr_eval.shape == (1, 64, 64, 3)
    assert float(sr_eval.min()) >= 0.0 and float(sr_eval.max()) <= 1.0

    sr_cached = model.apply(variables, lr, outs, feats)
    assert sr_cached.shape == (1, 64, 64, 3)
    assert float(sr_cached.min()) >= 0.0 and float(sr_cached.max()) <= 1.0


@requires_reference
def test_parity_non_hierarchical_fallback():
    """enable_hierarchical=False swaps in MultiResolutionFusion
    (enhanced_fusion.py:221-228); parity vs the torch reference.

    The reference's MultiResolutionFusion hardcodes 64/128/256 stages, so the
    LR fixture must be 64×64 (experts at 256). Heavy per-pixel modules are
    disabled to keep the CPU runtime sane — the multi-res branch, dynamic
    selection, router weights, and refine net are all exercised.
    """
    import torch
    from freqfusion_tpu.utils.convert import fill_params, fusion_key_fn

    overrides = dict(
        enable_hierarchical=False,
        enable_multi_domain_freq=False,
        enable_cross_band_attn=False,
        enable_adaptive_bands=False,
        enable_collaborative=False,
        enable_lka=False,
        enable_edge_enhance=False,
    )

    ref_mod = ref_import("src.models.enhanced_fusion")
    torch.manual_seed(0)
    ref = ref_mod.CompleteEnhancedFusionSR(
        expert_ensemble=None, num_experts=3, num_bands=3, block_size=8,
        upscale=4, fusion_dim=64, num_heads=4, refine_depth=4,
        refine_channels=64, enable_dynamic_selection=True,
        enable_multi_resolution=True, **overrides).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    lr, outs, feats = _inputs(h=64, seed=3)
    model = FusionHead(FusionConfig(**overrides))
    variables = model.init(jax.random.PRNGKey(0), lr, outs, feats)
    sd = torch_state_dict_numpy(ref)
    new_params, rep_p = fill_params(variables["params"], sd, fusion_key_fn)
    assert not rep_p["missing"], rep_p["missing"][:8]
    new_stats, rep_s = fill_params(variables["batch_stats"], sd, fusion_key_fn)
    assert not rep_s["missing"], rep_s["missing"][:8]

    sr = model.apply({"params": new_params, "batch_stats": new_stats}, lr, outs)
    with torch.no_grad():
        ref_sr = ref.forward_with_precomputed(
            to_nchw(np.asarray(lr)),
            {k: to_nchw(np.asarray(v)) for k, v in outs.items()}, None)
    np.testing.assert_allclose(np.asarray(sr), to_nhwc(ref_sr),
                               atol=2e-4, rtol=1e-3)
