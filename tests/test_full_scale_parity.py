"""Full-scale end-to-end parity: torch reference vs FreqFusionSR.

The per-expert and fusion-head parity suites cover components at small
dims; this fixture runs the WHOLE pipeline at real-image scale (128x160
LR, full-dim HAT-L/DAT/NAFNet + shipped fusion head, converted random
weights) against the reference composition (expert forwards with clamp,
feature hooks, enhanced_fusion.forward_with_precomputed — mirrors
/root/reference/models/team29_FreqFusion/io.py:189-234's serving path).

Gated behind FREQFUSION_FULL_PARITY=1: the CPU compile + two full-dim
forwards take tens of minutes. Result recorded in PARITY.md.
Run: FREQFUSION_FULL_PARITY=1 python -m pytest tests/test_full_scale_parity.py -s
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.experts import FreqFusionSR
from freqfusion_tpu.models.fusion import FusionConfig
from freqfusion_tpu.utils.convert import (dat_key_fn, fill_params,
                                          fusion_key_fn, hat_key_fn,
                                          nafnet_key_fn)

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, \
    torch_state_dict_numpy

H, W = 128, 160  # LR dims: multiples of HAT window 16, DAT split 32, NAF 16


@pytest.mark.skipif(os.environ.get("FREQFUSION_FULL_PARITY") != "1",
                    reason="set FREQFUSION_FULL_PARITY=1 (slow: ~30+ min CPU)")
@requires_reference
def test_full_scale_end_to_end():
    import torch

    torch.manual_seed(0)
    hat = ref_import("src.models.hat").create_hat_model(
        embed_dim=180, depths=[6] * 12, num_heads=[6] * 12, window_size=16,
        upscale=4, img_range=1.0).eval()
    dat = ref_import("src.models.dat").create_dat_model(
        upscale=4, embed_dim=180, depths=[6] * 6, num_heads=[6] * 6,
        split_size=[8, 32], img_range=1.0, expansion_factor=4.0).eval()
    naf = ref_import("src.models.nafnet").create_nafnet_sr_model(
        upscale=4, width=64, middle_blk_num=12, enc_blk_nums=[2, 2, 4, 8],
        dec_blk_nums=[2, 2, 2, 2]).eval()
    fusion = ref_import("src.models.enhanced_fusion").CompleteEnhancedFusionSR(
        expert_ensemble=None, num_experts=3, num_bands=3, block_size=8,
        upscale=4, fusion_dim=64, num_heads=4, refine_depth=4,
        refine_channels=64, enable_hierarchical=True, enable_lka=True,
        enable_edge_enhance=True, enable_multi_domain_freq=True,
        enable_dynamic_selection=True, enable_cross_band_attn=True,
        enable_adaptive_bands=True, enable_multi_resolution=True,
        enable_collaborative=True).eval()
    with torch.no_grad():  # randomize so parity is meaningful
        for p in fusion.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        for m in fusion.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    # ---- our model, converted
    model = FreqFusionSR(FusionConfig())
    lr = np.random.default_rng(1).uniform(size=(1, H, W, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(lr))
    params = dict(variables["params"])

    for name, ref, key_fn, strip in (
            ("hat", hat, hat_key_fn, None),
            ("dat", dat, dat_key_fn, None),
            ("nafnet", naf, nafnet_key_fn, "nafnet.")):
        sd = torch_state_dict_numpy(ref)
        if strip:
            sd = {k[len(strip):]: v for k, v in sd.items()
                  if k.startswith(strip)}
        filled, rep = fill_params(params["experts"][name], sd, key_fn,
                                  strict=True)
        params["experts"][name] = filled
        assert not rep["missing"], (name, rep["missing"][:5])
    sd = torch_state_dict_numpy(fusion)
    params["fusion"], rep = fill_params(variables["params"]["fusion"], sd,
                                        fusion_key_fn)
    assert not rep["missing"], rep["missing"][:5]
    stats, _ = fill_params(variables["batch_stats"]["fusion"], sd,
                           fusion_key_fn)

    sr = np.asarray(model.apply(
        {"params": params, "batch_stats": {"fusion": stats}},
        jnp.asarray(lr)))

    # ---- reference composition (expert_loader.py:608-674 clamp,
    #      :936-949 feature resize; fusion eval path feeds outputs only)
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(lr, (0, 3, 1, 2)))
        outs = {
            "hat": hat(t).clamp(0, 1),
            "dat": dat(t).clamp(0, 1),
            "nafnet": naf(t).clamp(0, 1),
        }
        ref_sr = fusion.forward_with_precomputed(t, outs, None)

    diff = float(np.abs(sr - to_nhwc(ref_sr)).max())
    print(f"full-scale e2e max|Δ| = {diff:.3e} at {W}x{H} LR")
    assert diff <= 2e-4, diff
