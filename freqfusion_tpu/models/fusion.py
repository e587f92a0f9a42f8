"""The trainable fusion head (CompleteEnhancedFusionSR equivalent), TPU-native.

Re-design of /root/reference/src/models/enhanced_fusion.py. The head is a
pure function of (lr, expert_outputs[, expert_features]) — expert execution
lives outside (models/experts.py for the live path, the cached dataset for
training), which replaces the reference's hook/manual/pseudo feature-fallback
ladder (enhanced_fusion.py:306-395) with explicit inputs.

7-phase forward (enhanced_fusion.py:694-754):
  2+3  frequency decomposition (+ cross-band attention)
  4    collaborative feature learning (train only — per-pixel MHA OOMs on
       full-res inference, mirrored from enhanced_fusion.py:731-736)
  5    hierarchical fusion blended 0.7/0.3 with frequency-guided weighting
  6    dynamic per-pixel expert selection (difficulty-blended, 0.3 weight)
  7    refine_net (0.1-scaled) + learnable bilinear LR residual + clamp
       + optional Laplacian edge enhancement

Shipped config (models/team29_FreqFusion/io.py:40-58): fusion_dim 64, heads
4, refine 4×64, all enable-flags true (multi-domain 9-band + LKA + edge).

Adaptive-band baseline path: the reference's `.item()` batch-mean splits
(enhanced_fusion.py:436-443) are kept as *traced* scalars — same math, jit
compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .edge import LaplacianEdgeRefinement
from .frequency import FrequencyDecomposition, MultiDomainFrequency
from .fusion_blocks import (
    AdaptiveFrequencyBandPredictor,
    CollaborativeFeatureLearning,
    CrossBandAttention,
    DynamicExpertSelector,
    FrequencyRouter,
    MultiScaleFeatureExtractor,
)
from .fusion_variants import MultiResolutionFusion
from .hierarchical import HierarchicalFusion
from .layers import gelu
from .lka import EnhancedCollaborativeWithLKA, EnhancedCrossBandWithLKA

EXPERT_ORDER = ("hat", "dat", "nafnet")


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Mirrors the reference MODEL_CONFIG (io.py:40-58)."""

    num_experts: int = 3
    num_bands: int = 3
    block_size: int = 8
    upscale: int = 4
    fusion_dim: int = 64
    num_heads: int = 4
    refine_depth: int = 4
    refine_channels: int = 64
    enable_hierarchical: bool = True
    enable_lka: bool = True
    enable_edge_enhance: bool = True
    enable_multi_domain_freq: bool = True
    enable_dynamic_selection: bool = True
    enable_cross_band_attn: bool = True
    enable_adaptive_bands: bool = True
    enable_multi_resolution: bool = True
    enable_collaborative: bool = True
    # fused Pallas LKA kernel on eval paths; backend-gated inside the LKA
    # module, so the default is safe on CPU (fires at d%128==0, i.e. the
    # C=128 collaborative path during cached-mode validation)
    use_pallas: bool = True


#: claimed per-module PSNR gains (enhanced_fusion.py:843-868)
EXPECTED_GAINS_DB = {
    "dynamic_expert_selection": 0.30,
    "cross_band_attention": 0.20,
    "adaptive_frequency_bands": 0.15,
    "multi_resolution_fusion": 0.25,
    "hierarchical_fusion": 0.80,
    "collaborative_learning": 0.20,
}


def improvement_status(cfg: FusionConfig) -> dict:
    """Enabled-improvement flags (enhanced_fusion.py get_improvement_status)."""
    return {
        "dynamic_expert_selection": cfg.enable_dynamic_selection,
        "cross_band_attention": cfg.enable_cross_band_attn,
        "adaptive_frequency_bands": cfg.enable_adaptive_bands,
        "multi_resolution_fusion": cfg.enable_multi_resolution,
        "hierarchical_fusion": cfg.enable_hierarchical,
        "collaborative_learning": cfg.enable_collaborative,
        "lka": cfg.enable_lka,
        "edge_enhance": cfg.enable_edge_enhance,
        "multi_domain_freq": cfg.enable_multi_domain_freq,
    }


def expected_psnr_gain(cfg: FusionConfig) -> float:
    """Sum of claimed gains for the enabled improvements
    (enhanced_fusion.py get_expected_psnr_gain)."""
    total = 0.0
    if cfg.enable_dynamic_selection:
        total += EXPECTED_GAINS_DB["dynamic_expert_selection"]
    if cfg.enable_cross_band_attn:
        total += EXPECTED_GAINS_DB["cross_band_attention"]
    if cfg.enable_adaptive_bands:
        total += EXPECTED_GAINS_DB["adaptive_frequency_bands"]
    if cfg.enable_hierarchical:
        total += EXPECTED_GAINS_DB["hierarchical_fusion"]
    elif cfg.enable_multi_resolution:
        total += EXPECTED_GAINS_DB["multi_resolution_fusion"]
    if cfg.enable_collaborative:
        total += EXPECTED_GAINS_DB["collaborative_learning"]
    return total


class RefineNet(nn.Module):
    """Phase-7 refinement: depth-D conv+GELU stack (0.1-scaled residual) +
    learnable bilinear LR residual + clamp. With `use_pallas` (TPU eval)
    the conv stack runs as strip-resident chain kernels."""

    depth: int = 4
    channels: int = 64
    use_pallas: bool = False

    @nn.compact
    def __call__(self, fused, lr):
        from .nafnet import _ConvParams
        ws = []
        cin = fused.shape[-1]
        for i in range(self.depth):
            cout = 3 if i == self.depth - 1 else self.channels
            ws.append(_ConvParams((3, 3, cin, cout), name=f"refine_{i}")())
            cin = cout
        residual_scale = self.param("residual_scale",
                                    lambda k, s: jnp.asarray(0.1), ())
        up = resize(lr, fused.shape[1], fused.shape[2], "bilinear")

        def conv(t, w_, b_):
            return jax.lax.conv_general_dilated(
                t, w_.astype(t.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_

        h = fused
        for i, (w_, b_) in enumerate(ws):
            h = conv(h, w_, b_)
            if i < self.depth - 1:
                h = gelu(h)
        fused = fused + 0.1 * h
        return jnp.clip(fused + residual_scale * up, 0.0, 1.0)


class FusionHead(nn.Module):
    """`__call__(lr, expert_outputs, expert_features=None, train=False)`
    → SR [B, 4H, 4W, 3]."""

    cfg: FusionConfig = FusionConfig()

    def setup(self):
        cfg = self.cfg
        if cfg.enable_multi_domain_freq:
            self.multi_domain_freq = MultiDomainFrequency(cfg.block_size)
        else:
            self.freq_decomp = FrequencyDecomposition(cfg.block_size)
            if cfg.enable_adaptive_bands:
                self.adaptive_band_predictor = AdaptiveFrequencyBandPredictor()

        if cfg.enable_cross_band_attn:
            if cfg.enable_lka:
                self.cross_band_attn = EnhancedCrossBandWithLKA(
                    dim=cfg.fusion_dim,
                    num_bands=9 if cfg.enable_multi_domain_freq else cfg.num_bands,
                    num_heads=cfg.num_heads, use_pallas=cfg.use_pallas)
            else:
                self.cross_band_attn = CrossBandAttention(
                    dim=cfg.fusion_dim, num_heads=cfg.num_heads)

        if cfg.enable_collaborative:
            if cfg.enable_lka:
                self.collaborative = EnhancedCollaborativeWithLKA(
                    num_experts=cfg.num_experts, feature_dim=cfg.fusion_dim * 2,
                    num_heads=cfg.num_heads * 2, use_pallas=cfg.use_pallas)
            else:
                self.collaborative = CollaborativeFeatureLearning(
                    num_experts=cfg.num_experts, feature_dim=cfg.fusion_dim * 2,
                    num_heads=cfg.num_heads * 2)

        # Phase 5: hierarchical → standard multi-res → flat router fusion
        # (enhanced_fusion.py:243-260 / :545-586).
        if cfg.enable_hierarchical:
            self.multi_res_fusion = HierarchicalFusion(
                num_experts=cfg.num_experts, base_channels=cfg.fusion_dim,
                use_pallas=cfg.use_pallas)
        elif cfg.enable_multi_resolution:
            self.multi_res_fusion = MultiResolutionFusion(
                num_experts=cfg.num_experts, base_channels=cfg.fusion_dim)
        else:
            self.freq_router = FrequencyRouter(
                num_experts=cfg.num_experts, num_bands=cfg.num_bands)

        # Always-created learnable weights (enhanced_fusion.py:258-261);
        # only the flat-router branch consumes them.
        self.expert_weights = self.param(
            "expert_weights", nn.initializers.ones,
            (cfg.num_experts, cfg.num_bands))
        self.band_importance = self.param(
            "band_importance", nn.initializers.ones, (cfg.num_bands,))

        self.multiscale = MultiScaleFeatureExtractor(out_channels=cfg.fusion_dim)
        if cfg.enable_dynamic_selection:
            self.dynamic_selector = DynamicExpertSelector(
                hidden_dim=cfg.fusion_dim, num_experts=cfg.num_experts)

        self.refine_net = RefineNet(cfg.refine_depth, cfg.refine_channels,
                                    use_pallas=cfg.use_pallas)
        self.edge_refine = (LaplacianEdgeRefinement(use_pallas=cfg.use_pallas)
                            if cfg.enable_edge_enhance else None)

    # ----- Phase 2+3 ------------------------------------------------------
    def process_frequency_bands(self, lr, train: bool):
        cfg = self.cfg
        if cfg.enable_multi_domain_freq:
            raw = self.multi_domain_freq.decompose(lr)
            if cfg.enable_cross_band_attn:
                raw = self.cross_band_attn(raw, train)
            return self.multi_domain_freq.band_fusion(raw)

        if cfg.enable_adaptive_bands:
            low_split, high_split = self.adaptive_band_predictor(lr)
            # batch-mean splits, kept traced (reference used .item())
            low, mid, high = self.freq_decomp.adaptive(
                lr, jnp.broadcast_to(low_split.mean(), (lr.shape[0],)),
                jnp.broadcast_to(high_split.mean(), (lr.shape[0],)))
            b = lr.shape[0]
            low_scale = (low_split / 0.25).reshape(b, 1, 1, 1)
            high_scale = ((1.0 - high_split) / 0.25).reshape(b, 1, 1, 1)
            mid_scale = 1.0 + 0.1 * (1.0 - low_scale - high_scale)
            low = low * (0.9 + 0.2 * jax.nn.sigmoid(low_scale - 1.0))
            mid = mid * (0.9 + 0.2 * jax.nn.sigmoid(mid_scale - 1.0))
            high = high * (0.9 + 0.2 * jax.nn.sigmoid(high_scale - 1.0))
        else:
            low, mid, high = self.freq_decomp(lr)
        bands = [low, mid, high]
        if cfg.enable_cross_band_attn:
            bands = self.cross_band_attn(bands, train)
        return bands

    # ----- Phase 5+6 ------------------------------------------------------
    def fuse_experts(self, lr, expert_outputs: Dict[str, jnp.ndarray],
                     bands: List[jnp.ndarray], train: bool):
        cfg = self.cfg
        h_hr = lr.shape[1] * cfg.upscale
        w_hr = lr.shape[2] * cfg.upscale
        expert_list = [expert_outputs[n] for n in EXPERT_ORDER[: cfg.num_experts]]

        mags = [jnp.mean(jnp.abs(b), axis=-1, keepdims=True) for b in bands]
        freq_sum = mags[0] + mags[1] + mags[2] + 1e-8
        # [high→HAT, mid→DAT, low→NAFNet] (enhanced_fusion.py:533-542)
        guidance = jnp.concatenate(
            [mags[2] / freq_sum, mags[1] / freq_sum, mags[0] / freq_sum], axis=-1)

        guidance_hr = resize(guidance, h_hr, w_hr, "bilinear")
        stack = jnp.stack(expert_list, axis=-2)  # [B,H,W,E,3]
        freq_weighted = jnp.sum(stack * guidance_hr[..., None], axis=-2)

        if cfg.enable_hierarchical:
            fused = self.multi_res_fusion(
                {n: expert_outputs[n] for n in EXPERT_ORDER[: cfg.num_experts]},
                train=train)
            fused = fused * 0.7 + freq_weighted * 0.3
        elif cfg.enable_multi_resolution:
            # Baseline 64/128/256 fusion (enhanced_fusion.py:558-568).
            fused = self.multi_res_fusion(lr, expert_list)
            fused = fused * 0.7 + freq_weighted * 0.3
        else:
            # Flat router fusion (enhanced_fusion.py:570-586). The reference
            # feeds `ms_features` into a router built for 3 input channels —
            # a crash in torch; we route from the LR image, which is what the
            # router was constructed for (fusion_network.py:409-419).
            routing = self.freq_router(lr, train)  # [B,H,W,E,bands]
            weighted = routing * self.expert_weights[None, None, None]
            band_w = jax.nn.softmax(self.band_importance)
            weighted = weighted * band_w[None, None, None, None]
            agg = jnp.sum(weighted, axis=-1)  # [B,H,W,E]
            agg = agg / (jnp.sum(agg, axis=-1, keepdims=True) + 1e-8)
            agg_hr = resize(agg, h_hr, w_hr, "bilinear")
            fused = jnp.sum(stack * agg_hr[..., None], axis=-2)

        if cfg.enable_dynamic_selection:
            routing = self.multiscale(lr, train)
            gates, difficulty = self.dynamic_selector(lr, routing)
            gates_hr = resize(gates, h_hr, w_hr, "bilinear")
            gated = jnp.sum(stack * gates_hr[..., None], axis=-2)
            gate_sum = jnp.sum(gates_hr, axis=-1, keepdims=True) + 1e-8
            dynamic_fused = gated / gate_sum
            difficulty_hr = resize(difficulty, h_hr, w_hr, "bilinear")
            fused = (fused * (1.0 - 0.3 * difficulty_hr)
                     + dynamic_fused * (0.3 * difficulty_hr))
        return fused

    def __call__(self, lr, expert_outputs: Dict[str, jnp.ndarray],
                 expert_features: Optional[Dict[str, jnp.ndarray]] = None,
                 train: bool = False):
        cfg = self.cfg
        bands = self.process_frequency_bands(lr, train)

        # Collaborative runs whenever features are supplied (cached training
        # path); the inference driver passes features=None, mirroring the
        # reference's train-only gating (enhanced_fusion.py:731-736).
        if cfg.enable_collaborative and expert_features is not None:
            enhanced_list = self.collaborative(
                expert_features,
                [expert_outputs[n] for n in EXPERT_ORDER[: cfg.num_experts]],
                train)
            expert_outputs = dict(zip(EXPERT_ORDER, enhanced_list))

        fused = self.fuse_experts(lr, expert_outputs, bands, train)
        fused = self.refine_net(fused, lr)
        if self.edge_refine is not None:
            fused = self.edge_refine(fused, train)
        return fused
