"""Enhanced fusion V2 — the alternate self-contained variant (~167K params).

Re-design of /root/reference/src/models/enhanced_fusion_v2.py: a compact
re-implementation of the 7-phase pipeline with its own
`AdaptiveFrequencyDecompositionV2` (an 8×8-pooled MLP predicts per-image
low/high zigzag thresholds; soft sigmoid gates over the normalized zigzag
index make the split differentiable) and V2's OWN private variant set —
CrossBandAttentionV2 / CollaborativeFeatureLearningV2 /
MultiResolutionFusionV2 / DynamicExpertSelectorV2 (enhanced_fusion_v2.py:
204-631) — each torch-parity-tested (tests/test_fusion_v2_parity.py).
Exported beside the production FusionHead but NOT used by the shipped
checkpoint (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct as dct_ops
from ..ops.resize import resize
from .layers import gelu


def _adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d semantics via constant per-axis bin matrices
    (bin i averages rows [floor(i·H/out), ceil((i+1)·H/out)))."""
    def pool_matrix(size):
        m = np.zeros((size, out), np.float32)
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)
            m[lo:hi, i] = 1.0 / (hi - lo)
        return m

    mh = jnp.asarray(pool_matrix(x.shape[1]), x.dtype)
    mw = jnp.asarray(pool_matrix(x.shape[2]), x.dtype)
    y = jnp.einsum("bhwc,ho->bowc", x, mh)
    return jnp.einsum("bowc,wp->bopc", y, mw)


class AdaptiveFrequencyDecompositionV2(nn.Module):
    """Per-image learnable-threshold DCT banding (enhanced_fusion_v2.py:37-201)."""

    block_size: int = 8
    sharpness: float = 50.0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple]:
        n = self.block_size
        b = x.shape[0]
        # threshold predictor: AdaptiveAvgPool2d(8) → MLP → 2 sigmoids
        # (channel-major flatten to match the torch Linear's column order)
        pooled = _adaptive_avg_pool(x, 8)
        pooled = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(b, -1)
        h = jax.nn.relu(nn.Dense(32, name="thresh_fc1")(pooled))
        t = jax.nn.sigmoid(nn.Dense(2, name="thresh_fc2")(h))
        low_t = 0.15 + t[:, 0] * (0.40 - 0.15)
        high_t = 0.60 + t[:, 1] * (0.85 - 0.60)

        zz = jnp.asarray(dct_ops.zigzag_indices(n).astype(np.float32)) / (n * n - 1)
        low_m = jax.nn.sigmoid((low_t[:, None, None] - zz) * self.sharpness)
        high_m = jax.nn.sigmoid((zz - high_t[:, None, None]) * self.sharpness)
        mid_m = jnp.clip(1.0 - low_m - high_m, 0.0, 1.0)

        xp, (hh, ww) = dct_ops.reflect_pad_to_block(x, n)
        blocks = dct_ops.blockify(xp, n)
        blocks = blocks.reshape(*blocks.shape[:-1], n, n)
        coeffs = dct_ops.dct2d(blocks, n)
        bands = []
        for m in (low_m, mid_m, high_m):
            band = dct_ops.idct2d(coeffs * m[:, None, None, None], n)
            band = band.reshape(*band.shape[:-2], n * n)
            bands.append(dct_ops.unblockify(band, n)[:, :hh, :ww, :])
        return bands[0], bands[1], bands[2], (low_t, high_t)


class CrossBandAttentionV2(nn.Module):
    """V2's private cross-band block (enhanced_fusion_v2.py:204-293):
    per-band projectors, per-pixel MHA over 3 band tokens, per-band output
    projectors, softmax(band_gates)-weighted residual."""

    in_channels: int = 3
    hidden_dim: int = 32
    num_heads: int = 4

    @nn.compact
    def __call__(self, bands, train: bool = False):
        from .layers import TorchMHA

        projected = [nn.Conv(self.hidden_dim, (1, 1), name=f"band_proj_{i}")(b)
                     for i, b in enumerate(bands)]
        stacked = jnp.stack(projected, axis=-2)  # [B,H,W,3,hidden]
        attn = TorchMHA(self.hidden_dim, self.num_heads,
                        name="attention")(stacked, train)
        gates = self.param("band_gates", nn.initializers.ones, (3,))
        w = jax.nn.softmax(gates)
        outs = []
        for i, band in enumerate(bands):
            o = nn.Conv(self.in_channels, (1, 1),
                        name=f"out_proj_{i}")(attn[..., i, :])
            outs.append(band + w[i] * o)
        return outs


class CollaborativeFeatureLearningV2(nn.Module):
    """V2's private collaborative block (enhanced_fusion_v2.py:297-424):
    project → cross-expert MHA → mean consensus → conv refine → per-expert
    sigmoid modulation head on (attn_i + consensus) → out·(1+0.2·mod)."""

    common_dim: int = 128
    num_heads: int = 8
    expert_channels: Dict[str, int] = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, expert_features: Dict[str, jnp.ndarray],
                 expert_outputs, train: bool = False):
        from .layers import TorchMHA

        chans = self.expert_channels or {"hat": 180, "dat": 180, "nafnet": 64}
        names = [n for n in ("hat", "dat", "nafnet") if n in chans]
        projected = [nn.Conv(self.common_dim, (1, 1), name=f"proj_{n}")(
            expert_features[n]) for n in names]
        stacked = jnp.stack(projected, axis=-2)  # [B,H,W,E,common]
        attn = TorchMHA(self.common_dim, self.num_heads,
                        name="cross_expert_attention")(stacked, train)

        consensus = jnp.mean(attn, axis=-2)
        consensus = nn.Conv(self.common_dim, (3, 3),
                            name="feat_refine_0")(consensus)
        consensus = nn.Conv(self.common_dim, (3, 3),
                            name="feat_refine_2")(gelu(consensus))

        mod0 = nn.Conv(64, (1, 1), name="mod_0")  # shared modulation head
        mod2 = nn.Conv(1, (1, 1), name="mod_2")
        outs = []
        for i, out in enumerate(expert_outputs):
            m = attn[..., i, :] + consensus
            m = jax.nn.sigmoid(mod2(gelu(mod0(m))))
            m_hr = resize(m, out.shape[1], out.shape[2], "bilinear")
            outs.append(out * (1.0 + 0.2 * m_hr))
        return outs


class MultiResolutionFusionV2(nn.Module):
    """V2's private 64/128/256 fusion (enhanced_fusion_v2.py:426-546):
    3-conv softmax routers per level, learnable residual blending
    up + w·(direct − up) with w₁₂₈=0.5, w₂₅₆=0.3."""

    num_experts: int = 3
    base_channels: int = 32

    @nn.compact
    def __call__(self, lr, expert_outputs):
        stack = jnp.stack(expert_outputs, axis=-2)
        hs, ws = stack.shape[1], stack.shape[2]

        def router(t, name):
            g = jax.nn.relu(nn.Conv(self.base_channels, (3, 3),
                                    name=f"{name}_0")(t))
            g = jax.nn.relu(nn.Conv(self.base_channels, (3, 3),
                                    name=f"{name}_2")(g))
            g = nn.Conv(self.num_experts, (1, 1), name=f"{name}_4")(g)
            return jax.nn.softmax(g, axis=-1)

        def experts_at(size):
            b = stack.shape[0]
            flat = stack.reshape(b, hs, ws, -1)
            return resize(flat, size, size, "bilinear").reshape(
                b, size, size, self.num_experts, 3)

        w128 = self.param("res_weight_128", lambda k, s: jnp.asarray(0.5), ())
        w256 = self.param("res_weight_256", lambda k, s: jnp.asarray(0.3), ())

        r64 = router(resize(lr, 64, 64, "bilinear"), "router_64")
        fused_64 = jnp.sum(experts_at(64) * r64[..., None], axis=-2)

        up = resize(fused_64, 128, 128, "bilinear")
        r128 = router(resize(lr, 128, 128, "bilinear"), "router_128")
        direct = jnp.sum(experts_at(128) * r128[..., None], axis=-2)
        fused_128 = up + w128 * (direct - up)

        up = resize(fused_128, hs, ws, "bilinear")
        r256 = router(resize(lr, hs, ws, "bilinear"), "router_256")
        direct = jnp.sum(stack * r256[..., None], axis=-2)
        return up + w256 * (direct - up)


class DynamicExpertSelectorV2(nn.Module):
    """V2's private selector (enhanced_fusion_v2.py:549-631): difficulty CNN,
    independent sigmoid gates at a difficulty-adaptive threshold 0.7−0.5d
    with learnable temperature, soft normalization /max(Σg, 0.3)."""

    hidden_dim: int = 32
    num_experts: int = 3

    @nn.compact
    def __call__(self, lr_input, routing_features=None):
        d = jax.nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="diff_0")(lr_input))
        d = jax.nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="diff_2")(d))
        difficulty = jax.nn.sigmoid(nn.Conv(1, (3, 3), name="diff_4")(d))

        g = jax.nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="gate_0")(lr_input))
        g = jax.nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="gate_2")(g))
        raw = nn.Conv(self.num_experts, (1, 1), name="gate_4")(g)

        temp = self.param("temperature", lambda k, s: jnp.asarray(10.0), ())
        threshold = 0.7 - 0.5 * difficulty
        gates = jax.nn.sigmoid(temp * (raw - threshold))
        gates = gates / jnp.maximum(
            jnp.sum(gates, axis=-1, keepdims=True) + 1e-8, 0.3)
        return gates, difficulty


class FusionHeadV2(nn.Module):
    """V2's CompleteEnhancedFusionSR (enhanced_fusion_v2.py:704-970), with
    expert outputs/features as explicit inputs (no hooks): adaptive 3-band
    decomposition → cross-band attention → collaborative learning →
    multi-resolution fusion (or 1×1 concat fallback) → dynamic selection
    blended at 0.3+0.4·difficulty → refine net (0.1) + bilinear residual.

    Note: V2 computes the enhanced bands but never feeds them into the
    fusion (enhanced_fusion_v2.py:862-870 — only returned as
    intermediates); mirrored faithfully."""

    num_experts: int = 3
    block_size: int = 8
    upscale: int = 4
    enable_dynamic_selection: bool = True
    enable_cross_band_attn: bool = True
    enable_adaptive_bands: bool = True
    enable_multi_resolution: bool = True
    enable_collaborative: bool = True

    @nn.compact
    def __call__(self, lr, expert_outputs: Dict[str, jnp.ndarray],
                 expert_features: Dict[str, jnp.ndarray] = None,
                 train: bool = False):
        names = ["hat", "dat", "nafnet"][: self.num_experts]
        experts = [expert_outputs[n] for n in names]
        h_hr, w_hr = experts[0].shape[1], experts[0].shape[2]

        bands = None
        if self.enable_adaptive_bands:
            low, mid, high, _ = AdaptiveFrequencyDecompositionV2(
                self.block_size, name="freq_decomp")(lr)
            bands = [low, mid, high]
        if self.enable_cross_band_attn and bands is not None:
            bands = CrossBandAttentionV2(name="cross_band")(bands, train)

        if self.enable_collaborative and expert_features is not None:
            experts = CollaborativeFeatureLearningV2(name="collaborative")(
                expert_features, experts, train)

        if self.enable_multi_resolution:
            fused = MultiResolutionFusionV2(
                self.num_experts, name="multi_res")(lr, experts)
        else:
            fused = nn.Conv(3, (1, 1), name="simple_fusion")(
                jnp.concatenate(experts, axis=-1))

        if self.enable_dynamic_selection:
            gates, difficulty = DynamicExpertSelectorV2(
                num_experts=self.num_experts, name="dynamic_selector")(lr)
            gates_hr = resize(gates, h_hr, w_hr, "bilinear")
            stack = jnp.stack(experts, axis=-2)
            dyn = jnp.sum(stack * gates_hr[..., None], axis=-2) / (
                jnp.sum(gates_hr, axis=-1, keepdims=True) + 1e-8)
            diff_hr = resize(difficulty, h_hr, w_hr, "bilinear")
            blend = 0.3 + 0.4 * diff_hr
            fused = (1.0 - blend) * fused + blend * dyn

        r = jax.nn.relu(nn.Conv(64, (3, 3), name="refine_0")(fused))
        r = jax.nn.relu(nn.Conv(64, (3, 3), name="refine_2")(r))
        r = nn.Conv(3, (3, 3), name="refine_4")(r)
        fused = fused + 0.1 * r
        rw = self.param("residual_scale", lambda k, s_: jnp.asarray(0.1), ())
        fused = fused + rw * resize(lr, h_hr, w_hr, "bilinear")
        return jnp.clip(fused, 0.0, 1.0)
