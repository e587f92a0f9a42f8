"""Enhanced fusion V2 — the alternate self-contained variant (~167K params).

Re-design of /root/reference/src/models/enhanced_fusion_v2.py: a compact
re-implementation of the 7-phase pipeline with its own
`AdaptiveFrequencyDecompositionV2` (an 8×8-pooled MLP predicts per-image
low/high zigzag thresholds; soft sigmoid gates over the normalized zigzag
index make the split differentiable), reusing the framework's cross-band /
collaborative / multi-resolution / dynamic-selection blocks. Exported beside
the production FusionHead but NOT used by the shipped checkpoint
(SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dct as dct_ops
from ..ops.resize import resize
from .fusion_blocks import CrossBandAttention, DynamicExpertSelector, MultiScaleFeatureExtractor
from .layers import gelu


class AdaptiveFrequencyDecompositionV2(nn.Module):
    """Per-image learnable-threshold DCT banding (enhanced_fusion_v2.py:37-201)."""

    block_size: int = 8
    sharpness: float = 50.0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple]:
        n = self.block_size
        b = x.shape[0]
        # threshold predictor: adaptive 8×8 pool → MLP → 2 sigmoids
        pooled = resize(x, 8, 8, "bilinear").reshape(b, -1)
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


class FusionHeadV2(nn.Module):
    """Compact 7-phase fusion head (enhanced_fusion_v2.py:704-970 role):
    adaptive 3-band decomposition → cross-band attention → routing-weighted
    expert blend guided by band magnitudes → dynamic selection → small
    refine net + bilinear residual."""

    fusion_dim: int = 32
    num_heads: int = 4
    num_experts: int = 3
    upscale: int = 4

    @nn.compact
    def __call__(self, lr, expert_outputs: Dict[str, jnp.ndarray],
                 train: bool = False):
        names = ["hat", "dat", "nafnet"][: self.num_experts]
        experts = [expert_outputs[n] for n in names]
        stack = jnp.stack(experts, axis=-2)
        h_hr, w_hr = stack.shape[1], stack.shape[2]

        low, mid, high, _ = AdaptiveFrequencyDecompositionV2(
            name="freq_decomp")(lr)
        bands = CrossBandAttention(self.fusion_dim, self.num_heads,
                                   name="cross_band_attn")([low, mid, high], train)

        mags = [jnp.mean(jnp.abs(bd), axis=-1, keepdims=True) for bd in bands]
        s = mags[0] + mags[1] + mags[2] + 1e-8
        guidance = jnp.concatenate([mags[2] / s, mags[1] / s, mags[0] / s], axis=-1)
        guidance_hr = resize(guidance, h_hr, w_hr, "bilinear")
        fused = jnp.sum(stack * guidance_hr[..., None], axis=-2)

        routing = MultiScaleFeatureExtractor(self.fusion_dim, name="multiscale")(lr, train)
        gates, difficulty = DynamicExpertSelector(
            self.fusion_dim, self.num_experts, name="dynamic_selector")(lr, routing)
        gates_hr = resize(gates, h_hr, w_hr, "bilinear")
        dyn = jnp.sum(stack * gates_hr[..., None], axis=-2) / (
            jnp.sum(gates_hr, axis=-1, keepdims=True) + 1e-8)
        diff_hr = resize(difficulty, h_hr, w_hr, "bilinear")
        fused = fused * (1.0 - 0.3 * diff_hr) + dyn * (0.3 * diff_hr)

        r = gelu(nn.Conv(self.fusion_dim, (3, 3), name="refine_conv1")(fused))
        r = nn.Conv(3, (3, 3), name="refine_conv2")(r)
        fused = fused + 0.1 * r
        rw = self.param("residual_scale", lambda k, s_: jnp.asarray(0.1), ())
        fused = fused + rw * resize(lr, h_hr, w_hr, "bilinear")
        return jnp.clip(fused, 0.0, 1.0)
