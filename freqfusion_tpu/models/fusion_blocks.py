"""Fusion-head building blocks (Phase 3/4/6 + baselines), TPU-native.

Re-design of /root/reference/src/models/fusion_network.py: dynamic expert
selection, multi-scale routing features, the frequency router, the standard
(non-LKA) cross-band / collaborative attention variants, and the adaptive
frequency-band predictor. All NHWC, all static-shape, BN with batch_stats.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .layers import BatchNorm2d, CBAMSpatialAttention, ChannelSpatialAttention, TorchMHA, gelu


class DynamicExpertSelector(nn.Module):
    """Per-pixel expert gates from a difficulty CNN (fusion_network.py:167-236).

    threshold = 0.7 − 0.4·difficulty; soft gate σ(10·(gate−threshold)); the
    near-max gate per pixel is floored at 0.9 so ≥1 expert always fires.
    """

    hidden_dim: int = 64
    num_experts: int = 3

    @nn.compact
    def __call__(self, lr_input, routing_features) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = jax.nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="diff_conv1")(lr_input))
        d = jax.nn.relu(nn.Conv(self.hidden_dim // 2, (3, 3), name="diff_conv2")(d))
        difficulty = jax.nn.sigmoid(nn.Conv(1, (3, 3), name="diff_conv3")(d))

        g = jax.nn.relu(nn.Conv(self.hidden_dim, (3, 3), name="gate_conv1")(routing_features))
        gates = jax.nn.sigmoid(nn.Conv(self.num_experts, (1, 1), name="gate_conv2")(g))

        threshold = 0.7 - 0.4 * difficulty
        gates = jax.nn.sigmoid(10.0 * (gates - threshold))
        max_gate = jnp.max(gates, axis=-1, keepdims=True)
        gate_mask = (gates >= max_gate * 0.99).astype(gates.dtype)
        gates = jnp.maximum(gates, gate_mask * 0.9)
        return gates, difficulty


class MultiScaleFeatureExtractor(nn.Module):
    """1×/2×/4× conv pyramid → 1×1 fusion (fusion_network.py:543-607)."""

    out_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]

        def branch(t, name):
            t = nn.Conv(self.out_channels, (3, 3), use_bias=False,
                        name=f"{name}_conv")(t)
            return BatchNorm2d(self.out_channels, name=f"{name}_bn")(
                jax.nn.relu(t), train)

        f1 = branch(x, "conv_1x")
        f2 = branch(resize(x, h // 2, w // 2, "bilinear"), "conv_2x")
        f2 = resize(f2, h, w, "bilinear")
        f4 = branch(resize(x, h // 4, w // 4, "bilinear"), "conv_4x")
        f4 = resize(f4, h, w, "bilinear")
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="fusion")(jnp.concatenate([f1, f2, f4], axis=-1))


class FrequencyRouter(nn.Module):
    """5-conv CNN + CBAM attention → softmax routing [B,H,W,E,bands]
    (fusion_network.py:383-536). Note the axis order is NHWC-last."""

    num_experts: int = 3
    num_bands: int = 3
    hidden: Sequence[int] = (32, 64, 64, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(t, ch, name):
            t = nn.Conv(ch, (3, 3), use_bias=False, name=f"{name}_conv")(t)
            return BatchNorm2d(ch, name=f"{name}_bn")(jax.nn.relu(t), train)

        x = cbr(x, self.hidden[0], "layer1")
        x = cbr(x, self.hidden[1], "layer2")
        x = ChannelSpatialAttention(self.hidden[1], name="attention1")(x)
        x = cbr(x, self.hidden[2], "layer3")
        x = cbr(x, self.hidden[3], "layer4")
        x = CBAMSpatialAttention(5, name="attention2")(x)
        logits = nn.Conv(self.num_experts * self.num_bands, (1, 1),
                         name="output_conv")(x)
        b, h, w, _ = logits.shape
        logits = logits.reshape(b, h, w, self.num_experts, self.num_bands)
        return jax.nn.softmax(logits, axis=-2)  # softmax over experts


class AdaptiveFrequencyBandPredictor(nn.Module):
    """Global-pool MLP → per-image (low_split, high_split) in the clamped
    ranges [0.15,0.4] / [0.6,0.9], high ≥ low + 0.2 (fusion_network.py:321-378)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        h = jax.nn.relu(nn.Conv(16, (1, 1), name="fc1")(pooled))
        offsets = jax.nn.sigmoid(nn.Conv(2, (1, 1), name="fc2")(h))
        offsets = (offsets.reshape(x.shape[0], 2) - 0.5) * 0.2
        base_low = self.param("base_low_split", lambda k, s: jnp.asarray(0.25), ())
        base_high = self.param("base_high_split", lambda k, s: jnp.asarray(0.75), ())
        low = jnp.clip(base_low + offsets[:, 0:1], 0.15, 0.4)
        high = jnp.clip(base_high + offsets[:, 1:2], 0.6, 0.9)
        high = jnp.maximum(high, low + 0.2)
        return low, high


class CrossBandAttention(nn.Module):
    """Standard (non-LKA) per-pixel cross-band MHA (fusion_network.py:243-314)."""

    dim: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, bands: Sequence[jnp.ndarray], train: bool = False):
        band_proj = nn.Conv(self.dim, (1, 1), name="band_proj")
        projected = jnp.stack([band_proj(b) for b in bands], axis=-2)
        normed = nn.LayerNorm(epsilon=1e-5, name="norm")(projected)
        attn = TorchMHA(self.dim, self.num_heads, name="band_attention")(normed, train)
        attn = attn + projected
        out_proj = nn.Conv(3, (1, 1), name="out_proj")
        return [out_proj(attn[..., i, :]) + b for i, b in enumerate(bands)]


class CollaborativeFeatureLearning(nn.Module):
    """Standard (non-LKA) cross-expert collaboration (fusion_network.py:1087-1236)."""

    num_experts: int = 3
    feature_dim: int = 128
    num_heads: int = 8

    @nn.compact
    def __call__(self, expert_features: Dict[str, jnp.ndarray],
                 expert_outputs: List[jnp.ndarray], train: bool = False):
        names = ["hat", "dat", "nafnet"][: self.num_experts]
        min_h = min(expert_features[n].shape[1] for n in names)
        min_w = min(expert_features[n].shape[2] for n in names)
        aligned = []
        for n in names:
            a = nn.Conv(self.feature_dim, (1, 1), name=f"align_{n}")(expert_features[n])
            if a.shape[1] != min_h or a.shape[2] != min_w:
                a = resize(a, min_h, min_w, "bilinear")
            aligned.append(a)
        stacked = jnp.stack(aligned, axis=-2)  # [B,H,W,E,C]

        normed = nn.LayerNorm(epsilon=1e-5, name="norm1")(stacked)
        stacked = stacked + TorchMHA(self.feature_dim, self.num_heads,
                                     name="cross_attn")(normed, train)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(stacked)
        h = nn.Dense(self.feature_dim * 4, name="ffn_fc1")(h)
        h = nn.Dropout(0.1, deterministic=not train)(gelu(h))
        stacked = stacked + nn.Dense(self.feature_dim, name="ffn_fc2")(h)

        h_sr, w_sr = expert_outputs[0].shape[1], expert_outputs[0].shape[2]
        outs = []
        for i, out in enumerate(expert_outputs):
            feat = resize(stacked[..., i, :], h_sr, w_sr, "bilinear")
            m = jnp.mean(feat, axis=(1, 2), keepdims=True)
            m = jax.nn.sigmoid(nn.Conv(3, (1, 1), name=f"mod_{i}")(m))
            outs.append(jnp.clip(out * (1.0 + 0.2 * (m - 0.5)), 0.0, 1.0))
        return outs
