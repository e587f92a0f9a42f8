"""Hierarchical multi-resolution fusion (Phase 5), TPU-native.

Re-design of /root/reference/src/models/hierarchical_fusion.py: the expert
RGB stack (E·3 ch) is fused progressively at 1/4 → 1/2 → full resolution with
per-stage conv+GELU, spatial gating, 0.1-scaled ResBlocks, learnable
cross-stage residual weights (0.2) and a channel-split residual into stage 3;
output through to_rgb + sigmoid.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .layers import gelu


class SpatialGate(nn.Module):
    """Per-pixel gate: 1×1 (C→C/4) → GELU → 1×1 (→1) → sigmoid."""

    channels: int

    @nn.compact
    def __call__(self, x):
        g = nn.Conv(self.channels // 4, (1, 1), name="fc1")(x)
        g = jax.nn.sigmoid(nn.Conv(1, (1, 1), name="fc2")(gelu(g)))
        return x * g


class ResBlock(nn.Module):
    """Two bias-free 3×3 convs with GELU, 0.1-init learnable residual scale."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), use_bias=False, name="conv1")(x)
        h = nn.Conv(self.channels, (3, 3), use_bias=False, name="conv2")(gelu(h))
        scale = self.param("scale", lambda k, s: jnp.asarray(0.1), ())
        return x + scale * h


class _Stage(nn.Module):
    out1: int
    out2: int

    @nn.compact
    def __call__(self, x):
        x = gelu(nn.Conv(self.out1, (3, 3), name="conv1")(x))
        x = gelu(nn.Conv(self.out2, (3, 3), name="conv2")(x))
        x = SpatialGate(self.out2, name="gate")(x)
        return ResBlock(self.out2, name="res")(x)


class HierarchicalFusion(nn.Module):
    """Progressive 3-stage fusion of stacked expert outputs → RGB in [0,1]."""

    num_experts: int = 3
    base_channels: int = 64

    @nn.compact
    def __call__(self, expert_outputs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        stack = jnp.concatenate(list(expert_outputs.values()), axis=-1)
        h, w = stack.shape[1], stack.shape[2]
        h1, w1 = max(h // 4, 1), max(w // 4, 1)
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        bc = self.base_channels

        s1_in = resize(stack, h1, w1, "bilinear")
        f1 = _Stage(bc, bc, name="stage1")(s1_in)

        f1_up = resize(f1, h2, w2, "bilinear")
        s2_in = jnp.concatenate([f1_up, resize(stack, h2, w2, "bilinear")], axis=-1)
        f2 = _Stage(bc, bc, name="stage2")(s2_in)
        rw12 = self.param("residual_weight_1_2", lambda k, s: jnp.asarray(0.2), ())
        f2 = f2 + rw12 * f1_up

        f2_up = resize(f2, h, w, "bilinear")
        s3_in = jnp.concatenate([f2_up, stack], axis=-1)
        f3 = _Stage(bc, bc // 2, name="stage3")(s3_in)
        rw23 = self.param("residual_weight_2_3", lambda k, s: jnp.asarray(0.2), ())
        f3 = f3 + rw23 * f2_up[..., : bc // 2]

        out = gelu(nn.Conv(bc // 4, (3, 3), name="to_rgb_conv1")(f3))
        out = nn.Conv(3, (3, 3), name="to_rgb_conv2")(out)
        return jax.nn.sigmoid(out)
