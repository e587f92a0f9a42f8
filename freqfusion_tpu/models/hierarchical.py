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
    def __call__(self, x=None, raw: bool = False):
        from .nafnet import _ConvParams
        c = self.channels
        w1, b1 = _ConvParams((1, 1, c, c // 4), name="fc1")()
        w2, b2 = _ConvParams((1, 1, c // 4, 1), name="fc2")()
        if raw:
            return w1, b1, w2, b2
        g = jnp.einsum("bhwc,cd->bhwd", x, w1.reshape(c, c // 4)) + b1
        g = jnp.einsum("bhwc,cd->bhwd", gelu(g),
                       w2.reshape(c // 4, 1)) + b2
        return x * jax.nn.sigmoid(g)


class ResBlock(nn.Module):
    """Two bias-free 3×3 convs with GELU, 0.1-init learnable residual scale."""

    channels: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x=None, raw: bool = False, train: bool = False):
        from .nafnet import _ConvParams
        c = self.channels
        w1, _ = _ConvParams((3, 3, c, c), use_bias=False, name="conv1")()
        w2, _ = _ConvParams((3, 3, c, c), use_bias=False, name="conv2")()
        scale = self.param("scale", lambda k, s: jnp.asarray(0.1), ())
        if raw:
            return w1, w2, scale
        from .layers import conv3x3_seam
        act = (self.use_pallas and not train
               and not self.is_initializing())
        h = conv3x3_seam(gelu(conv3x3_seam(x, w1, None, act)), w2, None, act)
        return x + scale * h


class _Stage(nn.Module):
    """conv+GELU ×2 → SpatialGate → ResBlock (XLA: the strip-chain kernel
    variant measured slower than XLA's MXU conv stacks — PERF.md)."""

    out1: int
    out2: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .nafnet import _ConvParams
        cin = x.shape[-1]
        w1, b1 = _ConvParams((3, 3, cin, self.out1), name="conv1")()
        w2, b2 = _ConvParams((3, 3, self.out1, self.out2), name="conv2")()
        gate = SpatialGate(self.out2, name="gate")
        res = ResBlock(self.out2, self.use_pallas, name="res")

        from .layers import conv3x3_seam
        act = (self.use_pallas and not train
               and not self.is_initializing())
        x = gelu(conv3x3_seam(x, w1, b1, act))
        x = gelu(conv3x3_seam(x, w2, b2, act))
        x = gate(x)
        return res(x, train=train)


class HierarchicalFusion(nn.Module):
    """Progressive 3-stage fusion of stacked expert outputs → RGB in [0,1]."""

    num_experts: int = 3
    base_channels: int = 64
    use_pallas: bool = False

    @nn.compact
    def __call__(self, expert_outputs: Dict[str, jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        stack = jnp.concatenate(list(expert_outputs.values()), axis=-1)
        h, w = stack.shape[1], stack.shape[2]
        h1, w1 = max(h // 4, 1), max(w // 4, 1)
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        bc = self.base_channels

        s1_in = resize(stack, h1, w1, "bilinear")
        f1 = _Stage(bc, bc, self.use_pallas, name="stage1")(s1_in, train)

        f1_up = resize(f1, h2, w2, "bilinear")
        s2_in = jnp.concatenate([f1_up, resize(stack, h2, w2, "bilinear")], axis=-1)
        f2 = _Stage(bc, bc, self.use_pallas, name="stage2")(s2_in, train)
        rw12 = self.param("residual_weight_1_2", lambda k, s: jnp.asarray(0.2), ())
        f2 = f2 + rw12 * f1_up

        f2_up = resize(f2, h, w, "bilinear")
        s3_in = jnp.concatenate([f2_up, stack], axis=-1)
        f3 = _Stage(bc, bc // 2, self.use_pallas, name="stage3")(s3_in, train)
        rw23 = self.param("residual_weight_2_3", lambda k, s: jnp.asarray(0.2), ())
        f3 = f3 + rw23 * f2_up[..., : bc // 2]

        from .nafnet import _ConvParams
        wr1, br1 = _ConvParams((3, 3, bc // 2, bc // 4),
                               name="to_rgb_conv1")()
        wr2, br2 = _ConvParams((3, 3, bc // 4, 3), name="to_rgb_conv2")()
        from .layers import conv3x3_seam
        act = (self.use_pallas and not train
               and not self.is_initializing())
        out = conv3x3_seam(gelu(conv3x3_seam(f3, wr1, br1, act)),
                           wr2, br2, act)
        return jax.nn.sigmoid(out)
