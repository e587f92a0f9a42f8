"""Laplacian pyramid edge enhancement (Phase 7b), TPU-native.

Re-design of /root/reference/src/models/edge_enhancement.py: a 3-level
Laplacian pyramid (fixed 5×5 σ=1.5 Gaussian blur + 2×2 avg-pool), per-level
EdgeRefineBlocks, softmax level weights, a fusion conv to an edge map, a
per-pixel gate on [image‖edges], and a learnable edge strength:
out = clamp(sr + gate·strength·edge, 0, 1).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize
from .layers import gelu


def _gaussian_kernel(size: int = 5, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, size: int = 5, sigma: float = 1.5) -> jnp.ndarray:
    """Fixed depthwise Gaussian blur with zero 'same' padding (torch conv2d
    padding=2 semantics)."""
    c = x.shape[-1]
    k = jnp.asarray(_gaussian_kernel(size, sigma))[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding=[(size // 2, size // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2 stride-2 average pool as a reshape-mean (differentiable, fused)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class SpatialEdgeAttention(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = nn.Conv(self.channels // 4, (1, 1), name="fc1")(x)
        a = jax.nn.sigmoid(nn.Conv(1, (3, 3), name="fc2")(gelu(a)))
        return x * a


class EdgeRefineBlock(nn.Module):
    feat_ch: int = 32

    @nn.compact
    def __call__(self, x):
        identity = nn.Conv(self.feat_ch, (1, 1), name="proj")(x)
        h = gelu(nn.Conv(self.feat_ch, (3, 3), name="conv1")(x))
        h = gelu(nn.Conv(self.feat_ch, (3, 3), name="conv2")(h))
        h = nn.Conv(self.feat_ch, (3, 3), name="conv3")(h)
        return SpatialEdgeAttention(self.feat_ch, name="attn")(h + identity)


class LaplacianEdgeRefinement(nn.Module):
    num_levels: int = 3
    channels: int = 32
    edge_strength_init: float = 0.15

    def _pyramid(self, img) -> List[jnp.ndarray]:
        pyramid = []
        current = img
        for level in range(self.num_levels):
            h, w = current.shape[1], current.shape[2]
            if level < self.num_levels - 1:
                down = avg_pool2(gaussian_blur(current))
                up = resize(down, h, w, "bilinear")
                pyramid.append(current - up)
                current = down
            else:
                pyramid.append(current)
        return pyramid

    @nn.compact
    def __call__(self, sr_img):
        h, w = sr_img.shape[1], sr_img.shape[2]
        pyramid = self._pyramid(sr_img)

        level_w = jax.nn.softmax(self.param(
            "level_weights",
            lambda k, s: jnp.full(s, 1.0 / self.num_levels), (self.num_levels,)))
        feats = []
        for level, lap in enumerate(pyramid):
            f = EdgeRefineBlock(self.channels, name=f"edge_refiners_{level}")(lap)
            if f.shape[1] != h or f.shape[2] != w:
                f = resize(f, h, w, "bilinear")
            feats.append(f * level_w[level])

        allf = jnp.concatenate(feats, axis=-1)
        e = gelu(nn.Conv(self.channels, (3, 3), name="fusion_conv1")(allf))
        edge_map = nn.Conv(3, (3, 3), name="fusion_conv2")(e)

        g = nn.Conv(16, (3, 3), name="gate_conv1")(
            jnp.concatenate([sr_img, edge_map], axis=-1))
        gate = jax.nn.sigmoid(nn.Conv(1, (3, 3), name="gate_conv2")(gelu(g)))

        strength = self.param("edge_strength",
                              lambda k, s: jnp.asarray(self.edge_strength_init), ())
        return jnp.clip(sr_img + gate * strength * edge_map, 0.0, 1.0)
