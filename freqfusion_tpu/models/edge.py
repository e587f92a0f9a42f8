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
    from ..ops.common import gaussian_1d
    g = gaussian_1d(size, sigma)
    return np.outer(g, g).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, size: int = 5, sigma: float = 1.5,
                  matmul: bool = False) -> jnp.ndarray:
    """Fixed Gaussian blur with zero 'same' padding (torch conv2d padding=2
    semantics). Two forms, same math (pinned by the ssim regression test):

    - matmul=True: banded-Toeplitz matmuls over the spatial axes
      (ops/common.gaussian_blur_matmul). ESSENTIAL under autodiff — the
      depthwise-conv VJP poisoned the cached train step 15× (PERF.md r5).
    - matmul=False (eval default): the depthwise conv — in the EVAL head
      XLA fuses it with the pyramid elementwise ops and the matmul form
      measured slower in-model.
    """
    if matmul:
        from ..ops.common import gaussian_blur_matmul
        return gaussian_blur_matmul(x, size, sigma)
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
    def __call__(self, x=None, raw: bool = False):
        from .nafnet import _ConvParams
        c = self.channels
        w1, b1 = _ConvParams((1, 1, c, c // 4), name="fc1")()
        w2, b2 = _ConvParams((3, 3, c // 4, 1), name="fc2")()
        if raw:
            return w1, b1, w2, b2
        a = jax.lax.conv_general_dilated(
            x, w1.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        a = jax.lax.conv_general_dilated(
            gelu(a), w2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        return x * jax.nn.sigmoid(a)


class EdgeRefineBlock(nn.Module):
    """proj-residual 3-conv refiner + spatial gate.

    Stays in XLA: a strip-resident conv-chain kernel variant measured
    SLOWER here (tiny-K tap matmuls vs XLA's MXU conv stacks — PERF.md
    kernel win/lose taxonomy), so the engine was removed.
    """

    feat_ch: int = 32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import conv3x3_seam
        from .nafnet import _ConvParams
        cin, fc = x.shape[-1], self.feat_ch
        wp, bp = _ConvParams((1, 1, cin, fc), name="proj")()
        w1, b1 = _ConvParams((3, 3, cin, fc), name="conv1")()
        w2, b2 = _ConvParams((3, 3, fc, fc), name="conv2")()
        w3, b3 = _ConvParams((3, 3, fc, fc), name="conv3")()
        attn = SpatialEdgeAttention(fc, name="attn")
        wa1, ba1, wa2, ba2 = attn(raw=True)
        # HR small-channel 3×3 convs → strip kernel (probe class as the
        # NAF intro/ending fix, layers.conv3x3_seam); 1×1s stay XLA matmuls
        act = (self.use_pallas and not train and not self.is_initializing())

        def conv(t, w, b, kk):
            if kk == 3:
                return conv3x3_seam(t, w, b, act)
            return jax.lax.conv_general_dilated(
                t, w.astype(t.dtype), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        identity = conv(x, wp, bp, 1)
        h = gelu(conv(x, w1, b1, 3))
        h = gelu(conv(h, w2, b2, 3))
        h = conv(h, w3, b3, 3) + identity
        a = jax.nn.sigmoid(conv(gelu(conv(h, wa1, ba1, 1)), wa2, ba2, 3))
        return h * a


class LaplacianEdgeRefinement(nn.Module):
    num_levels: int = 3
    channels: int = 32
    edge_strength_init: float = 0.15
    use_pallas: bool = False

    def _pyramid(self, img, train: bool = False) -> List[jnp.ndarray]:
        pyramid = []
        current = img
        for level in range(self.num_levels):
            h, w = current.shape[1], current.shape[2]
            if level < self.num_levels - 1:
                # matmul blur under autodiff (the conv VJP poisoned the
                # cached train step 15x); fused conv on the eval path
                down = avg_pool2(gaussian_blur(current, matmul=train))
                up = resize(down, h, w, "bilinear")
                pyramid.append(current - up)
                current = down
            else:
                pyramid.append(current)
        return pyramid

    @nn.compact
    def __call__(self, sr_img, train: bool = False):
        h, w = sr_img.shape[1], sr_img.shape[2]
        pyramid = self._pyramid(sr_img, train)

        level_w = jax.nn.softmax(self.param(
            "level_weights",
            lambda k, s: jnp.full(s, 1.0 / self.num_levels), (self.num_levels,)))
        feats = []
        for level, lap in enumerate(pyramid):
            f = EdgeRefineBlock(self.channels, self.use_pallas,
                                name=f"edge_refiners_{level}")(lap, train)
            if f.shape[1] != h or f.shape[2] != w:
                f = resize(f, h, w, "bilinear")
            feats.append(f * level_w[level])

        from .nafnet import _ConvParams
        allf = jnp.concatenate(feats, axis=-1)
        cf = allf.shape[-1]
        wf1, bf1 = _ConvParams((3, 3, cf, self.channels),
                               name="fusion_conv1")()
        wf2, bf2 = _ConvParams((3, 3, self.channels, 3),
                               name="fusion_conv2")()
        wg1, bg1 = _ConvParams((3, 3, 6, 16), name="gate_conv1")()
        wg2, bg2 = _ConvParams((3, 3, 16, 1), name="gate_conv2")()
        strength = self.param("edge_strength",
                              lambda k, s: jnp.asarray(self.edge_strength_init), ())
        from .layers import conv3x3_seam
        act = (self.use_pallas and not train and not self.is_initializing())

        def conv(t, w_, b_):
            return conv3x3_seam(t, w_, b_, act)

        edge_map = conv(gelu(conv(allf, wf1, bf1)), wf2, bf2)
        g = conv(jnp.concatenate([sr_img, edge_map], axis=-1), wg1, bg1)
        gate = jax.nn.sigmoid(conv(gelu(g), wg2, bg2))

        return jnp.clip(sr_img + gate * strength * edge_map, 0.0, 1.0)
