"""MambaIR expert (state-space SR), TPU-native.

The reference's MambaIR (/root/reference/src/models/mambair/) is the one
CUDA-bound component of the upstream repo — its SS2D selective scan requires
the `mamba_ssm` CUDA kernels and is import-guarded / replaced by DAT in the
shipped ensemble (expert_loader.py:36-44). Here the selective scan is a
`jax.lax.associative_scan` — the TPU-idiomatic parallel-prefix formulation of
   h_t = exp(Δ_t·A)·h_{t-1} + Δ_t·B_t·x_t,   y_t = C_t·h_t + D·x_t
so the model runs on TPU with no custom kernels at all.

Architecture (mambair_arch.py:209-700): SS2D (4-direction scan: row-major,
column-major and both reversed), VSSBlock (LN → SS2D with per-channel skip
scale, LN → CAB conv-attention with second skip scale), residual state-space
groups with 3×3 conv + skip, HAT-style conv_first/conv_after_body frame, RGB
mean normalization and PixelShuffle upsampling. Default MambaIR-SR config:
embed 180, 6 groups × 6 blocks, d_state 16, expand 2.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.common import pixel_shuffle

RGB_MEAN = (0.4488, 0.4371, 0.4040)


def selective_scan(x, delta, a, b, c, d):
    """Parallel selective scan over the sequence axis.

    x     [B, L, D]      inputs
    delta [B, L, D]      post-softplus step sizes
    a     [D, N]         (negative) state matrix
    b, c  [B, L, N]      input/output projections
    d     [D]            skip
    → y   [B, L, D]

    h_t = exp(Δ_t a)·h_{t-1} + (Δ_t x_t)·b_t is a first-order linear
    recurrence; `associative_scan` evaluates it in O(log L) depth.
    """
    da = jnp.exp(delta[..., None] * a)                       # [B,L,D,N]
    dbx = (delta * x)[..., None] * b[:, :, None, :]          # [B,L,D,N]

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (da, dbx), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, c)
    return y + x * d


class SS2D(nn.Module):
    """4-directional 2-D selective scan block (mambair_arch.py:209-389)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: float = 2.0

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        b, h, w, c = x.shape
        d_inner = int(self.expand * self.d_model)
        dt_rank = math.ceil(self.d_model / 16)
        l = h * w

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        xs = nn.Conv(d_inner, (self.d_conv, self.d_conv),
                     feature_group_count=d_inner, name="conv2d")(xs)
        xs = jax.nn.silu(xs)

        # four scan orders: row-major, col-major, and both reversed
        seq_hw = xs.reshape(b, l, d_inner)
        seq_wh = jnp.transpose(xs, (0, 2, 1, 3)).reshape(b, l, d_inner)
        seqs = [seq_hw, seq_wh, seq_hw[:, ::-1], seq_wh[:, ::-1]]

        x_proj_w = self.param("x_proj_weight", nn.initializers.xavier_uniform(),
                              (4, dt_rank + 2 * self.d_state, d_inner))
        dt_w = self.param("dt_projs_weight",
                          nn.initializers.uniform(scale=dt_rank**-0.5),
                          (4, d_inner, dt_rank))
        dt_b = self.param("dt_projs_bias",
                          lambda k, s: jnp.log(jnp.expm1(
                              jnp.full(s, 0.01))),  # softplus⁻¹(0.01)
                          (4, d_inner))
        a_log = self.param("A_logs",
                           lambda k, s: jnp.log(jnp.tile(
                               jnp.arange(1, self.d_state + 1, dtype=jnp.float32),
                               (4 * d_inner, 1))),
                           (4 * d_inner, self.d_state))
        ds = self.param("Ds", nn.initializers.ones, (4 * d_inner,))

        ys = []
        for k, seq in enumerate(seqs):
            dbl = jnp.einsum("bld,cd->blc", seq, x_proj_w[k])
            dt, bs, cs = jnp.split(dbl, [dt_rank, dt_rank + self.d_state], axis=-1)
            delta = jax.nn.softplus(
                jnp.einsum("blr,dr->bld", dt, dt_w[k]) + dt_b[k])
            a = -jnp.exp(a_log[k * d_inner:(k + 1) * d_inner])
            y = selective_scan(seq, delta, a, bs, cs,
                               ds[k * d_inner:(k + 1) * d_inner])
            ys.append(y)

        y = (ys[0] + ys[2][:, ::-1]).reshape(b, h, w, d_inner)
        y_wh = (ys[1] + ys[3][:, ::-1]).reshape(b, w, h, d_inner)
        y = y + jnp.transpose(y_wh, (0, 2, 1, 3))

        y = nn.LayerNorm(epsilon=1e-5, name="out_norm")(y)
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class MambaCAB(nn.Module):
    """Conv-attention branch of the VSSBlock (RCAN-style CA)."""

    features: int
    compress: int = 3
    squeeze: int = 30

    @nn.compact
    def __call__(self, x):
        h = jax.nn.gelu(nn.Conv(self.features // self.compress, (3, 3),
                                name="conv1")(x), approximate=False)
        h = nn.Conv(self.features, (3, 3), name="conv2")(h)
        att = jnp.mean(h, axis=(1, 2), keepdims=True)
        att = jax.nn.relu(nn.Conv(self.features // 16, (1, 1), name="ca_fc1")(att))
        att = jax.nn.sigmoid(nn.Conv(self.features, (1, 1), name="ca_fc2")(att))
        return h * att


class VSSBlock(nn.Module):
    dim: int
    d_state: int = 16
    expand: float = 2.0

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        s1 = self.param("skip_scale", nn.initializers.ones, (self.dim,))
        s2 = self.param("skip_scale2", nn.initializers.ones, (self.dim,))
        # BasicLayer passes norm_layer=nn.LayerNorm explicitly (eps 1e-5),
        # overriding VSSBlock's 1e-6 default (mambair_arch.py:459, 395)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x * s1 + SS2D(self.dim, self.d_state, expand=self.expand,
                          name="self_attention")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        return x * s2 + MambaCAB(self.dim, name="conv_blk")(h)


class RSSG(nn.Module):
    """Residual State-Space Group: depth × VSSBlock + 3×3 conv + skip."""

    dim: int
    depth: int
    d_state: int
    expand: float

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.depth):
            x = VSSBlock(self.dim, self.d_state, self.expand,
                         name=f"blocks_{i}")(x)
        return res + nn.Conv(self.dim, (3, 3), name="conv")(x)


class MambaIR(nn.Module):
    """Full MambaIR ×4 SR model → (sr, deep_features)."""

    upscale: int = 4
    embed_dim: int = 180
    depths: Sequence[int] = (6,) * 6
    d_state: int = 16
    expand: float = 2.0
    num_feat: int = 64
    img_range: float = 1.0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(RGB_MEAN, dtype=x.dtype)
        x = (x - mean) * self.img_range

        x = nn.Conv(self.embed_dim, (3, 3), name="conv_first")(x)
        # patch_norm=True default: LN after the (no-op) patch embed
        # (mambair_arch.py:529, 565)
        feat = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        for i, depth in enumerate(self.depths):
            feat = RSSG(self.embed_dim, depth, self.d_state, self.expand,
                        name=f"layers_{i}")(feat)
        feat = nn.LayerNorm(epsilon=1e-5, name="norm")(feat)
        deep = nn.Conv(self.embed_dim, (3, 3), name="conv_after_body")(feat)
        x = deep + x

        x = nn.Conv(self.num_feat, (3, 3), name="conv_before_upsample")(x)
        x = jnp.where(x >= 0, x, 0.01 * x)
        for s in range(int(math.log2(self.upscale))):
            x = nn.Conv(4 * self.num_feat, (3, 3), name=f"upsample_{s}")(x)
            x = pixel_shuffle(x, 2)
        x = nn.Conv(3, (3, 3), name="conv_last")(x)

        x = x / self.img_range + mean
        return x, deep
