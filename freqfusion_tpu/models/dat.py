"""DAT expert (Dual Aggregation Transformer, ICCV'23), TPU-native.

Re-design of the reference's DAT (/root/reference/src/models/dat/dat_arch.py)
as NHWC flax modules with static shapes:

- Tensors stay [B,H,W,C]; the reference's token-form [B,N,C] reshuffling
  disappears (LayerNorm/Dense act on the last axis directly).
- Window masks / relative-position tables are numpy constants built at trace
  time (ops/windows.py) — no registered buffers, no dynamic mask branch.
- BatchNorms inside AIM run in frozen-expert eval mode (`BatchNormEval`
  affine with running stats as params).
- The deep feature the fusion head consumes (output of `conv_after_body`,
  [B,H,W,180] — hook-captured in the reference, expert_loader.py:817-883) is
  an explicit second return value.

Shipped ensemble config (expert_loader.py:412-420): embed 180, 6 groups × 6
blocks, heads 6, split_size [8,32], expansion 4.0, img_range 1.0,
'pixelshuffle' upsampler, rgb_mean (0.4488, 0.4371, 0.4040).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import windows as W
from ..ops.common import pixel_shuffle
from .layers import SeamConv, _DenseParams, _LNParams, apply_ln
from .nafnet import _ConvParams

RGB_MEAN = (0.4488, 0.4371, 0.4040)


class BatchNormEval(nn.Module):
    """BatchNorm2d in eval mode: fixed affine with running statistics.

    The experts are frozen at both train and inference time, so BN is always
    an affine transform; storing running stats as (frozen) params keeps the
    whole expert a plain param pytree.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x=None, raw: bool = False):
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        if raw:  # (scale, shift) of the folded eval-mode affine
            return inv, bias - mean * inv
        return x * inv + (bias - mean * inv)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class DynamicPosBias(nn.Module):
    """CrossFormer dynamic relative position bias MLP: 2 → pos_dim →
    pos_dim → pos_dim → num_heads (LayerNorm+ReLU between).

    `dim` is the constructor dim; the effective pos_dim is dim // 4 (the
    reference divides again inside DynamicPosBias, dat_arch.py:181-186, so
    with branch dim D the MLP width is D/16)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, biases):  # [(2h-1)(2w-1), 2]
        x = nn.Dense(self.dim // 4, name="pos_proj")(biases)
        for i in (1, 2):
            h = nn.LayerNorm(epsilon=1e-5, name=f"pos{i}_norm")(x)
            x = nn.Dense(self.dim // 4, name=f"pos{i}_fc")(jax.nn.relu(h))
        h = nn.LayerNorm(epsilon=1e-5, name="pos3_norm")(x)
        return nn.Dense(self.num_heads, name="pos3_fc")(jax.nn.relu(h))


class SpatialWindowAttention(nn.Module):
    """Rectangular-window MHA over one C/2 branch, with dynamic pos bias.

    Operates on pre-projected q,k,v images [B,H,W,Cb]; window shape is
    (hs,ws); optional shifted-window mask is a [nW,N,N] constant.
    """

    dim: int
    num_heads: int
    hs: int
    ws: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q, k, v, mask=None, x=None, wqkv=None, bqkv=None):
        """Either pre-projected (q, k, v) images, or — fused path — the
        full-width feature image `x` plus this branch's qkv weight columns
        (the projection then happens inside the Pallas kernel)."""
        if x is not None:
            b, h, w, _ = x.shape
            c = wqkv.shape[1] // 3
        else:
            b, h, w, c = q.shape
        hd = c // self.num_heads
        n = self.hs * self.ws

        pos = DynamicPosBias(self.dim // 4, self.num_heads, name="pos")(
            jnp.asarray(W.relative_coords_table(self.hs, self.ws)))
        # gather-free Toeplitz construction (ops/windows.py)
        bias = W.swin_bias_from_table(pos, self.hs, self.ws)

        if x is not None:  # caller gated on use_pallas/backend
            from ..ops.pallas.wattn import fused_window_attention_xqkv
            return fused_window_attention_xqkv(
                x, wqkv, bqkv, bias,
                np.asarray(mask) if mask is not None else None,
                (self.hs, self.ws), self.num_heads)

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu"
                and self.hs * self.ws >= 64):
            from ..ops.pallas.wattn import fused_window_attention_qkv
            return fused_window_attention_qkv(
                q, k, v, bias, np.asarray(mask) if mask is not None else None,
                (self.hs, self.ws), self.num_heads)

        def to_wins(t):
            t = W.window_partition(t, self.hs, self.ws)  # [B*nW, N, C]
            t = t.reshape(-1, n, self.num_heads, hd)
            return jnp.transpose(t, (0, 2, 1, 3))  # [B*nW, heads, N, hd]

        qw, kw, vw = to_wins(q), to_wins(k), to_wins(v)
        scale = hd ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", qw * scale, kw,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vw,
                         preferred_element_type=jnp.float32)
        # cast the f32 accumulation back so bf16 inputs stay bf16 (the scan
        # over RG pairs requires a dtype-stable carry; the Pallas path above
        # already returns the input dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, n, c).astype(q.dtype)
        return W.window_reverse(out, self.hs, self.ws, h, w)


class AIMConvBranch(nn.Module):
    """Depthwise conv branch + the two AIM interaction heads."""

    dim: int

    @nn.compact
    def __call__(self, v_img=None, raw: bool = False):
        from .nafnet import _ConvParams
        wdw, bdw = _ConvParams((3, 3, 1, self.dim), name="dwconv")()
        bn_s, bn_b = BatchNormEval(self.dim, name="dwconv_bn")(raw=True)
        if raw:
            return wdw, bdw, bn_s, bn_b
        x = jax.lax.conv_general_dilated(
            v_img, wdw.astype(v_img.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim) + bdw
        return gelu(x * bn_s + bn_b)


class ChannelInteraction(nn.Module):
    """AIM C-Map: GAP → 1×1 (C→C/8) → BN → GELU → 1×1 (C/8→C)."""

    dim: int

    @nn.compact
    def __call__(self, x=None, pooled=None):
        """`x` full image (GAP applied here) or `pooled` [B,1,1,C]."""
        from .nafnet import _ConvParams
        mid = self.dim // 8
        w1, b1 = _ConvParams((1, 1, self.dim, mid), name="fc1")()
        bn_s, bn_b = BatchNormEval(mid, name="bn")(raw=True)
        w2, b2 = _ConvParams((1, 1, mid, self.dim), name="fc2")()
        g = pooled if pooled is not None else jnp.mean(
            x, axis=(1, 2), keepdims=True)
        g = jnp.einsum("bhwc,cd->bhwd", g, w1.reshape(self.dim, mid)) + b1
        g = g * bn_s + bn_b
        g = jnp.einsum("bhwc,cd->bhwd", gelu(g),
                       w2.reshape(mid, self.dim)) + b2
        return g  # [B,1,1,C]


class SpatialInteraction(nn.Module):
    """AIM S-Map: 1×1 (C→C/16) → BN → GELU → 1×1 (→1)."""

    dim: int

    @nn.compact
    def __call__(self, x=None, raw: bool = False):
        from .nafnet import _ConvParams
        mid = self.dim // 16
        w1, b1 = _ConvParams((1, 1, self.dim, mid), name="fc1")()
        bn_s, bn_b = BatchNormEval(mid, name="bn")(raw=True)
        w2, b2 = _ConvParams((1, 1, mid, 1), name="fc2")()
        if raw:
            return w1, b1, bn_s, bn_b, w2, b2
        s = jnp.einsum("bhwc,cd->bhwd", x, w1.reshape(self.dim, mid)) + b1
        s = s * bn_s + bn_b
        s = jnp.einsum("bhwc,cd->bhwd", gelu(s), w2.reshape(mid, 1)) + b2
        return s  # [B,H,W,1]


def _branch_qkv_slices(wqkv, bqkv, c: int, half: int, br: int):
    """One branch's qkv projection columns from the full [C, 3C] Dense
    kernel: branch `br` owns channels [br·half, br·half+half) of each of
    the q/k/v sections (the reference splits the projected tensor the same
    way, dat_arch.py:417-424)."""
    off = br * half
    cols = [slice(s * c + off, s * c + off + half) for s in range(3)]
    wb = jnp.concatenate([wqkv[:, s] for s in cols], axis=1)
    bb = jnp.concatenate([bqkv[s] for s in cols])
    return wb, bb


def _should_shift(rg_idx: int, b_idx: int) -> bool:
    return ((rg_idx % 2 == 0 and b_idx > 0 and (b_idx - 2) % 4 == 0)
            or (rg_idx % 2 != 0 and b_idx % 4 == 0))


class AdaptiveSpatialAttention(nn.Module):
    """Dual rectangular-window spatial attention + AIM (dat_arch.py:347-563)."""

    dim: int
    num_heads: int
    split_size: Sequence[int]
    shift_size: Sequence[int]
    shift: bool
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        b, h, w, c = x.shape
        wqkv, bqkv = _DenseParams(c, 3 * c, name="qkv")()

        s0, s1 = self.split_size
        sh0, sh1 = self.shift_size
        mx = max(s0, s1)
        ph, pw = (mx - h % mx) % mx, (mx - w % mx) % mx
        _h, _w = h + ph, w + pw
        half = c // 2
        shift = self.shift

        on_tpu = (self.use_pallas and not self.is_initializing()
                  and jax.default_backend() == "tpu")
        # In-kernel qkv projection needs unpadded window-multiple shapes
        # (padding zeros AFTER the projection, as the reference does, is not
        # the same as projecting a zero-padded image — the bias lands in the
        # pad region). Serving buckets to 32-px multiples, so the fused path
        # covers production; ragged shapes take the XLA-projection path.
        fused_x = on_tpu and ph == 0 and pw == 0 and s0 * s1 >= 64

        if fused_x:
            # AIM's conv branch consumes the v image: project just v's
            # columns in XLA (the attention branches re-project in-kernel)
            v = x @ wqkv[:, 2 * c:] + bqkv[2 * c:]
        else:
            qkv = x @ wqkv + bqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def pad(t):
                return (jnp.pad(t, [(0, 0), (0, ph), (0, pw), (0, 0)])
                        if (ph or pw) else t)

            qp, kp, vp = pad(q), pad(k), pad(v)

        outs = []
        for br, (hs, ws, sh, sw) in enumerate(
                [(s0, s1, sh0, sh1), (s1, s0, sh1, sh0)]):
            mask = (W.shift_attn_mask(_h, _w, hs, ws, sh, sw)
                    if shift else None)
            mod = SpatialWindowAttention(half, self.num_heads // 2, hs, ws,
                                         self.use_pallas, name=f"attns_{br}")
            if fused_x:
                wb, bb = _branch_qkv_slices(wqkv, bqkv, c, half, br)
                xb = (jnp.roll(x, (-sh, -sw), axis=(1, 2)) if shift else x)
                o = mod(None, None, None, mask, x=xb, wqkv=wb, bqkv=bb)
                if shift:
                    o = jnp.roll(o, (sh, sw), axis=(1, 2))
                outs.append(o)
                continue
            sl = slice(0, half) if br == 0 else slice(half, c)
            qb, kb, vb = qp[..., sl], kp[..., sl], vp[..., sl]
            if shift:
                qb, kb, vb = (jnp.roll(t, (-sh, -sw), axis=(1, 2))
                              for t in (qb, kb, vb))
            o = mod(qb, kb, vb, mask)
            if shift:
                o = jnp.roll(o, (sh, sw), axis=(1, 2))
            outs.append(o[:, :h, :w, :])
        attened = jnp.concatenate(outs, axis=-1)

        aimb = AIMConvBranch(c, name="conv_branch")
        ci = ChannelInteraction(c, name="channel_interaction")
        si = SpatialInteraction(c, name="spatial_interaction")
        proj_w, proj_b = _DenseParams(c, c, name="proj")()

        if on_tpu:
            from ..ops.pallas.aim import aim_conv_branch, aim_gates_proj
            cx, sums = aim_conv_branch(v, *aimb(raw=True))
            chmap = ci(pooled=sums / np.float32(h * w))
            return aim_gates_proj(attened, cx, chmap, *si(raw=True),
                                  proj_w, proj_b, swap=False)

        conv_x = aimb(v)
        channel_map = ci(conv_x)
        spatial_map = si(attened)
        attened = attened * jax.nn.sigmoid(channel_map)
        conv_x = conv_x * jax.nn.sigmoid(spatial_map)
        return (attened + conv_x) @ proj_w + proj_b


class AdaptiveChannelAttention(nn.Module):
    """XCiT-style cross-covariance channel attention + AIM (dat_arch.py:569-666)."""

    dim: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        b, h, w, c = x.shape
        n = h * w
        nh = self.num_heads
        hd = c // nh
        # Transpose-free XCiT: the reference materializes [B,heads,hd,N]
        # layouts (two full-tensor transposes). Here tensors stay N-major
        # [B,N,C]: the per-head C×C Grams are the diagonal blocks of the full
        # (cheap, [C,C]) Gram, l2 normalization is a separable outer-product
        # scale on it, and applying attention is one matmul against the
        # block-diagonal attention matrix. Math-identical (dat_arch.py
        # Adaptive_Channel_Attention), no relayouts.
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x).reshape(b, n, 3 * c)
        qf, kf, vf = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]

        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        qn = jnp.maximum(jnp.sqrt(jnp.sum(
            jnp.square(qf.astype(jnp.float32)), axis=1)), 1e-12)  # [B,C]
        kn = jnp.maximum(jnp.sqrt(jnp.sum(
            jnp.square(kf.astype(jnp.float32)), axis=1)), 1e-12)
        gram = jnp.einsum("bnc,bnd->bcd", qf, kf,
                          preferred_element_type=jnp.float32)
        gram = gram / (qn[:, :, None] * kn[:, None, :])
        blocks = jnp.stack(
            [gram[:, i * hd:(i + 1) * hd, i * hd:(i + 1) * hd]
             for i in range(nh)], axis=1)  # [B,heads,hd,hd]
        attn = jax.nn.softmax(blocks * temperature, axis=-1)
        # block-diagonal [B,C,C] application keeps v N-major
        eye = jnp.eye(nh, dtype=attn.dtype)
        bd = jnp.einsum("bhcd,hg->bhcgd", attn, eye)  # [B,h,hd,h',hd]
        bd = bd.reshape(b, c, c)
        attened = jnp.einsum("bnc,bdc->bnd", vf, bd,
                             preferred_element_type=jnp.float32)
        attened = attened.reshape(b, h, w, c).astype(x.dtype)

        v_img = vf.reshape(b, h, w, c)
        aimb = AIMConvBranch(c, name="conv_branch")
        ci = ChannelInteraction(c, name="channel_interaction")
        si = SpatialInteraction(c, name="spatial_interaction")
        proj_w, proj_b = _DenseParams(c, c, name="proj")()

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu"):
            from ..ops.pallas.aim import aim_conv_branch, aim_gates_proj
            cx, _ = aim_conv_branch(v_img, *aimb(raw=True))
            chmap = ci(pooled=jnp.mean(attened, axis=(1, 2), keepdims=True))
            return aim_gates_proj(attened, cx, chmap, *si(raw=True),
                                  proj_w, proj_b, swap=True)

        conv_x = aimb(v_img)
        channel_map = ci(attened)
        spatial_map = si(conv_x)
        attened = attened * jax.nn.sigmoid(spatial_map)
        conv_x = conv_x * jax.nn.sigmoid(channel_map)
        return (attened + conv_x) @ proj_w + proj_b


class SGFN(nn.Module):
    """Spatial-Gate FFN: fc1 → GELU → (x1 ⊙ dwconv(LN(x2))) → fc2."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, raw: bool = False):  # [B,H,W,C]
        half = self.hidden // 2
        k1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        sg_w, sg_b = _LNParams(half, name="sg_norm")()
        wdw, bdw = _ConvParams((3, 3, 1, half), name="sg_conv")()
        k2, b2 = _DenseParams(half, self.dim, name="fc2")()
        if raw:  # fused-tail path (ops/pallas/sgfn.py) pulls the params out
            return k1, b1, sg_w, sg_b, wdw, bdw, k2, b2
        x = gelu(x @ k1 + b1)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x2 = apply_ln(x2, sg_w, sg_b)
        x2 = jax.lax.conv_general_dilated(
            x2, wdw.astype(x2.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=half) + bdw
        return (x1 * x2) @ k2 + b2


class DATB(nn.Module):
    """Dual Aggregation Transformer Block: alternating spatial/channel attn."""

    dim: int
    num_heads: int
    split_size: Sequence[int]
    expansion: float
    spatial: bool
    shift: bool
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.spatial:
            shift = [self.split_size[0] // 2, self.split_size[1] // 2]
            h = AdaptiveSpatialAttention(
                self.dim, self.num_heads, self.split_size, shift,
                self.shift, self.use_pallas, name="attn")(h)
        else:
            h = AdaptiveChannelAttention(self.dim, self.num_heads,
                                         self.use_pallas, name="attn")(h)
        ln2_w, ln2_b = _LNParams(self.dim, name="norm2")()
        ffn = SGFN(self.dim, int(self.dim * self.expansion), name="ffn")

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu"):
            from ..ops.pallas.sgfn import fused_sgfn_tail
            return fused_sgfn_tail(h, x, ln2_w, ln2_b, *ffn(x, raw=True))

        x = x + h
        return x + ffn(apply_ln(x, ln2_w, ln2_b))


class ResidualGroup(nn.Module):
    dim: int
    depth: int
    num_heads: int
    split_size: Sequence[int]
    expansion: float
    rg_idx: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        for j in range(self.depth):
            x = DATB(self.dim, self.num_heads, self.split_size, self.expansion,
                     j % 2 == 0, _should_shift(self.rg_idx, j),
                     self.use_pallas, name=f"blocks_{j}")(x)
        x = SeamConv(self.dim, self.use_pallas, name="conv")(x)
        return res + x


class _RGPair(nn.Module):
    """One (even-rg, odd-rg) ResidualGroup pair — the repeating unit of DAT.

    _should_shift depends only on rg parity, so every consecutive group
    pair is structurally identical and the whole trunk is a lax.scan over
    n_groups/2 pairs (36 DATB trace sites → 12 for DAT-L)."""

    dim: int
    depth: int
    num_heads: int
    split_size: Sequence[int]
    expansion: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for g in (0, 1):
            x = ResidualGroup(self.dim, self.depth, self.num_heads,
                              self.split_size, self.expansion, g,
                              self.use_pallas, name=f"g{g}")(x)
        return x


class DAT(nn.Module):
    """The full DAT ×4 SR model. `__call__(lr [B,H,W,3])` →
    (sr [B,4H,4W,3], deep_features [B,H,W,embed_dim])."""

    upscale: int = 4
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    split_size: Sequence[int] = (8, 32)
    expansion: float = 4.0
    num_feat: int = 64
    img_range: float = 1.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(RGB_MEAN, dtype=x.dtype)
        x = (x - mean) * self.img_range

        # conv_first/conv_last stay nn.Conv: the r5 SeamConv swap measured
        # WORSE in-model (+8-10 ms/expert) — XLA fuses these with the
        # surrounding elementwise ops; standalone-op probes mislead here
        x = nn.Conv(self.embed_dim, (3, 3), name="conv_first")(x)
        feat = nn.LayerNorm(epsilon=1e-5, name="before_rg_norm")(x)
        from .hat import scan_blocks_enabled, _scan_stack
        uniform = (len(set(self.depths)) == 1
                   and len(set(self.num_heads)) == 1)
        if (uniform and len(self.depths) >= 2 and len(self.depths) % 2 == 0
                and scan_blocks_enabled()):
            pair = _RGPair(self.embed_dim, self.depths[0], self.num_heads[0],
                           self.split_size, self.expansion, self.use_pallas,
                           name="layers")
            feat = _scan_stack(pair, feat, len(self.depths) // 2)
        else:
            for i, d in enumerate(self.depths):
                feat = ResidualGroup(self.embed_dim, d, self.num_heads[i],
                                     self.split_size, self.expansion, i,
                                     self.use_pallas, name=f"layers_{i}")(feat)
        feat = nn.LayerNorm(epsilon=1e-5, name="norm")(feat)
        deep = SeamConv(self.embed_dim, self.use_pallas,
                        name="conv_after_body")(feat)
        x = deep + x

        x = nn.Conv(self.num_feat, (3, 3), name="conv_before_upsample")(x)
        x = jnp.where(x >= 0, x, 0.01 * x)  # LeakyReLU(0.01)
        for s in range(int(math.log2(self.upscale))):
            x = nn.Conv(4 * self.num_feat, (3, 3), name=f"upsample_{s}")(x)
            x = pixel_shuffle(x, 2)
        x = nn.Conv(3, (3, 3), name="conv_last")(x)

        x = x / self.img_range + mean
        return x, deep
