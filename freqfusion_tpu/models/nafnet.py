"""NAFNet-64 expert, TPU-native (NHWC, flax.linen).

Re-design of the reference's NAFNet-SIDD-width64 SR wrapper
(/root/reference/src/models/nafnet/nafnet_arch.py and nafnet/__init__.py):
bicubic ×4 pre-upsample → NAFNet UNet refinement → clamp [0,1].

TPU-first differences from the reference:
- NHWC layout throughout; LayerNorm2d becomes a channels-last layernorm that
  XLA fuses with the following 1×1 conv.
- No forward hooks: the feature the fusion head consumes (the *input* of the
  final `ending` conv, [B,H,W,64] — cf. expert_loader.py:817-883) is an
  explicit second return value.
- Static shapes: the caller pads H/W to a multiple of 16 (`padder_size`)
  before tracing; a convenience wrapper does zero-pad + crop like the
  reference's `check_image_size` when shapes are static anyway.

Architecture (SIDD config): width 64, enc blocks [2,2,4,8], 12 middle blocks
at 1024 ch, dec blocks [2,2,2,2], PixelShuffle ×2 upsamplers in the decoder,
global input residual.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.common import channel_layernorm, pixel_shuffle
from .layers import SeamConv
from ..ops.resize import upsample


class LayerNorm2d(nn.Module):
    """Channels-last equivalent of the reference LayerNorm2d (biased var)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return channel_layernorm(x, w, b, self.eps)


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class _ConvParams(nn.Module):
    """Raw kernel/bias with nn.Conv-compatible names/init so the fused
    Pallas path shares the checkpoint tree with the XLA chain."""

    shape: Tuple[int, int, int, int]  # (kh, kw, in, out) HWIO
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(batch_axis=(),
                       in_axis=-2, out_axis=-1), self.shape)
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class _LN2dParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


class NAFBlock(nn.Module):
    """NAFBlock: dwconv + SimpleGate + simplified channel attention + FFN,
    with learnable per-channel residual scales β/γ (init 0).

    With `use_pallas` (TPU, eval) the whole block runs as two fused
    VMEM-resident kernels (ops/pallas/nafblock.py) — the width-64 blocks at
    the ×4-upsampled resolution are otherwise pure HBM bandwidth."""

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, inp):
        c, dw = self.c, self.c * self.dw_expand
        ln1_w, ln1_b = _LN2dParams(c, name="norm1")()
        ln2_w, ln2_b = _LN2dParams(c, name="norm2")()
        w1, b1 = _ConvParams((1, 1, c, dw), name="conv1")()
        wdw, bdw = _ConvParams((3, 3, 1, dw), name="conv2")()
        sca_w, sca_b = _ConvParams((1, 1, dw // 2, dw // 2), name="sca")()
        w3, b3 = _ConvParams((1, 1, dw // 2, c), name="conv3")()
        w4, b4 = _ConvParams((1, 1, c, self.ffn_expand * c), name="conv4")()
        w5, b5 = _ConvParams((1, 1, self.ffn_expand * c // 2, c),
                             name="conv5")()
        beta = self.param("beta", nn.initializers.zeros, (c,))
        gamma = self.param("gamma", nn.initializers.zeros, (c,))

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu"
                and self.dw_expand == 2 and self.ffn_expand == 2
                and self.c <= 256):  # deep wide levels are MXU-bound; their
                # f32 weight blocks (≥2 MB each) would crowd VMEM
            from ..ops.pallas.nafblock import fused_naf_block
            params = dict(ln1_w=ln1_w, ln1_b=ln1_b, w1=w1, b1=b1, wdw=wdw,
                          bdw=bdw, w3=w3, b3=b3, beta=beta, ln2_w=ln2_w,
                          ln2_b=ln2_b, w4=w4, b4=b4, w5=w5, b5=b5,
                          gamma=gamma)
            return fused_naf_block(inp, params, sca_w, sca_b)

        def conv1x1(t, k, b):
            return jnp.einsum("bhwc,cd->bhwd", t,
                              k.reshape(k.shape[-2], k.shape[-1])) + b

        x = channel_layernorm(inp, ln1_w, ln1_b)
        x = conv1x1(x, w1, b1)
        x = jax.lax.conv_general_dilated(
            x, wdw.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=dw) + bdw
        x = simple_gate(x)
        # simplified channel attention: global avg pool → 1×1 conv → scale
        att = jnp.mean(x, axis=(-3, -2), keepdims=True)
        att = conv1x1(att, sca_w, sca_b)
        x = x * att
        x = conv1x1(x, w3, b3)
        y = inp + x * beta

        x = channel_layernorm(y, ln2_w, ln2_b)
        x = conv1x1(x, w4, b4)
        x = simple_gate(x)
        x = conv1x1(x, w5, b5)
        return y + x * gamma


class NAFStage(nn.Module):
    """A sequence of NAFBlocks at constant width."""

    c: int
    num_blocks: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = NAFBlock(self.c, use_pallas=self.use_pallas,
                         name=f"blocks_{i}")(x)
        return x


class NAFNet(nn.Module):
    """NAFNet UNet (denoiser core). Input NHWC with H,W % 2^len(enc) == 0."""

    width: int = 64
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)
    img_channel: int = 3
    use_pallas: bool = False

    @nn.compact
    def __call__(self, inp) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (output, pre_ending_features [B,H,W,width])."""
        # 3->64 at HR: XLA lowers few-channel convs at C/128 lane
        # utilization (probe_nafglue r5: 35.5 ms); the strip kernel
        # reads/writes the real channels only
        x = SeamConv(self.width, self.use_pallas, name="intro")(inp)

        encs = []
        chan = self.width
        for i, num in enumerate(self.enc_blk_nums):
            x = NAFStage(chan, num, self.use_pallas, name=f"encoders_{i}")(x)
            encs.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=(2, 2), padding="VALID",
                        name=f"downs_{i}")(x)
            chan *= 2

        x = NAFStage(chan, self.middle_blk_num, self.use_pallas,
                     name="middle_blks")(x)

        for i, num in enumerate(self.dec_blk_nums):
            x = nn.Conv(chan * 2, (1, 1), use_bias=False, name=f"ups_{i}")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + encs[-(i + 1)]
            x = NAFStage(chan, num, self.use_pallas, name=f"decoders_{i}")(x)

        feats = x  # input of the `ending` conv — the fusion-head feature tap
        x = SeamConv(self.img_channel, self.use_pallas,  # 64->3 at HR
                     name="ending")(x)
        x = x + inp
        return x, feats


class NAFNetSR(nn.Module):
    """Bicubic ×4 pre-upsample + NAFNet refinement (the reference's NAFNetSR).

    `__call__(lr)` → (sr [B,4H,4W,3] clamped to [0,1], feats [B,4H,4W,64]).
    H*upscale and W*upscale must be multiples of 16 (static-shape contract);
    use `pad_to_multiple` upstream otherwise.
    """

    upscale: int = 4
    width: int = 64
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)
    use_pallas: bool = False

    @nn.compact
    def __call__(self, lr) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x_up = upsample(lr, self.upscale, "bicubic")
        h, w = x_up.shape[-3], x_up.shape[-2]
        mult = 2 ** len(self.enc_blk_nums)
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        x_in = x_up
        if ph or pw:
            x_in = jnp.pad(x_up, [(0, 0), (0, ph), (0, pw), (0, 0)])
        out, feats = NAFNet(self.width, self.middle_blk_num, self.enc_blk_nums,
                            self.dec_blk_nums, use_pallas=self.use_pallas,
                            name="nafnet")(x_in)
        out = out[:, :h, :w, :]
        feats = feats[:, :h, :w, :]
        return jnp.clip(out, 0.0, 1.0), feats
