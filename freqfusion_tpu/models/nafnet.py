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
import jax.numpy as jnp

from ..ops.common import channel_layernorm, pixel_shuffle
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


class NAFBlock(nn.Module):
    """NAFBlock: dwconv + SimpleGate + simplified channel attention + FFN,
    with learnable per-channel residual scales β/γ (init 0)."""

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2

    @nn.compact
    def __call__(self, inp):
        c, dw = self.c, self.c * self.dw_expand
        x = LayerNorm2d(c, name="norm1")(inp)
        x = nn.Conv(dw, (1, 1), name="conv1")(x)
        x = nn.Conv(dw, (3, 3), feature_group_count=dw, name="conv2")(x)
        x = simple_gate(x)
        # simplified channel attention: global avg pool → 1×1 conv → scale
        att = jnp.mean(x, axis=(-3, -2), keepdims=True)
        att = nn.Conv(dw // 2, (1, 1), name="sca")(att)
        x = x * att
        x = nn.Conv(c, (1, 1), name="conv3")(x)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        y = inp + x * beta

        x = LayerNorm2d(c, name="norm2")(y)
        x = nn.Conv(self.ffn_expand * c, (1, 1), name="conv4")(x)
        x = simple_gate(x)
        x = nn.Conv(c, (1, 1), name="conv5")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return y + x * gamma


class NAFStage(nn.Module):
    """A sequence of NAFBlocks at constant width."""

    c: int
    num_blocks: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = NAFBlock(self.c, name=f"blocks_{i}")(x)
        return x


class NAFNet(nn.Module):
    """NAFNet UNet (denoiser core). Input NHWC with H,W % 2^len(enc) == 0."""

    width: int = 64
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)
    img_channel: int = 3

    @nn.compact
    def __call__(self, inp) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (output, pre_ending_features [B,H,W,width])."""
        x = nn.Conv(self.width, (3, 3), name="intro")(inp)

        encs = []
        chan = self.width
        for i, num in enumerate(self.enc_blk_nums):
            x = NAFStage(chan, num, name=f"encoders_{i}")(x)
            encs.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=(2, 2), padding="VALID",
                        name=f"downs_{i}")(x)
            chan *= 2

        x = NAFStage(chan, self.middle_blk_num, name="middle_blks")(x)

        for i, num in enumerate(self.dec_blk_nums):
            x = nn.Conv(chan * 2, (1, 1), use_bias=False, name=f"ups_{i}")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + encs[-(i + 1)]
            x = NAFStage(chan, num, name=f"decoders_{i}")(x)

        feats = x  # input of the `ending` conv — the fusion-head feature tap
        x = nn.Conv(self.img_channel, (3, 3), name="ending")(x)
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
                            self.dec_blk_nums, name="nafnet")(x_in)
        out = out[:, :h, :w, :]
        feats = feats[:, :h, :w, :]
        return jnp.clip(out, 0.0, 1.0), feats
