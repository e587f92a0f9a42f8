"""HAT-L expert (Hybrid Attention Transformer, CVPR'23), TPU-native.

Re-design of the reference HAT (/root/reference/src/models/hat/hat_arch.py)
as NHWC flax modules:

- [B,H,W,C] tensors end-to-end; the token-form patch_embed/patch_unembed
  round-trips of the reference collapse to no-ops (a LayerNorm on the last
  axis remains).
- Relative-position indices, shifted-window masks and the OCAB overlapping
  windows use static numpy tables / gathers (ops/windows.py), replacing
  registered buffers + nn.Unfold.
- The deep feature the fusion head consumes (output of `conv_after_body`,
  hook-captured in the reference) is an explicit second return value.

HAT-L config (hat/__init__.py:63-118): embed 180, 12 RHAG × 6 HAB, heads 6,
window 16 (shift 8), overlap_ratio 0.5 (OCAB window 24), CAB compress 3 /
squeeze 30 / conv_scale 0.01, mlp_ratio 2, PixelShuffle ×4, num_feat 64,
rgb_mean (0.4488, 0.4371, 0.4040). 40.84M params.
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

from .layers import (SeamConv, _DenseParams, _LNParams,  # canonical raw-param helpers
                     apply_ln)

RGB_MEAN = (0.4488, 0.4371, 0.4040)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, raw: bool = False):
        k1, b1 = _DenseParams(x.shape[-1], self.hidden, name="fc1")()
        k2, b2 = _DenseParams(self.hidden, self.out, name="fc2")()
        if raw:
            return k1, b1, k2, b2
        return gelu(x @ k1 + b1) @ k2 + b2


class ChannelAttention(nn.Module):
    """RCAN channel attention: GAP → 1×1 (C→C/squeeze) → ReLU → 1×1 → sigmoid."""

    features: int
    squeeze: int = 16

    @nn.compact
    def __call__(self, x=None, raw: bool = False):
        from .nafnet import _ConvParams
        c = self.features
        w1, b1 = _ConvParams((1, 1, c, c // self.squeeze), name="fc1")()
        w2, b2 = _ConvParams((1, 1, c // self.squeeze, c), name="fc2")()
        if raw:
            return w1, b1, w2, b2
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = jax.nn.relu(jnp.einsum(
            "bhwc,cd->bhwd", y, w1.reshape(c, -1)) + b1)
        y = jax.nn.sigmoid(jnp.einsum(
            "bhwc,cd->bhwd", y, w2.reshape(-1, c)) + b2)
        return x * y


class CAB(nn.Module):
    """Conv attention branch of HAB: 3×3 (C→C/compress) → GELU → 3×3 → CA."""

    features: int
    compress: int = 3
    squeeze: int = 30

    @nn.compact
    def __call__(self, x=None, raw: bool = False):
        from .nafnet import _ConvParams
        c = self.features
        mid = c // self.compress
        w1, b1 = _ConvParams((3, 3, c, mid), name="conv1")()
        w2, b2 = _ConvParams((3, 3, mid, c), name="conv2")()
        ca = ChannelAttention(c, self.squeeze, name="ca")
        if raw:
            return (w1, b1, w2, b2) + tuple(ca(raw=True))
        assert x is not None, "CAB: x is required unless raw=True"
        # thin-channel conv pair: lowering is env-selectable (FREQFUSION_
        # CAB_IMPL) — XLA's native conv runs it at ~25% MXU util (PERF.md)
        from ..ops.convchain import conv3x3_chain
        return ca(conv3x3_chain(x, w1, b1, w2, b2))


class WindowAttention(nn.Module):
    """W-MSA over ws×ws windows with a learned relative-position bias table.

    Takes the full (pre-rolled) image [B,H,W,C]; window partition/merge live
    inside so the fused Pallas path (ops/pallas/wattn.py) can replace the
    whole partition→qkv→MHA→proj→merge chain with one VMEM-resident kernel.
    Raw qkv/proj params (not nn.Dense) so both paths share them.
    """

    dim: int
    window: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x_img, mask=None, raw: bool = False):  # [B,H,W,C]
        b, h, w, c = x_img.shape
        n = self.window * self.window
        hd = c // self.num_heads
        wqkv = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                          (c, 3 * c))
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3 * c,))
        wproj = self.param("proj_kernel", nn.initializers.lecun_normal(),
                           (c, c))
        bproj = self.param("proj_bias", nn.initializers.zeros, (c,))
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads))
        # gather-free Toeplitz construction (XLA gathers are pathologically
        # slow on this backend — ops/windows.py swin_bias_from_table)
        bias = W.swin_bias_from_table(table, self.window, self.window)

        if raw:  # fused-HAB path pulls the params out (models/hat.py HAB)
            return wqkv, bqkv, wproj, bproj, bias

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu" and self.window >= 8):
            from ..ops.pallas.wattn import fused_window_attention
            return fused_window_attention(
                x_img, wqkv, bqkv, wproj, bproj, bias,
                np.asarray(mask) if mask is not None else None,
                (self.window, self.window), self.num_heads)

        x = W.window_partition(x_img, self.window, self.window)  # [B*nW,N,C]
        bw = x.shape[0]
        qkv = (x @ wqkv + bqkv).reshape(bw, n, 3, self.num_heads, hd)
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bw, n, c).astype(x.dtype)
        out = out @ wproj + bproj
        return W.window_reverse(out, self.window, self.window, h, w)


class HAB(nn.Module):
    """Hybrid Attention Block: (S)W-MSA + 0.01-scaled CAB conv branch + MLP."""

    dim: int
    num_heads: int
    window: int
    shift: int
    compress: int
    squeeze: int
    conv_scale: float
    mlp_ratio: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        b, h, w, c = x.shape
        ln1_w, ln1_b = _LNParams(c, name="norm1")()
        ln2_w, ln2_b = _LNParams(c, name="norm2")()
        attn_mod = WindowAttention(c, self.window, self.num_heads,
                                   self.use_pallas, name="attn")
        mlp = Mlp(int(c * self.mlp_ratio), c, name="mlp")

        shortcut = x
        cab = CAB(c, self.compress, self.squeeze, name="conv_block")
        mask = (W.shift_attn_mask(h, w, self.window, self.window,
                                  self.shift, self.shift)
                if self.shift > 0 else None)

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu" and self.window >= 8
                and h % 2 == 0 and w % 2 == 0):
            # whole-block fused kernel (LN1+W-MSA+residuals+LN2+MLP).
            # Residuals commute with the shift roll, so shifted blocks run
            # entirely in rolled coordinates.
            import os
            if os.environ.get("FREQFUSION_CAB_KERNEL", "1") != "0":
                # CAB conv chain as a second Pallas kernel: the XLA-conv →
                # pallas boundary paid ~7 ms/HAB of transposing relayouts
                # at whole-image shapes (r4 HLO dump, ops/pallas/cab.py);
                # pallas→pallas composes free. The spatially-constant CA
                # gate rides the kernel's cab_scale operand.
                from ..ops.pallas.cab import cab_chain
                cw1, cb1, cw2, cb2, qw1, qb1, qw2, qb2 = cab(raw=True)
                # shifted blocks: the CAB branch's roll is folded into the
                # kernel's store (output block permutation + 2-slice write)
                cab_pre, sums = cab_chain(x, ln1_w, ln1_b, cw1, cb1,
                                          cw2, cb2, out_shift=self.shift)
                cab_rolled = self.shift > 0
                pooled = sums / (h * w)
                mid = jax.nn.relu(jnp.einsum(
                    "bxyc,cd->bxyd", pooled, qw1.reshape(c, -1)) + qb1)
                ca_scale = jax.nn.sigmoid(jnp.einsum(
                    "bxyc,cd->bxyd", mid, qw2.reshape(-1, c)) + qb2)
            else:
                # CAB in XLA (pre-r4 path): dense convs are MXU-bound but
                # the conv↔pallas relayouts dominate (PERF.md r4)
                cab_pre = cab(apply_ln(x, ln1_w, ln1_b))
                ca_scale = None
                cab_rolled = False
            wqkv, bqkv, wproj, bproj, bias = attn_mod(x, raw=True)
            k1, b1, k2, b2 = mlp(x, raw=True)
            from ..ops.pallas.wattn import fused_hab_block
            xs, cxs = shortcut, cab_pre
            # the X roll folds into the kernel's quadrant index maps when
            # the shift is a half-window (FREQFUSION_HAB_INSHIFT=0 restores
            # the XLA roll); the CAB roll is already folded into cab_chain's
            # store, leaving only the output un-roll in XLA
            import os
            in_shift = 0
            if self.shift > 0:
                if (self.shift * 2 == self.window
                        and os.environ.get("FREQFUSION_HAB_INSHIFT", "1")
                        != "0"):  # in-model A/B r5: HAT 714.9 -> 684.4 ms
                    in_shift = self.shift
                else:
                    xs = jnp.roll(xs, (-self.shift, -self.shift),
                                  axis=(1, 2))
                if not cab_rolled:
                    cxs = jnp.roll(cxs, (-self.shift, -self.shift),
                                   axis=(1, 2))
            out = fused_hab_block(
                xs, cxs, ln1_w, ln1_b, ln2_w, ln2_b, wqkv, bqkv, wproj,
                bproj, k1, b1, k2, b2, bias, mask,
                (self.window, self.window), self.num_heads, self.conv_scale,
                cab_scale=ca_scale, in_shift=in_shift)
            if self.shift > 0:
                out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
            return out

        x_ln = apply_ln(x, ln1_w, ln1_b)
        conv_x = cab(x_ln)
        shifted = (jnp.roll(x_ln, (-self.shift, -self.shift), axis=(1, 2))
                   if self.shift > 0 else x_ln)
        shifted = attn_mod(shifted, mask)
        attn_x = (jnp.roll(shifted, (self.shift, self.shift), axis=(1, 2))
                  if self.shift > 0 else shifted)

        x = shortcut + attn_x + conv_x * self.conv_scale
        return x + mlp(apply_ln(x, ln2_w, ln2_b))


class OCAB(nn.Module):
    """Overlapping cross-attention block: ws×ws queries attend to
    (ws+overlap)² keys/values gathered from overlapping windows."""

    dim: int
    window: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):  # [B,H,W,C]
        b, h, w, c = x.shape
        ws = self.window
        ows = int(ws * self.overlap_ratio) + ws
        hd = c // self.num_heads

        ln2_w, ln2_b = _LNParams(c, name="norm2")()
        mlp = Mlp(int(c * self.mlp_ratio), c, name="mlp")

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * c, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((ws + ows - 1) ** 2, self.num_heads))
        bias = W.oca_bias_from_table(table, ws, ows)  # [nh, ws², ows²]
        wproj = self.param("proj_kernel", nn.initializers.lecun_normal(),
                           (c, c))
        bproj = self.param("proj_bias", nn.initializers.zeros, (c,))

        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu"
                # half-window kv views are the kernel's sublane blocks →
                # ws/2 must sit on the 8-sublane grid (Mosaic constraint)
                and ws % 16 == 0 and ows - ws == ws // 2):
            from ..ops.pallas.wattn import (fused_overlap_attention,
                                            fused_residual_ln_mlp)
            x = fused_overlap_attention(q, k, v, wproj, bproj, bias,
                                        ws, ows - ws, self.num_heads)
            k1, b1, k2, b2 = mlp(x, raw=True)
            return fused_residual_ln_mlp(x, shortcut, ln2_w, ln2_b,
                                         k1, b1, k2, b2)
        else:
            qw = W.window_partition(q, ws, ws)  # [B*nW, ws², C]
            kw = W.extract_overlapping_windows(k, ws, ows - ws)
            vw = W.extract_overlapping_windows(v, ws, ows - ws)

            def heads(t):
                return jnp.transpose(
                    t.reshape(t.shape[0], t.shape[1], self.num_heads, hd),
                    (0, 2, 1, 3))

            attn = jnp.einsum("bhnd,bhmd->bhnm", heads(qw) * (hd ** -0.5),
                              heads(kw), preferred_element_type=jnp.float32)
            attn = attn + bias[None]
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads(vw),
                             preferred_element_type=jnp.float32)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, ws * ws, c)
            out = out.astype(x.dtype) @ wproj + bproj
            x = W.window_reverse(out, ws, ws, h, w)

        x = x + shortcut
        return x + mlp(apply_ln(x, ln2_w, ln2_b))


def scan_blocks_enabled() -> bool:
    """lax.scan over identical transformer blocks (FREQFUSION_SCAN=0 to
    unroll). One traced/compiled block body replaces N inlined copies —
    the 72 HAB call sites of HAT-L collapse to 2 — cutting fresh-process
    compile time an order of magnitude at identical math."""
    import os
    return os.environ.get("FREQFUSION_SCAN", "1") == "1"


def _scan_stack(body_module, carry, length: int):
    """nn.scan a single-arg module `length` times over `carry` (params gain
    a leading stack axis; converter: utils/convert.Stacked)."""
    scan = nn.scan(lambda mdl, c, _: (mdl(c), None),
                   variable_axes={"params": 0}, split_rngs={"params": True},
                   length=length)
    carry, _ = scan(body_module, carry, None)
    return carry


class _HABPair(nn.Module):
    """One (shift-0, shifted) HAB pair — the repeating unit of a RHAG."""

    dim: int
    num_heads: int
    window: int
    compress: int
    squeeze: int
    conv_scale: float
    mlp_ratio: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for b, shift in ((0, 0), (1, self.window // 2)):
            x = HAB(self.dim, self.num_heads, self.window, shift,
                    self.compress, self.squeeze, self.conv_scale,
                    self.mlp_ratio, self.use_pallas, name=f"blk{b}")(x)
        return x


class RHAG(nn.Module):
    """Residual Hybrid Attention Group: depth × HAB + OCAB + 3×3 conv + skip.

    Even depths scan over (shift-0, shifted) HAB pairs (param subtree
    'pairs' with a leading depth/2 axis) instead of unrolling."""

    dim: int
    depth: int
    num_heads: int
    window: int
    compress: int
    squeeze: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        if self.depth % 2 == 0 and self.depth >= 2 and scan_blocks_enabled():
            pair = _HABPair(self.dim, self.num_heads, self.window,
                            self.compress, self.squeeze, self.conv_scale,
                            self.mlp_ratio, self.use_pallas, name="pairs")
            x = _scan_stack(pair, x, self.depth // 2)
        else:
            for i in range(self.depth):
                x = HAB(self.dim, self.num_heads, self.window,
                        0 if i % 2 == 0 else self.window // 2,
                        self.compress, self.squeeze, self.conv_scale,
                        self.mlp_ratio, self.use_pallas, name=f"blocks_{i}")(x)
        x = OCAB(self.dim, self.window, self.overlap_ratio, self.num_heads,
                 self.mlp_ratio, self.use_pallas, name="overlap_attn")(x)
        x = SeamConv(self.dim, self.use_pallas, name="conv")(x)
        return res + x


class HAT(nn.Module):
    """The full HAT ×4 SR model. `__call__(lr [B,H,W,3])` →
    (sr [B,4H,4W,3], deep_features [B,H,W,embed_dim]).

    H and W must be multiples of `window` (pad upstream, as the reference's
    expert loader does with pad_to_window_size, expert_loader.py:63-91).
    """

    upscale: int = 4
    embed_dim: int = 180
    depths: Sequence[int] = (6,) * 12
    num_heads: Sequence[int] = (6,) * 12
    window: int = 16
    compress: int = 3
    squeeze: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
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
        feat = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        uniform = (len(set(self.depths)) == 1
                   and len(set(self.num_heads)) == 1)
        if uniform and len(self.depths) > 1 and scan_blocks_enabled():
            # all RHAGs identical → scan (param subtree 'layers' with a
            # leading n-groups axis; torch keys remap in convert.hat_key_fn)
            group = RHAG(self.embed_dim, self.depths[0], self.num_heads[0],
                         self.window, self.compress, self.squeeze,
                         self.conv_scale, self.overlap_ratio, self.mlp_ratio,
                         self.use_pallas, name="layers")
            feat = _scan_stack(group, feat, len(self.depths))
        else:
            for i, d in enumerate(self.depths):
                feat = RHAG(self.embed_dim, d, self.num_heads[i], self.window,
                            self.compress, self.squeeze, self.conv_scale,
                            self.overlap_ratio, self.mlp_ratio,
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
