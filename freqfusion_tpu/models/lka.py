"""Large Kernel Attention stack, TPU-native.

Re-design of /root/reference/src/models/large_kernel_attention.py: the 21×21
receptive field decomposed as 5×5 DW → 1×21 DW → 21×1 DW → 1×1 PW → BN →
sigmoid gate, the LKABlock residual wrapper, and the two drop-in fusion
modules (cross-band and collaborative attention with LKA refinement).

The decomposed conv chain is the framework's prime Pallas-fusion candidate
(see ops/pallas/lka.py); this module is the XLA reference implementation and
the training path.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .layers import _LNParams, apply_ln
from .layers import BatchNorm2d, TorchMHA, gelu


class _Kern(nn.Module):
    """A bare conv kernel param (HWIO) — shared by the XLA and Pallas paths."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"), self.shape)


class LargeKernelAttention(nn.Module):
    """Decomposed large-kernel spatial gate (all depthwise but the 1×1).

    With `use_pallas=True` the eval path runs the fused VMEM-resident kernel
    (ops/pallas/lka.py); training and non-TPU backends use the identical-math
    XLA chain.
    """

    dim: int
    kernel_size: int = 21
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, k = self.dim, self.kernel_size
        w5 = _Kern((5, 5, 1, d), name="local_conv")()
        wh = _Kern((1, k, 1, d), name="h_conv")()
        wv = _Kern((k, 1, 1, d), name="v_conv")()
        wp = _Kern((1, 1, d, d), name="pw_conv")()
        bn = BatchNorm2d(d, name="bn")

        # the fused kernel wins only at full 128-lane channel counts
        # (measured on v5e: 2.5× at C=128; lane padding loses at C=64)
        if (self.use_pallas and not train and not self.is_initializing()
                and d % 128 == 0 and jax.default_backend() == "tpu"):
            from ..ops.pallas.lka import lka_gate
            scale, shift = bn.affine()
            return lka_gate(x, w5.reshape(5, 5, d), wh.reshape(k, d),
                            wv.reshape(k, d), wp.reshape(d, d), scale, shift)

        # C=64 (the eval cross-band path at 9·B batch): pack batch PAIRS
        # into the channel dim — depthwise convs are per-channel, the 1×1
        # becomes block-diagonal, BN affine tiles — math-identical, and the
        # kernel gets its full 128 lanes.
        if (self.use_pallas and not train and not self.is_initializing()
                and 2 * d % 128 == 0 and x.shape[0] % 2 == 0
                and jax.default_backend() == "tpu"):
            from ..ops.pallas.lka import lka_gate
            scale, shift = bn.affine()
            n, h, w_, _ = x.shape
            x2 = jnp.transpose(x.reshape(n // 2, 2, h, w_, d),
                               (0, 2, 3, 1, 4)).reshape(n // 2, h, w_, 2 * d)
            w5r = jnp.tile(w5.reshape(5, 5, d), (1, 1, 2))
            whr = jnp.tile(wh.reshape(k, d), (1, 2))
            wvr = jnp.tile(wv.reshape(k, d), (1, 2))
            wpr = wp.reshape(d, d)
            z = jnp.zeros_like(wpr)
            wpp = jnp.concatenate(
                [jnp.concatenate([wpr, z], axis=1),
                 jnp.concatenate([z, wpr], axis=1)], axis=0)
            y = lka_gate(x2, w5r, whr, wvr, wpp,
                         jnp.tile(scale, 2), jnp.tile(shift, 2))
            return jnp.transpose(y.reshape(n // 2, h, w_, 2, d),
                                 (0, 3, 1, 2, 4)).reshape(n, h, w_, d)

        def dw(t, kern, kh, kw):
            return jax.lax.conv_general_dilated(
                t, kern.astype(t.dtype), (1, 1),
                [(kh // 2, kh // 2), (kw // 2, kw // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=d)

        attn = dw(x, w5, 5, 5)
        attn = dw(attn, wh, 1, k)
        attn = dw(attn, wv, k, 1)
        attn = jax.lax.conv_general_dilated(
            attn, wp.astype(attn.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        attn = bn(attn, train)
        return x * jax.nn.sigmoid(attn)


class LKABlock(nn.Module):
    """BN → LKA → +0.1·residual, BN → FFN(2×) → +0.1·residual."""

    dim: int
    kernel_size: int = 21
    ffn_ratio: float = 2.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = self.param("scale1", lambda k, s: jnp.asarray(0.1), ())
        s2 = self.param("scale2", lambda k, s: jnp.asarray(0.1), ())
        h = BatchNorm2d(self.dim, name="norm1")(x, train)
        x = x + s1 * LargeKernelAttention(self.dim, self.kernel_size,
                                          use_pallas=self.use_pallas,
                                          name="lka")(h, train)
        h = BatchNorm2d(self.dim, name="norm2")(x, train)
        ffn_dim = int(self.dim * self.ffn_ratio)
        h = nn.Conv(ffn_dim, (1, 1), name="ffn_fc1")(h)
        h = nn.Conv(self.dim, (1, 1), name="ffn_fc2")(gelu(h))
        return x + s2 * h


class EnhancedCrossBandWithLKA(nn.Module):
    """Cross-band per-pixel MHA + shared LKA refinement per band.

    forward(list of [B,H,W,3] × num_bands) → same shapes. The per-pixel MHA
    treats bands as tokens: [B,H,W,bands,dim].
    """

    dim: int = 64
    num_bands: int = 9
    num_heads: int = 4
    lka_kernel: int = 21
    use_pallas: bool = False

    @nn.compact
    def __call__(self, bands: Sequence[jnp.ndarray], train: bool = False):
        band_proj = nn.Conv(self.dim, (1, 1), name="band_proj")
        projected = jnp.stack([band_proj(b) for b in bands], axis=-2)
        # [B,H,W,bands,dim]
        mha = TorchMHA(self.dim, self.num_heads, name="band_attention")
        ln_w, ln_b = _LNParams(self.dim, name="norm")()
        if (self.use_pallas and not train and not self.is_initializing()
                and jax.default_backend() == "tpu"):
            # per-pixel band MHA is ~20× its flop cost in XLA (layout-bound
            # [...,9,16] batched matmuls) — one fused lane-parallel kernel
            from ..ops.pallas.bandmha import fused_band_mha
            in_w, in_b, ow, ob = mha(projected, raw=True)
            attn = fused_band_mha(projected, in_w, in_b, ow, ob,
                                  ln_w, ln_b, self.num_heads)
        else:
            normed = apply_ln(projected, ln_w, ln_b)
            attn = mha(normed, train) + projected

        lka_block = LKABlock(self.dim, self.lka_kernel,
                             use_pallas=self.use_pallas, name="lka_block")
        out_proj = nn.Conv(3, (1, 1), name="out_proj")
        if not train:
            # eval: fold bands into the batch — one LKA/out_proj call at 9×
            # the batch instead of 9 sequential C-dim calls (identical math:
            # BN is a fixed affine in eval; weights are shared across bands)
            b, h, w, nb, d = attn.shape
            flat = jnp.transpose(attn, (3, 0, 1, 2, 4)).reshape(nb * b, h, w, d)
            feats = out_proj(lka_block(flat, train))
            feats = feats.reshape(nb, b, h, w, 3)
            return [feats[i] + band for i, band in enumerate(bands)]
        outs = []
        for i, band in enumerate(bands):
            feat = lka_block(attn[..., i, :], train)
            outs.append(out_proj(feat) + band)
        return outs


class EnhancedCollaborativeWithLKA(nn.Module):
    """Cross-expert per-pixel MHA + FFN + shared LKA + per-expert global
    modulation of the SR outputs: out · (1 + 0.2·(σ−0.5)), clamped."""

    num_experts: int = 3
    feature_dim: int = 128
    num_heads: int = 8
    lka_kernel: int = 21
    use_pallas: bool = False
    expert_channels: Dict[str, int] = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, expert_features: Dict[str, jnp.ndarray],
                 expert_outputs: List[jnp.ndarray], train: bool = False):
        names = ["hat", "dat", "nafnet"][: self.num_experts]
        chans = self.expert_channels or {"hat": 180, "dat": 180, "nafnet": 64}

        aligned = []
        min_h = min(expert_features[n].shape[1] for n in names)
        min_w = min(expert_features[n].shape[2] for n in names)
        for n in names:
            feat = expert_features[n]
            expected = chans[n]
            actual = feat.shape[-1]
            if actual > expected:  # truncate / zero-pad channel mismatch
                feat = feat[..., :expected]
            elif actual < expected:
                feat = jnp.pad(feat, [(0, 0)] * 3 + [(0, expected - actual)])
            a = nn.Conv(self.feature_dim, (1, 1), name=f"align_{n}")(feat)
            if a.shape[1] != min_h or a.shape[2] != min_w:
                a = resize(a, min_h, min_w, "bilinear")
            aligned.append(a)

        stacked = jnp.stack(aligned, axis=-2)  # [B,H,W,E,C]
        normed = nn.LayerNorm(epsilon=1e-5, name="norm1")(stacked)
        attn = TorchMHA(self.feature_dim, self.num_heads, name="cross_attn")(
            normed, train)
        stacked = stacked + attn
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(stacked)
        h = nn.Dense(self.feature_dim * 2, name="ffn_fc1")(h)
        h = nn.Dense(self.feature_dim, name="ffn_fc2")(gelu(h))
        stacked = stacked + h

        lka = LKABlock(self.feature_dim, self.lka_kernel,
                       use_pallas=self.use_pallas, name="lka_global")
        if not train:
            # eval: one batched LKA over the expert dim (BN is a fixed
            # affine in eval, weights shared → identical math, 3× batch)
            b, h, w, e, d = stacked.shape
            flat = jnp.transpose(stacked, (3, 0, 1, 2, 4)).reshape(e * b, h, w, d)
            lka_all = lka(flat, train).reshape(e, b, h, w, d)
            feats = [lka_all[i] for i in range(e)]
        else:
            feats = [lka(stacked[..., i, :], train)
                     for i in range(len(expert_outputs))]
        h_sr, w_sr = expert_outputs[0].shape[1], expert_outputs[0].shape[2]
        outs = []
        for i, out in enumerate(expert_outputs):
            feat = feats[i]
            feat_hr = resize(feat, h_sr, w_sr, "bilinear")
            m = nn.Conv(self.feature_dim // 4, (1, 1), name=f"mod_{i}_fc1")(feat_hr)
            m = jnp.mean(gelu(m), axis=(1, 2), keepdims=True)
            m = jax.nn.sigmoid(nn.Conv(3, (1, 1), name=f"mod_{i}_fc2")(m))
            outs.append(jnp.clip(out * (1.0 + 0.2 * (m - 0.5)), 0.0, 1.0))
        return outs
