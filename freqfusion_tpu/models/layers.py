"""Shared small layers for the trainable fusion head (NHWC flax).

Includes a torch-compatible packed-QKV multi-head attention
(`TorchMHA`, converts from `nn.MultiheadAttention`'s
in_proj_weight/out_proj layout) and a trainable `BatchNorm2d` that carries
running statistics in the `batch_stats` collection (used by fusion-head
modules that the reference trains; the frozen experts use the eval-only
affine in models/dat.py instead).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype


class SeamConv(nn.Module):
    """3×3 SAME conv that sits *between* Mosaic kernels (HAT/DAT
    group-ending convs, conv_after_body). A lone XLA conv at a pallas
    boundary pays transposing relayouts on both sides — measured 10.09 ms
    for kernel→conv→kernel vs 8.26 with the conv as a Pallas strip kernel
    at the whole-image bench shape (scripts/probe_seams.py, PERF.md r4) —
    so on TPU this runs ops/pallas/cab.conv3x3_dense, keeping the chain
    pallas→pallas. Param tree matches nn.Conv ({kernel, bias}); numerics
    off-TPU are nn.Conv's exactly (same promote_dtype + lax conv).
    Reference: the lone convs in hat_arch.py (RHAG) / dat_arch.py (resi).
    FREQFUSION_SEAM_KERNEL=0 restores the XLA conv everywhere."""

    features: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        if (self.use_pallas and not self.is_initializing()
                and jax.default_backend() == "tpu"
                and os.environ.get("FREQFUSION_SEAM_KERNEL", "1") != "0"):
            from ..ops.pallas.cab import conv3x3_dense
            return conv3x3_dense(x, kernel, bias)
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class BatchNorm2d(nn.Module):
    """BatchNorm over (B,H,W) of NHWC with running stats (torch semantics:
    eps 1e-5, momentum 0.1, unbiased running variance).

    Params are explicit (scale/bias in `params`, mean/var in `batch_stats`)
    so `affine()` can hand the folded eval-mode (scale, shift) pair to fused
    Pallas kernels.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    def setup(self):
        f = self.features
        self.scale = self.param("scale", nn.initializers.ones, (f,))
        self.offset = self.param("bias", nn.initializers.zeros, (f,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros(f, jnp.float32))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones(f, jnp.float32))

    def __call__(self, x, train: bool = False):
        if train:
            axes = tuple(range(x.ndim - 1))
            bm = jnp.mean(x, axis=axes)
            bv = jnp.var(x, axis=axes)
            if not self.is_initializing():
                n = x.size // x.shape[-1]
                unbiased = bv * n / max(n - 1, 1)
                m = self.momentum
                self.mean.value = (1 - m) * self.mean.value + m * bm
                self.var.value = (1 - m) * self.var.value + m * unbiased
            mean, var = bm, bv
        else:
            mean, var = self.mean.value, self.var.value
        inv = jax.lax.rsqrt(var + self.eps) * self.scale
        return x * inv + (self.offset - mean * inv)

    def affine(self):
        """Folded eval-mode (scale, shift): y = x·scale + shift."""
        inv = jax.lax.rsqrt(self.var.value + self.eps) * self.scale
        return inv, self.offset - self.mean.value * inv


class _DenseParams(nn.Module):
    """Raw kernel/bias with nn.Dense-compatible names/init, so fused Pallas
    paths consume the same checkpoint tree as the XLA chain. The single
    canonical raw-param helper (hat/dat/lka re-use it from here)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """Raw scale/bias with nn.LayerNorm-compatible names/init; apply with
    `apply_ln` (nn.LayerNorm's fast-variance math)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self):
        w = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


def apply_ln(x, w, b, eps=1e-5):
    """nn.LayerNorm default math (fast variance) on the last axis."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - jnp.square(mean))
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


class TorchMHA(nn.Module):
    """nn.MultiheadAttention equivalent (batch_first, packed in_proj).

    Input [..., N, E]; self-attention over the N axis. Dropout on attention
    probabilities like torch (rate applied only when train=True).
    `attn_mask` is torch's additive float mask ([N, N], e.g. causal -inf
    upper triangle), added to the logits before softmax.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, raw: bool = False,
                 attn_mask=None):
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (e, 3 * e))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        if raw:  # fused-kernel paths pull the params out (ops/pallas/bandmha)
            ow = _DenseParams(e, e, name="out_proj")()
            return in_w, in_b, ow[0], ow[1]
        qkv = x @ in_w + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return jnp.moveaxis(t.reshape(*t.shape[:-1], h, hd), -2, -3)

        q, k, v = heads(q), heads(k), heads(v)  # [..., h, N, hd]
        attn = jnp.einsum("...nd,...md->...nm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if attn_mask is not None:
            attn = attn + attn_mask.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("...nm,...md->...nd", attn, v,
                         preferred_element_type=jnp.float32)
        # cast the f32 accumulation back to the input dtype — a f32 operand
        # would promote the bf16-param out_proj matmul (and everything
        # downstream) to f32
        out = jnp.moveaxis(out, -3, -2).reshape(*x.shape[:-1], e).astype(x.dtype)
        return nn.Dense(e, name="out_proj")(out)


class SEChannelAttention(nn.Module):
    """SE-style channel attention with avg+max pooling (fusion_network.py:47-93)."""

    features: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        hidden = max(self.features // self.reduction, 8)
        fc1 = nn.Conv(hidden, (1, 1), use_bias=False, name="fc1")
        fc2 = nn.Conv(self.features, (1, 1), use_bias=False, name="fc2")

        def mlp(t):
            return fc2(jax.nn.relu(fc1(t)))

        avg = mlp(jnp.mean(x, axis=(1, 2), keepdims=True))
        mx = mlp(jnp.max(x, axis=(1, 2), keepdims=True))
        return x * jax.nn.sigmoid(avg + mx)


class CBAMSpatialAttention(nn.Module):
    """CBAM spatial attention: [avg‖max over C] → k×k conv → sigmoid gate."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        att = nn.Conv(1, (self.kernel_size, self.kernel_size), use_bias=False,
                      name="conv")(jnp.concatenate([avg, mx], axis=-1))
        return x * jax.nn.sigmoid(att)


class ChannelSpatialAttention(nn.Module):
    features: int
    reduction: int = 4
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        x = SEChannelAttention(self.features, self.reduction,
                               name="channel_attention")(x)
        return CBAMSpatialAttention(self.kernel_size, name="spatial_attention")(x)


def conv3x3_seam(t, w, b, active: bool):
    """3×3 SAME conv on raw HWIO params; the Pallas strip kernel when
    `active` (TPU eval path — callers pass `use_pallas and not train and
    not self.is_initializing()`). XLA lowers small-channel HR convs at
    C/128 lane utilization (probe_nafglue r5: 3→64 intro 35.5 ms, 64→3
    ending 32.9 ms vs <1 ms of real MXU work); the strip kernel touches
    only the real channels. FREQFUSION_HEAD_SEAM=0 restores XLA."""
    if (active and jax.default_backend() == "tpu"
            # default OFF: the r5 in-model A/B REGRESSED the head (+37 ms
            # hierarchical, edge 94->140) — unlike the standalone probes,
            # XLA fuses these convs with their elementwise neighbours and
            # the pallas boundary breaks that (same lesson as the HAT/DAT
            # conv_first/conv_last revert)
            and os.environ.get("FREQFUSION_HEAD_SEAM", "0") == "1"):
        from ..ops.pallas.cab import conv3x3_dense
        bb = (b if b is not None
              else jnp.zeros((w.shape[-1],), jnp.float32))
        return conv3x3_dense(t, w.astype(t.dtype), bb)
    o = jax.lax.conv_general_dilated(
        t, w.astype(t.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o if b is None else o + b
