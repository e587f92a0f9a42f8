"""Fused Large-Kernel-Attention kernel (Pallas, TPU).

The LKA gate (models/lka.py; reference large_kernel_attention.py:38-105) is
a chain of three depthwise convs (5×5, 1×21, 21×1) + a 1×1 pointwise matmul
+ BN affine + sigmoid, finally multiplied into the input. XLA materializes
each depthwise result in HBM; this kernel keeps the whole chain VMEM-resident
per spatial block:

  grid over (batch, H-blocks): each program DMAs its input block plus a
  12-pixel halo (2 for the 5×5 + 10 for the 21-taps) from HBM into VMEM
  scratch, runs the three depthwise convs as shifted multiply-accumulates on
  the VPU, the 1×1 as one [bh·W, C]×[C, C] MXU matmul, applies the folded BN
  affine + sigmoid, and writes gate·x — one HBM read + one HBM write for the
  whole chain instead of four round-trips.

Interface: `lka_gate(x, w5, wh, wv, wp, scale, shift)` on NHWC
- x     [B, H, W, C]
- w5    [5, 5, C]   depthwise 5×5 taps
- wh    [21, C]     depthwise 1×21 taps (along W)
- wv    [21, C]     depthwise 21×1 taps (along H)
- wp    [C, C]      pointwise mixing (y = h @ wp)
- scale/shift [C]   folded BN affine (γ/√(σ²+ε), β − μ·γ/√(σ²+ε))

`lka_gate_reference` is the identical-math XLA fallback used for training
and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wattn import MOSAIC_PARAMS, _mxu_dtype

K = 21
PAD_L = K // 2          # 10, for the two large 1-D convs
PAD_S = 2               # for the 5×5
HALO = PAD_L + PAD_S    # 12


def _kernel(x_hbm, w5_ref, wh_ref, wv_ref, wp_ref, ab_ref, out_ref,
            *, bh: int, w: int, c: int, h_true: int, mdt):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    hin = bh + 2 * HALO
    win = w + 2 * HALO

    def body(xb, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(hi * bh, hin), :, :], xb, sem)
        dma.start()
        dma.wait()
        x = xb[...]

        # 5×5 depthwise (valid over the halo'd block)
        h5 = bh + 2 * PAD_L
        w5o = w + 2 * PAD_L
        acc = jnp.zeros((h5, w5o, c), jnp.float32)
        for dy in range(5):
            for dx in range(5):
                acc += x[dy:dy + h5, dx:dx + w5o, :] * w5_ref[dy, dx, :]

        # zero outputs outside the image: the chain's per-stage 'same' zero
        # padding means conv5 values beyond the border are 0 before the 1-D
        # convs run (torch semantics, large_kernel_attention.py:92-96)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (h5, w5o, c), 0)
                + hi * bh - PAD_L)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h5, w5o, c), 1) - PAD_L
        valid = ((rows >= 0) & (rows < h_true) & (cols >= 0) & (cols < w))
        acc = jnp.where(valid, acc, 0.0)

        # 1×21 depthwise along W
        acc2 = jnp.zeros((h5, w, c), jnp.float32)
        for dx in range(K):
            acc2 += acc[:, dx:dx + w, :] * wh_ref[dx, :]

        # 21×1 depthwise along H
        acc3 = jnp.zeros((bh, w, c), jnp.float32)
        for dy in range(K):
            acc3 += acc2[dy:dy + bh, :, :] * wv_ref[dy, :]

        # 1×1 pointwise on the MXU + folded BN + sigmoid gate
        # (operands in the MXU dtype — wattn._mxu_dtype)
        mixed = jnp.dot(acc3.reshape(bh * w, c).astype(mdt), wp_ref[...],
                        preferred_element_type=jnp.float32)
        gate = jax.nn.sigmoid(mixed * ab_ref[0, :] + ab_ref[1, :])
        center = x[HALO:HALO + bh, HALO:HALO + w, :].reshape(bh * w, c)
        out_ref[0] = (center * gate).reshape(bh, w, c).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((hin, win, c), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def lka_gate(x, w5, wh, wv, wp, scale, shift, block_h: int = 0,
             interpret: bool = False):
    """Fused LKA gate. x [B,H,W,C] → gated [B,H,W,C] (zero 'same' padding).

    The channel (lane) dim is zero-padded to a multiple of 128 — this Mosaic
    build requires full lanes for the halo-DMA pattern; padded lanes compute
    zeros and are sliced away.
    """
    b, h, w, c = x.shape
    cp = -(-c // 128) * 128
    if block_h <= 0:
        # keep the kernel's live VMEM (input + the three conv accumulators)
        # comfortably under the 16 MB budget
        block_h = max(8, (16 * 128) // cp)
    if cp != c:
        pc = cp - c
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, pc)])
        w5 = jnp.pad(w5, [(0, 0), (0, 0), (0, pc)])
        wh = jnp.pad(wh, [(0, 0), (0, pc)])
        wv = jnp.pad(wv, [(0, 0), (0, pc)])
        wp = jnp.pad(wp, [(0, pc), (0, pc)])
        scale = jnp.pad(scale, (0, pc))
        shift = jnp.pad(shift, (0, pc))
        out = lka_gate(x, w5, wh, wv, wp, scale, shift,
                       block_h=block_h, interpret=interpret)
        return out[..., :c]
    ph = (block_h - h % block_h) % block_h
    xp = jnp.pad(x.astype(jnp.float32),
                 [(0, 0), (HALO, HALO + ph), (HALO, HALO), (0, 0)])
    n_blocks = (h + ph) // block_h
    ab = jnp.stack([scale, shift]).astype(jnp.float32)  # [2, C]

    mdt = _mxu_dtype(jnp.float32, interpret)
    kernel = functools.partial(_kernel, bh=block_h, w=w, c=c, h_true=h,
                               mdt=mdt)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM, DMA'd
            pl.BlockSpec((5, 5, c), lambda bi, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_h, w, c),
                               lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h + ph, w, c), x.dtype),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(xp, w5.astype(jnp.float32), wh.astype(jnp.float32),
      wv.astype(jnp.float32), wp.astype(mdt), ab)
    return out[:, :h]


def lka_gate_reference(x, w5, wh, wv, wp, scale, shift):
    """XLA reference implementation (identical math) for testing/fallback."""
    c = x.shape[-1]

    def dw(t, kern, kh, kw):
        k = kern.reshape(kh, kw, 1, c)
        return jax.lax.conv_general_dilated(
            t, k, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    a = dw(x, w5, 5, 5)
    a = dw(a, wh.reshape(1, K, c), 1, K)
    a = dw(a, wv.reshape(K, 1, c), K, 1)
    mixed = jnp.einsum("bhwc,cd->bhwd", a, wp,
                       precision=jax.lax.Precision.HIGHEST)
    gate = jax.nn.sigmoid(mixed * scale + shift)
    return x * gate
