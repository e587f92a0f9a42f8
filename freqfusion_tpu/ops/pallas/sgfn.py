"""Fused DATB tail: residual + LN2 + SGFN in one Pallas kernel.

Every DAT block ends with `x = y + SGFN(LN2(y))` where y = x + attn(LN1(x))
and SGFN = fc1 → GELU → split → LayerNorm → 3×3 depthwise → gate → fc2
(models/dat.py SGFN; reference dat_arch.py SGFN). At 192²/batch-2 this tail
is ~2.5 ms of XLA conv-to-conv HBM round trips per block × 36 blocks.

The kernel keeps a row strip resident in VMEM through the whole chain. The
3×3 depthwise needs ±1 halo rows; everything before it is pointwise, so the
halo rows are *recomputed* from single-row side blocks of (attn, shortcut)
with clamped index maps — boundary halo rows of the conv input are zeroed to
keep SAME-padding semantics (the same scheme as ops/pallas/nafblock.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wattn import MOSAIC_PARAMS, _gelu_exact, _ln, _mxu_dtype


def _kernel(a_ref, x_ref, at_ref, xt_ref, ab_ref, xb_ref,
            lnw_ref, lnb_ref, w1_ref, b1_ref, sgw_ref, sgb_ref,
            wdw_ref, bdw_ref, w2_ref, b2_ref, o_ref,
            *, bh: int, nblocks: int, mdt):
    i = pl.program_id(1)
    wp = a_ref.shape[2]          # W + 2 (inputs are W-padded by the caller)
    w = wp - 2
    c = a_ref.shape[3]
    hid = w1_ref.shape[1]
    half = hid // 2
    dt = mdt                     # MXU operand dtype (wattn._mxu_dtype)

    # row assembly concatenates along the outer dim only (sublane/lane-dim
    # concats miscompile on this Mosaic build at sub-128 lane widths)
    ya = jnp.concatenate([at_ref[0].astype(jnp.float32),
                          a_ref[0].astype(jnp.float32),
                          ab_ref[0].astype(jnp.float32)], axis=0)
    yx = jnp.concatenate([xt_ref[0].astype(jnp.float32),
                          x_ref[0].astype(jnp.float32),
                          xb_ref[0].astype(jnp.float32)], axis=0)
    y = (ya + yx).reshape((bh + 2) * wp, c)

    l = _ln(y, lnw_ref[0], lnb_ref[0]).astype(dt)
    h = jnp.dot(l, w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_exact(h + b1_ref[0])
    x1 = h[:, :half]
    x2 = _ln(h[:, half:], sgw_ref[0], sgb_ref[0]).reshape(bh + 2, wp, half)

    # zero the halo rows/cols of the conv input (SAME zero padding);
    # separable [R,1,1]/[1,W,1] masks stay tiny after lane padding
    top_live = (i > 0).astype(jnp.float32)
    bot_live = (i < nblocks - 1).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    rlive = (jnp.where(rows == 0, top_live, 1.0)
             * jnp.where(rows == bh + 1, bot_live, 1.0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    clive = ((cols >= 1) & (cols <= w)).astype(jnp.float32)
    x2 = x2 * rlive * clive

    acc = jnp.zeros((bh, w, half), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            acc = acc + x2[dr:dr + bh, dc:dc + w, :] * wdw_ref[dr * 3 + dc]
    acc = acc + bdw_ref[0]

    x1c = x1.reshape(bh + 2, wp, half)[1:bh + 1, 1:w + 1].reshape(
        bh * w, half)
    gated = (x1c * acc.reshape(bh * w, half)).astype(dt)
    out = jnp.dot(gated, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[0]
    yc = y.reshape(bh + 2, wp, c)[1:bh + 1, 1:w + 1].reshape(bh * w, c)
    o_ref[0] = (yc + out).reshape(bh, w, c).astype(o_ref.dtype)


def fused_sgfn_tail(a, shortcut, ln_w, ln_b, w1, b1, sg_w, sg_b,
                    wdw, bdw, w2, b2, interpret: bool = False,
                    mxu_dtype=None):
    """y = a + shortcut; returns y + SGFN(LN(y)) over [B,H,W,C] images.

    wdw is the depthwise (3,3,1,hidden/2) HWIO kernel from nn.Conv.
    """
    b, h, w, c = a.shape
    mdt = _mxu_dtype(a.dtype, interpret, mxu_dtype)
    w1, w2 = w1.astype(mdt), w2.astype(mdt)
    hid = w1.shape[-1]
    half = hid // 2
    ap = jnp.pad(a, [(0, 0), (0, 0), (1, 1), (0, 0)])
    sp = jnp.pad(shortcut, [(0, 0), (0, 0), (1, 1), (0, 0)])
    wp = w + 2

    from .nafblock import _pick_bh
    # strips hold ya+yx [2c] + h [hid] + x2/acc [2·hid/2] + out [c] in f32
    bh = _pick_bh(h, wp, (c, c, hid, half, half, c))
    nb = h // bh
    grid = (b, nb)

    f32 = lambda t: t.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    vec = lambda m: pl.BlockSpec((1, m), const(0, 0), memory_space=pltpu.VMEM)
    img_in = pl.BlockSpec((1, bh, wp, c), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, bh, w, c), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    row_t = pl.BlockSpec((1, 1, wp, c),
                         lambda bi, i: (bi, jnp.maximum(i * bh - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM)
    row_b = pl.BlockSpec((1, 1, wp, c),
                         lambda bi, i: (bi, jnp.minimum(i * bh + bh, h - 1),
                                        0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        img_in, img_in, row_t, row_t, row_b, row_b,
        vec(c), vec(c),
        pl.BlockSpec((c, hid), const(0, 0), memory_space=pltpu.VMEM),
        vec(hid),
        vec(half), vec(half),
        pl.BlockSpec((9, half), const(0, 0), memory_space=pltpu.VMEM),
        vec(half),
        pl.BlockSpec((half, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c),
    ]
    kernel = functools.partial(_kernel, bh=bh, nblocks=nb, mdt=mdt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * hid * 3 // 2 + 18 * b * h * w * half,
            bytes_accessed=3 * a.size * a.dtype.itemsize,
            transcendentals=b * h * w * hid),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(ap, sp, ap, sp, ap, sp,
      f32(ln_w).reshape(1, -1), f32(ln_b).reshape(1, -1),
      w1, f32(b1).reshape(1, -1),
      f32(sg_w).reshape(1, -1), f32(sg_b).reshape(1, -1),
      wdw.reshape(9, half).astype(jnp.float32), f32(bdw).reshape(1, -1),
      w2, f32(b2).reshape(1, -1))
