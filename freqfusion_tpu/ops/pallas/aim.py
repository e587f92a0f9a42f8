"""Fused AIM (Adaptive Interaction Module) kernels for DAT.

Every DAT block glues its attention branch to a depthwise-conv branch with
two interaction gates and an output projection (dat_arch.py:347-666):

  conv_x = GELU(BN(dwconv3×3(v)))
  C-Map  = fc2(GELU(BN(fc1(GAP(·)))))     (channel gate, pooled)
  S-Map  = fc2(GELU(BN(fc1(·))))          (spatial gate, per-pixel)
  out    = proj(attened ⊙ σ(gate₁) + conv_x ⊙ σ(gate₂))

In XLA that is ~8 conv-to-conv HBM round trips per block × 36 blocks. Two
kernels fuse it:

  A (halo): dwconv + folded-BN affine + exact GELU → conv_x, Σconv_x
     (the same single-row clamped side-block scheme as ops/pallas/nafblock)
  B (pointwise): the S-Map 1×1 chain, both sigmoid gates, the sum, and the
     output projection — one read of (attened, conv_x), one write.

The C-Map MLP runs in XLA on the pooled [B,1,1,C] vector between the two.
The spatial/channel block variants wire the gates to different sources
(see models/dat.py); kernel B takes them explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nafblock import _pick_bh
from .wattn import MOSAIC_PARAMS, _gelu_exact, _mxu_dtype


def _kernel_a(x_ref, xt_ref, xb_ref, wdw_ref, bdw_ref, bns_ref, bnb_ref,
              cx_ref, sum_ref, *, bh: int, nblocks: int):
    i = pl.program_id(1)
    wp = x_ref.shape[2]
    w = wp - 2
    c = x_ref.shape[3]

    xa = jnp.concatenate([xt_ref[0].astype(jnp.float32),
                         x_ref[0].astype(jnp.float32),
                         xb_ref[0].astype(jnp.float32)], axis=0)
    # SAME zero padding: mask out-of-image halo rows/cols of the conv input
    top_live = (i > 0).astype(jnp.float32)
    bot_live = (i < nblocks - 1).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    rlive = (jnp.where(rows == 0, top_live, 1.0)
             * jnp.where(rows == bh + 1, bot_live, 1.0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    clive = ((cols >= 1) & (cols <= w)).astype(jnp.float32)
    xa = xa * rlive * clive

    acc = jnp.zeros((bh, w, c), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            acc = acc + xa[dr:dr + bh, dc:dc + w, :] * wdw_ref[dr * 3 + dc]
    acc = acc + bdw_ref[0]
    cx = _gelu_exact(acc * bns_ref[0] + bnb_ref[0])
    cx_ref[0] = cx.astype(cx_ref.dtype)

    part = jnp.sum(cx, axis=(0, 1), keepdims=True)

    @pl.when(i == 0)
    def _init():
        sum_ref[0] = part.astype(sum_ref.dtype)

    @pl.when(i > 0)
    def _acc():
        sum_ref[0] = sum_ref[0] + part.astype(sum_ref.dtype)


def aim_conv_branch(v, wdw, bdw, bn_scale, bn_shift,
                    interpret: bool = False):
    """v [B,H,W,C] → (conv_x [B,H,W,C], sums [B,1,1,C]).

    wdw: depthwise (3,3,1,C) HWIO kernel; bn_scale/shift: the folded
    eval-mode BatchNorm affine (models/dat.py BatchNormEval raw mode)."""
    b, h, w, c = v.shape
    bh = _pick_bh(h, w + 2, (c,) * 6)
    nb = h // bh
    grid = (b, nb)
    vp = jnp.pad(v, [(0, 0), (0, 0), (1, 1), (0, 0)])
    wp = w + 2

    f32 = lambda t: t.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    vec = lambda m: pl.BlockSpec((1, m), const(0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, bh, wp, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wp, c),
                     lambda bi, i: (bi, jnp.maximum(i * bh - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wp, c),
                     lambda bi, i: (bi, jnp.minimum(i * bh + bh, h - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c), vec(c), vec(c),
    ]
    out_specs = [
        pl.BlockSpec((1, bh, w, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel_a, bh=bh, nblocks=nb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((b, 1, 1, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=20 * b * h * w * c,
            bytes_accessed=2 * v.size * v.dtype.itemsize,
            transcendentals=4 * b * h * w * c),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(vp, vp, vp, wdw.reshape(9, c).astype(jnp.float32),
      f32(bdw).reshape(1, -1), f32(bn_scale).reshape(1, -1),
      f32(bn_shift).reshape(1, -1))


def _kernel_b(att_ref, cx_ref, chvec_ref, si_w1_ref, si_b1_ref,
              si_bns_ref, si_bnb_ref, si_w2_ref, si_b2_ref,
              proj_ref, pbias_ref, o_ref, *, swap: bool, mdt):
    c = att_ref.shape[3]
    dt = mdt                     # MXU operand dtype (wattn._mxu_dtype)
    att = att_ref[0].astype(jnp.float32)
    cx = cx_ref[0].astype(jnp.float32)
    sh = att.shape

    # spatial map from the branch the block variant dictates
    s_src = (cx if swap else att).reshape(-1, c).astype(dt)
    g = jnp.dot(s_src, si_w1_ref[:],
                preferred_element_type=jnp.float32) + si_b1_ref[0]
    g = _gelu_exact(g * si_bns_ref[0] + si_bnb_ref[0]).astype(dt)
    g = jnp.dot(g, si_w2_ref[:],
                preferred_element_type=jnp.float32) + si_b2_ref[0]
    smap = jax.nn.sigmoid(g).reshape(sh[0], sh[1], 1)
    cgate = jax.nn.sigmoid(chvec_ref[0, 0, 0])

    if swap:   # channel block: attened ⊙ σ(S-Map(conv_x)), conv_x ⊙ σ(C-Map)
        a2 = att * smap
        c2 = cx * cgate
    else:      # spatial block: attened ⊙ σ(C-Map), conv_x ⊙ σ(S-Map(att))
        a2 = att * cgate
        c2 = cx * smap
    y = (a2 + c2).reshape(-1, c).astype(dt)
    out = jnp.dot(y, proj_ref[:],
                  preferred_element_type=jnp.float32) + pbias_ref[0]
    o_ref[0] = out.reshape(sh).astype(o_ref.dtype)


def aim_gates_proj(attened, conv_x, chmap_vec, si_w1, si_b1, si_bn_scale,
                   si_bn_shift, si_w2, si_b2, proj_w, proj_b,
                   swap: bool = False, interpret: bool = False,
                   mxu_dtype=None):
    """Pointwise AIM tail: spatial-map chain + both gates + output proj.

    chmap_vec: [B,1,1,C] pre-sigmoid C-Map; swap selects the channel-block
    wiring (S-Map from conv_x / C-Map gates conv_x)."""
    b, h, w, c = attened.shape
    mdt = _mxu_dtype(attened.dtype, interpret, mxu_dtype)
    si_w1, si_w2, proj_w = (t.astype(mdt) for t in (si_w1, si_w2, proj_w))
    mid = si_w1.shape[-1]
    bh = _pick_bh(h, w, (c, c, c, mid, c))
    grid = (b, h // bh)

    f32 = lambda t: t.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    vec = lambda m: pl.BlockSpec((1, m), const(0, 0), memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, bh, w, c), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [
        img, img,
        pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, mid), const(0, 0), memory_space=pltpu.VMEM),
        vec(mid), vec(mid), vec(mid),
        pl.BlockSpec((mid, 1), const(0, 0), memory_space=pltpu.VMEM),
        vec(1),
        pl.BlockSpec((c, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c),
    ]
    kernel = functools.partial(_kernel_b, swap=swap, mdt=mdt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct(attened.shape, attened.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (mid + c),
            bytes_accessed=3 * attened.size * attened.dtype.itemsize,
            transcendentals=4 * b * h * w * mid),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(attened, conv_x, f32(chmap_vec).reshape(-1, 1, 1, c),
      si_w1.reshape(c, mid), f32(si_b1).reshape(1, -1),
      f32(si_bn_scale).reshape(1, -1), f32(si_bn_shift).reshape(1, -1),
      si_w2.reshape(mid, 1), f32(si_b2).reshape(1, -1),
      proj_w.reshape(c, c), f32(proj_b).reshape(1, -1))
