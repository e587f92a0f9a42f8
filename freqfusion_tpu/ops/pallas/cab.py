"""Fused CAB conv-chain Pallas kernel (HAT's parallel conv branch).

Why: the r4 HLO schedule (scripts/probe_habhlo.py) showed every XLA-conv →
pallas boundary in the HAB chain paying transposing relayouts — XLA lowers
the 3×3 convs in a {3,0,2,1:T(2,128)} layout, the GELU erf in f32 at
T(1,128), and the channel-attention pool as a whole-image f32 convert
(130 MB), then copies back to the standard {3,2,1,0:T(8,128)} layout the
Mosaic custom call requires. Measured composition cost: ~6.6-9 ms per HAB
at [1,352,512,180] bf16 on top of ~5 ms of parts (probe_habglue r4), for
all CAB lowerings (conv/shift9/im2col) — the boundary, not the conv, is
the cost. Elementwise producers compose free.

This kernel computes the whole pre-attention CAB chain

    u = conv3x3(GELU(conv3x3(LN1(x)) + b1)) + b2        (dense, SAME)

strip-resident in VMEM (LN in f32, tap matmuls on the MXU in the wattn
operand dtype), plus the channel-attention pool's per-image sums as a
second output. The tiny CA MLP (C→C/squeeze→C, sigmoid) runs in XLA on the
pooled [B,1,1,C] vector, and the resulting gate is applied *inside*
fused_hab_block via its cab_scale operand — so the full HAB data path is
pallas→pallas with only elementwise XLA between, which composes free.

Replaces the XLA lowering of the reference CAB
(/root/reference/src/models/hat/hat_arch.py:61-74) inside the fused-HAB
serving path (models/hat.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nafblock import _pick_bh
from .wattn import MOSAIC_PARAMS, _gelu_exact, _ln, _mxu_dtype


def _kernel(x_ref, xt2_ref, xt1_ref, xb1_ref, xb2_ref, lnw_ref, lnb_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, u_ref, sum_ref,
            *, bh: int, h: int, mdt, out_shift: int = 0,
            repack: bool = False):
    i = pl.program_id(1)
    wp = x_ref.shape[2]          # W + 4 (caller W-pads by the 2-row halo)
    w = wp - 4
    c = x_ref.shape[3]
    mid = w1_ref.shape[1]
    dt = mdt

    # assemble rows [-2 .. bh+2); sublane concat along the outer dim only
    # (lane/sublane-dim concats miscompile at these widths — PERF.md)
    xa = jnp.concatenate([xt2_ref[0], xt1_ref[0], x_ref[0],
                          xb1_ref[0], xb2_ref[0]], axis=0)

    z = _ln(xa, lnw_ref[0], lnb_ref[0])
    # zero everything outside the true image: clamped halo rows carry live
    # pixels, and SAME padding means the conv input is zero there
    rows = (jax.lax.broadcasted_iota(jnp.int32, (bh + 4, 1, 1), 0)
            + i * bh - 2)
    rlive = ((rows >= 0) & (rows < h)).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    clive = ((cols >= 2) & (cols < w + 2)).astype(jnp.float32)
    z = (z * rlive * clive).astype(dt)

    # conv1 (C→mid) over the out1 region [bh+2, w+2]
    r1, q1 = bh + 2, w + 2
    if repack:
        # 3-D dot_general repack (r5): contract the lane dim of the tap
        # VIEW directly — no [r1,q1,c]→[r1·q1,c] reshape. q1=W+2 is never
        # 8-sublane-aligned, so that reshape re-paves the whole strip per
        # tap; skipping it removes 9 VMEM copies per conv. (The r5
        # lane-concat variant miscompiled: tpu.concatenate of 180-lane
        # pieces puts inputs at non-vreg offsets — Mosaic rejects it.)
        acc = jnp.zeros((r1, q1, mid), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    z[dy:dy + r1, dx:dx + q1, :],
                    w1_ref[(dy * 3 + dx) * c:(dy * 3 + dx + 1) * c, :],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        g = _gelu_exact(acc + b1_ref[0])
    else:
        # one tap = one MXU matmul on the shifted window view
        acc = jnp.zeros((r1 * q1, mid), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = z[dy:dy + r1, dx:dx + q1, :].reshape(r1 * q1, c)
                acc = acc + jnp.dot(tap, w1_ref[(dy * 3 + dx) * c:
                                                (dy * 3 + dx + 1) * c, :],
                                    preferred_element_type=jnp.float32)
        g = _gelu_exact(acc + b1_ref[0]).reshape(r1, q1, mid)
    # GELU(b1) ≠ 0: re-zero the out-of-image ring before conv2 reads it
    rows1 = (jax.lax.broadcasted_iota(jnp.int32, (r1, 1, 1), 0)
             + i * bh - 1)
    r1live = ((rows1 >= 0) & (rows1 < h)).astype(jnp.float32)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, q1, 1), 1)
    c1live = ((cols1 >= 1) & (cols1 < w + 1)).astype(jnp.float32)
    g = (g * r1live * c1live).astype(dt)

    # conv2 (mid→C) over the block's own [bh, w]
    if repack:
        acc2 = jnp.zeros((bh, w, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc2 = acc2 + jax.lax.dot_general(
                    g[dy:dy + bh, dx:dx + w, :],
                    w2_ref[(dy * 3 + dx) * mid:(dy * 3 + dx + 1) * mid, :],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc2 = acc2.reshape(bh * w, c)
    else:
        acc2 = jnp.zeros((bh * w, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = g[dy:dy + bh, dx:dx + w, :].reshape(bh * w, mid)
                acc2 = acc2 + jnp.dot(tap, w2_ref[(dy * 3 + dx) * mid:
                                                  (dy * 3 + dx + 1) * mid, :],
                                      preferred_element_type=jnp.float32)
    u = acc2 + b2_ref[0]
    ub = u.reshape(bh, w, c).astype(u_ref.dtype)
    if out_shift:
        # W-roll by -out_shift folded into the store (the H-roll is a
        # block permutation in the output index map)
        s = out_shift
        u_ref[0, :, :w - s, :] = ub[:, s:, :]
        u_ref[0, :, w - s:, :] = ub[:, :s, :]
    else:
        u_ref[0] = ub

    part = jnp.sum(u, axis=0, keepdims=True).reshape(1, 1, 1, c)

    @pl.when(i == 0)
    def _init():
        sum_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        sum_ref[...] = sum_ref[...] + part


def cab_chain(x, ln_w, ln_b, w1, b1, w2, b2, interpret: bool = False,
              mxu_dtype=None, out_shift: int = 0, repack=None):
    """LN1 + dense 3×3 (C→mid) + exact GELU + dense 3×3 (mid→C), fused.

    x [B,H,W,C] raw (pre-LN) input; w1 [3,3,C,mid], w2 [3,3,mid,C] (HWIO).
    Returns (u [B,H,W,C] in x.dtype, sums [B,1,1,C] f32) where sums is the
    spatial sum of u for the channel-attention pool (mean = sums / (H·W)).

    out_shift > 0 returns jnp.roll(u, (-out_shift, -out_shift), (1, 2))
    with the roll folded into the store: the H-roll is an output-block
    permutation, the W-roll a two-slice write — saving the shifted HAB's
    65 MB XLA roll of the CAB branch (models/hat.py).
    """
    b, h, w, c = x.shape
    mid = w1.shape[-1]
    mdt = _mxu_dtype(x.dtype, interpret, mxu_dtype)
    if repack is None:
        import os
        repack = os.environ.get("FREQFUSION_CAB_REPACK", "0") == "1"

    bh = _pick_bh(h, w + 4, (c, c, mid, mid, c))
    xla_roll = False
    if out_shift:
        assert 0 < out_shift < min(h, w), (out_shift, h, w)
        bh0 = bh
        while out_shift % bh:
            bh -= 1
            while h % bh:
                bh -= 1
        if bh < min(4, bh0):
            # heights sharing few factors with the shift collapse to 1-2-row
            # strips — a silent perf cliff (ADVICE r4 #2). Keep the VMEM-
            # optimal strip height and do the roll in XLA instead.
            import logging
            logging.getLogger(__name__).warning(
                "cab_chain: out_shift=%d forces bh=%d at h=%d (optimal %d); "
                "falling back to an XLA roll", out_shift, bh, h, bh0)
            bh, xla_roll = bh0, True
    nb = h // bh
    xp = jnp.pad(x, [(0, 0), (0, 0), (2, 2), (0, 0)])
    wp = w + 4

    f32 = lambda t: t.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    vec = lambda m: pl.BlockSpec((1, m), const(0, 0), memory_space=pltpu.VMEM)
    row = lambda rmap: pl.BlockSpec((1, 1, wp, c),
                                    lambda bi, i: (bi, rmap(i), 0, 0),
                                    memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, bh, wp, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        row(lambda i: jnp.maximum(i * bh - 2, 0)),
        row(lambda i: jnp.maximum(i * bh - 1, 0)),
        row(lambda i: jnp.minimum(i * bh + bh, h - 1)),
        row(lambda i: jnp.minimum(i * bh + bh + 1, h - 1)),
        vec(c), vec(c),
        pl.BlockSpec((9 * c, mid), const(0, 0), memory_space=pltpu.VMEM),
        vec(mid),
        pl.BlockSpec((9 * mid, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c),
    ]
    if out_shift and not xla_roll:
        sh_b = out_shift // bh
        u_map = lambda bi, i: (bi, (i - sh_b) % nb, 0, 0)
    else:
        u_map = lambda bi, i: (bi, i, 0, 0)
    out_specs = [
        pl.BlockSpec((1, bh, w, c), u_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel, bh=bh, h=h, mdt=mdt,
                               out_shift=0 if xla_roll else out_shift,
                               repack=repack)
    u, sums = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((b, 1, 1, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * (c * mid + mid * c),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * h * w * mid),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(xp, xp, xp, xp, xp, f32(ln_w).reshape(1, -1), f32(ln_b).reshape(1, -1),
      w1.reshape(9 * c, mid).astype(mdt), f32(b1).reshape(1, -1),
      w2.reshape(9 * mid, c).astype(mdt), f32(b2).reshape(1, -1))
    if xla_roll:
        u = jnp.roll(u, (-out_shift, -out_shift), axis=(1, 2))
    return u, sums


def _kernel_conv3(x_ref, xt1_ref, xb1_ref, w_ref, b_ref, o_ref,
                  *, bh: int, h: int, mdt):
    i = pl.program_id(1)
    wp = x_ref.shape[2]          # W + 2 (caller W-pads by 1)
    w = wp - 2
    c = x_ref.shape[3]
    cout = w_ref.shape[1]

    xa = jnp.concatenate([xt1_ref[0], x_ref[0], xb1_ref[0]], axis=0)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
            + i * bh - 1)
    rlive = ((rows >= 0) & (rows < h)).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    clive = ((cols >= 1) & (cols < w + 1)).astype(jnp.float32)
    z = (xa.astype(jnp.float32) * rlive * clive).astype(mdt)

    acc = jnp.zeros((bh * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = z[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
            acc = acc + jnp.dot(tap, w_ref[(dy * 3 + dx) * c:
                                           (dy * 3 + dx + 1) * c, :],
                                preferred_element_type=jnp.float32)
    o_ref[0] = (acc + b_ref[0]).reshape(bh, w, cout).astype(o_ref.dtype)


def conv3x3_dense(x, w, b, interpret: bool = False, mxu_dtype=None):
    """One dense SAME 3×3 conv [B,H,W,C]→[B,H,W,Cout] as a strip kernel.

    For convs that sit *between* Mosaic kernels (HAT/DAT group-ending
    convs, conv_after_body): XLA lowers a lone conv in its own layout and
    each seam pays the transposing-relayout tax (PERF.md r4); this keeps
    the chain pallas→pallas."""
    b_, h, w_, c = x.shape
    cout = w.shape[-1]
    mdt = _mxu_dtype(x.dtype, interpret, mxu_dtype)
    bh = _pick_bh(h, w_ + 2, (c, c, cout))
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (0, 0)])
    wp = w_ + 2

    f32 = lambda t: t.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    row = lambda rmap: pl.BlockSpec((1, 1, wp, c),
                                    lambda bi, i: (bi, rmap(i), 0, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, bh, wp, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        row(lambda i: jnp.maximum(i * bh - 1, 0)),
        row(lambda i: jnp.minimum(i * bh + bh, h - 1)),
        pl.BlockSpec((9 * c, cout), const(0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const(0, 0), memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel_conv3, bh=bh, h=h, mdt=mdt)
    return pl.pallas_call(
        kernel,
        grid=(b_, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w_, cout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, h, w_, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_ * h * w_ * 9 * c * cout,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(xp, xp, xp, w.reshape(9 * c, cout).astype(mdt),
      f32(b).reshape(1, -1))


def cab_chain_reference(x, ln_w, ln_b, w1, b1, w2, b2):
    """XLA twin (identical math, HIGHEST-precision convs) for parity tests."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    z = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_w + ln_b

    def conv(t, k):
        return jax.lax.conv_general_dilated(
            t, k.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

    g = jax.nn.gelu(conv(z, w1) + b1, approximate=False)
    u = conv(g, w2) + b2
    return u.astype(x.dtype), jnp.sum(
        u, axis=(1, 2), keepdims=True).astype(jnp.float32)
