"""Fused NAFBlock Pallas kernels.

Why: at the ×4-upsampled resolution the width-64 NAFBlocks are pure
HBM-bandwidth (measured 10.6 ms marginal per block at 768²×2 — ~8.5 ms of
which is the structural XLA bound of ~7 GB of conv-to-conv round trips,
scripts/probe_marginal.py). Keeping a row strip resident in VMEM through the
whole block cuts traffic to one read + one write of x plus one of the gated
intermediate.

The block's global-mean SCA forces a split into two grid passes:

  A: LN1 → 1×1 conv (C→2C) → 3×3 depthwise → SimpleGate → g, Σg
     (3×3 halo = two single-row side blocks with clamped index maps —
      boundary rows masked to zero to keep SAME-padding semantics)
  B (pointwise): g·att → 1×1 (C) → β-residual → LN2 → 1×1 (2C) →
     SimpleGate → 1×1 (C) → γ-residual

with the tiny SCA 1×1 (on the pooled vector) in XLA between the two.

Replaces the XLA chain of models/nafnet.py NAFBlock (itself a re-design of
/root/reference/src/models/nafnet/nafnet_arch.py:58-131).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wattn import MOSAIC_PARAMS, _mxu_dtype


def _ln2d(x, w, b, eps=1e-6):
    """channel_layernorm (ops/common.py) in f32: biased variance over C."""
    xf = x.astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    return (xf - u) * jax.lax.rsqrt(s + eps) * w + b


def _kernel_a(x_ref, xt_ref, xb_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
              wdw_ref, bdw_ref, g_ref, sum_ref, *, bh: int, nblocks: int,
              mdt):
    i = pl.program_id(1)
    wp = x_ref.shape[2]          # W + 2 (inputs are W-padded by the caller)
    w = wp - 2
    c = x_ref.shape[3]
    dw = w1_ref.shape[1]
    dt = mdt                     # MXU operand dtype (wattn._mxu_dtype)

    # assemble rows [-1 .. bh]; halo rows/cols are zeroed AFTER conv1 —
    # SAME padding zeros the depthwise conv's *input* t, and LN(0)+bias ≠ 0.
    # (Row assembly concatenates along the outer dim only; sublane/lane-dim
    # concats miscompile on this Mosaic build at sub-128 lane widths.)
    xa = jnp.concatenate([xt_ref[0].astype(jnp.float32),
                          x_ref[0].astype(jnp.float32),
                          xb_ref[0].astype(jnp.float32)], axis=0)

    t = _ln2d(xa, lnw_ref[0], lnb_ref[0])
    t = jnp.dot(t.reshape((bh + 2) * wp, c).astype(dt), w1_ref[:],
                preferred_element_type=jnp.float32)
    t = (t + b1_ref[0]).reshape(bh + 2, wp, dw)
    # separable masks: [R,1,1]/[1,W,1] iotas stay tiny after lane padding —
    # full [R,W,1] mask tensors were ~2 MB each and blew the VMEM stack
    top_live = (i > 0).astype(jnp.float32)
    bot_live = (i < nblocks - 1).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    rlive = (jnp.where(rows == 0, top_live, 1.0)
             * jnp.where(rows == bh + 1, bot_live, 1.0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    clive = ((cols >= 1) & (cols <= w)).astype(jnp.float32)
    t = t * rlive * clive

    acc = jnp.zeros((bh, w, dw), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            acc = acc + t[dr:dr + bh, dc:dc + w, :] * wdw_ref[dr * 3 + dc]
    acc = acc + bdw_ref[0]

    g = acc[:, :, :dw // 2] * acc[:, :, dw // 2:]
    g_ref[0] = g.astype(g_ref.dtype)

    part = jnp.sum(g, axis=(0, 1), keepdims=True)  # [1,1,C]

    @pl.when(i == 0)
    def _init():
        sum_ref[0] = part.astype(sum_ref.dtype)

    @pl.when(i > 0)
    def _acc():
        sum_ref[0] = sum_ref[0] + part.astype(sum_ref.dtype)


def _kernel_b(g_ref, x_ref, att_ref, w3_ref, b3_ref, beta_ref,
              ln2w_ref, ln2b_ref, w4_ref, b4_ref, w5_ref, b5_ref,
              gamma_ref, o_ref, *, mdt):
    w = g_ref.shape[2]
    c = g_ref.shape[3]
    dw = w4_ref.shape[1]
    dt = mdt                     # MXU operand dtype (wattn._mxu_dtype)

    gm = (g_ref[0].astype(jnp.float32) * att_ref[0, 0]).astype(dt)
    x3 = jnp.dot(gm.reshape(-1, c), w3_ref[:],
                 preferred_element_type=jnp.float32) + b3_ref[0]
    y = (x_ref[0].astype(jnp.float32).reshape(-1, c)
         + x3 * beta_ref[0])

    l = _ln2d(y, ln2w_ref[0], ln2b_ref[0]).astype(dt)
    h = jnp.dot(l, w4_ref[:], preferred_element_type=jnp.float32) + b4_ref[0]
    h = (h[:, :dw // 2] * h[:, dw // 2:]).astype(dt)
    x5 = jnp.dot(h, w5_ref[:], preferred_element_type=jnp.float32) + b5_ref[0]
    out = y + x5 * gamma_ref[0]
    o_ref[0] = out.reshape(g_ref.shape[1], w, c).astype(o_ref.dtype)


def _pad128(c: int) -> int:
    """Mosaic stores the lane dim padded to 128 — VMEM sizing must too."""
    return -(-c // 128) * 128


def _pick_bh(h: int, w: int, chans, budget_bytes=None) -> int:
    """Largest divisor of h whose strip fits `budget_bytes`, counting one
    f32 row of `w` for every (lane-padded) channel width in `chans`.

    Default 16 MB: the r3 sweep at the whole-image bench shape measured
    1.249 MP/s/chip vs 1.199 at the old 8 MB default (+4.2%), with first
    pass +27 s compile (285 vs 258 s) — bigger strips amortize grid
    overhead at wide shapes. FREQFUSION_STRIP_BUDGET_MB replaces only the
    DEFAULT, in either direction — a caller passing an explicit
    budget_bytes (e.g. bandmha's deliberately smaller tuned 6 MB) is not
    affected by cross-kernel sweeps (ADVICE r3). The Mosaic VMEM limit is
    100 MB; 32 MB risks the known SGFN bh=4 compile blowup (PERF.md) —
    measure both."""
    import os
    if budget_bytes is None:
        env = os.environ.get("FREQFUSION_STRIP_BUDGET_MB")
        budget_bytes = int(float(env) * 1_000_000) if env else 16_000_000
    row = w * sum(_pad128(c) for c in chans) * 4
    target = max(1, budget_bytes // max(row, 1))
    bh = 1
    for d in range(1, h + 1):
        if h % d == 0 and d <= target:
            bh = d
    return bh


def _naf_budget(c: int):
    """Per-level strip budget: the width-64 HR levels run 2-row strips at
    the 16 MB default and are grid-overhead-bound — the r5 sweep
    (probe_nafparts) measured enc0 26.6→22.3 ms/block and enc2 2.6→1.7 at
    a 48 MB budget, with no compile blowup. Deeper (c>256) levels are
    MXU-bound and keep the default. Scales with FREQFUSION_STRIP_BUDGET_MB
    so cross-kernel sweeps still move it proportionally."""
    import os
    env = os.environ.get("FREQFUSION_STRIP_BUDGET_MB")
    base = int(float(env) * 1_000_000) if env else 16_000_000
    return 3 * base if c <= 256 else base


def naf_block_stage_a(x, ln_w, ln_b, w1, b1, wdw, bdw,
                      interpret: bool = False, mxu_dtype=None):
    """x [B,H,W,C] → (g [B,H,W,C], sums [B,1,1,C]).

    wdw is the depthwise 3×3 HWIO kernel (3,3,1,2C) from nn.Conv; it is
    re-packed to (9, 2C) rows for in-kernel broadcasting.
    """
    b, h, w, c = x.shape
    mdt = _mxu_dtype(x.dtype, interpret, mxu_dtype)
    w1 = w1.astype(mdt)
    dw = w1.shape[-1]
    # strips hold xa + its LN copy [2c] + t [dw] + iota masks + acc [3·dw]
    bh = _pick_bh(h, w + 2, (c, c, dw, dw, dw, dw),
                  budget_bytes=_naf_budget(c))
    nb = h // bh
    grid = (b, nb)
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (0, 0)])
    wp = w + 2

    wdw_flat = wdw.reshape(9, dw).astype(jnp.float32)
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
        vec(c), vec(c),
        pl.BlockSpec((c, dw), const(0, 0), memory_space=pltpu.VMEM),
        vec(dw),
        pl.BlockSpec((9, dw), const(0, 0), memory_space=pltpu.VMEM),
        vec(dw),
    ]
    out_specs = [
        pl.BlockSpec((1, bh, w, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel_a, bh=bh, nblocks=nb, mdt=mdt)
    g, sums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((b, 1, 1, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * dw + 18 * b * h * w * dw,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(xp, xp, xp, f32(ln_w).reshape(1, -1), f32(ln_b).reshape(1, -1),
      w1.reshape(c, dw), f32(b1).reshape(1, -1), wdw_flat,
      f32(bdw).reshape(1, -1))
    return g, sums


def naf_block_stage_b(g, x, att, w3, b3, beta, ln2_w, ln2_b, w4, b4,
                      w5, b5, gamma, interpret: bool = False,
                      mxu_dtype=None):
    """Pointwise second half: returns the NAFBlock output [B,H,W,C]."""
    b, h, w, c = g.shape
    mdt = _mxu_dtype(g.dtype, interpret, mxu_dtype)
    w3, w4, w5 = (t.astype(mdt) for t in (w3, w4, w5))
    dw = w4.shape[-1]
    bh = _pick_bh(h, w, (c, c, dw, c), budget_bytes=_naf_budget(c))
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
        pl.BlockSpec((c, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c), vec(c), vec(c), vec(c),
        pl.BlockSpec((c, dw), const(0, 0), memory_space=pltpu.VMEM),
        vec(dw),
        pl.BlockSpec((dw // 2, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c), vec(c),
    ]
    return pl.pallas_call(
        functools.partial(_kernel_b, mdt=mdt),
        grid=grid,
        in_specs=in_specs,
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (c + dw + dw // 2 * c // c),
            bytes_accessed=3 * g.size * g.dtype.itemsize,
            transcendentals=0),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(g, x, att, w3.reshape(c, c), f32(b3).reshape(1, -1),
      f32(beta).reshape(1, -1), f32(ln2_w).reshape(1, -1),
      f32(ln2_b).reshape(1, -1), w4.reshape(c, dw), f32(b4).reshape(1, -1),
      w5.reshape(dw // 2, c), f32(b5).reshape(1, -1),
      f32(gamma).reshape(1, -1))


def fused_naf_block(x, params, sca_w, sca_b, interpret: bool = False,
                    mxu_dtype=None):
    """Full fused NAFBlock: params is a dict with ln1_w/ln1_b, w1/b1 (1×1
    C→2C), wdw/bdw (3×3 depthwise), w3/b3 (1×1 C→C), beta, ln2_w/ln2_b,
    w4/b4 (1×1 C→2C), w5/b5 (1×1 C→C), gamma. The SCA 1×1 on the pooled
    vector runs in XLA (a [B,C]·[C,C] matmul)."""
    b, h, w, c = x.shape
    g, sums = naf_block_stage_a(
        x, params["ln1_w"], params["ln1_b"], params["w1"], params["b1"],
        params["wdw"], params["bdw"], interpret=interpret,
        mxu_dtype=mxu_dtype)
    mean = sums / np.float32(h * w)
    att = (jnp.einsum("bijc,cd->bijd", mean, sca_w.reshape(c, c))
           + sca_b).astype(x.dtype)
    return naf_block_stage_b(
        g, x, att, params["w3"], params["b3"], params["beta"],
        params["ln2_w"], params["ln2_b"], params["w4"], params["b4"],
        params["w5"], params["b5"], params["gamma"], interpret=interpret,
        mxu_dtype=mxu_dtype)
