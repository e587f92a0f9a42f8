"""Strip-resident 3×3-conv-chain Pallas engine for the fusion head's
HR convolution stacks.

The head's edge refinement, hierarchical stages and refine net are chains of
small-channel (3–96) 3×3 convs at the ×4-upsampled resolution — pure HBM
round trips under XLA (probe_head.py: edge 39 ms, hierarchical 31 ms at
192²×2, ~4× their flop cost). This engine runs a static op-chain over row
strips kept in VMEM:

- inputs are W-padded by K (the chain's 3×3 depth) by the caller; the ±K
  halo rows come from K-row side blocks with clamped index maps;
- arrays *shrink* by one ring per 3×3 conv (slicing only — sublane/lane-dim
  concats miscompile on this Mosaic build), and out-of-image positions are
  iota-masked to zero before every conv, which reproduces SAME zero padding
  exactly (clamped-view duplicate rows land outside the image → masked);
- dense 3×3 convs are nine shifted [rows·cols, Cin]@[Cin, Cout] MXU
  matmuls; 1×1 convs are plain matmuls; gates/residuals are slot ops.

Ops (static dicts): conv3 / conv1 {w,b,act}, save {slot}, load_add
{slot, scale(optional traced)}, conv1_saved {slot,w,b,act,add},
gate_saved {slot} (saved ⊙ σ(t)), act {fn}, add_aux {scale} (second
input tensor, e.g. the refine net's upsampled-LR residual), clamp01.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nafblock import _pick_bh
from .wattn import MOSAIC_PARAMS, _gelu_exact, _ln


def stencil_enabled() -> bool:
    """Measured OFF by default: at bench shapes the chain kernels run
    ~40 ms/call (tiny-K tap matmuls under-utilize the MXU), losing to the
    XLA conv stacks they replace (probe_compile.py stencil_edge/stage;
    HAT-L 365→419 ms with the CAB chain). FREQFUSION_STENCIL=1 re-enables
    for kernel iteration."""
    return os.environ.get("FREQFUSION_STENCIL", "0") == "1"


def _act(t, fn):
    if fn == "gelu":
        return _gelu_exact(t)
    if fn == "sigmoid":
        return jax.nn.sigmoid(t)
    if fn in (None, "none"):
        return t
    raise ValueError(fn)


def _kernel(*refs, ops, k: int, bh: int, h: int, w: int, n_weights: int,
            has_aux: bool):
    # refs: x, top, bot, [aux], w0, b0, w1, b1, ..., o_ref
    x_ref, top_ref, bot_ref = refs[:3]
    idx = 3
    aux_t = None
    if has_aux:
        a_ref, at_ref, ab_ref = refs[idx:idx + 3]
        idx += 3
    wrefs = refs[idx:idx + 2 * n_weights]
    o_ref = refs[idx + 2 * n_weights]
    i = pl.program_id(1)

    t = jnp.concatenate([top_ref[0].astype(jnp.float32),
                         x_ref[0].astype(jnp.float32),
                         bot_ref[0].astype(jnp.float32)], axis=0)
    if has_aux:
        aux_t = jnp.concatenate([at_ref[0].astype(jnp.float32),
                                 a_ref[0].astype(jnp.float32),
                                 ab_ref[0].astype(jnp.float32)], axis=0)
    m = k                       # current margin (rows/cols beyond the strip)
    slots = {}

    def mask_oob(a, m):
        """Zero positions outside the image (exact SAME-padding semantics).
        Separable [R,1,1]/[1,W,1] masks stay tiny after lane padding."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (a.shape[0], 1, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1], 1), 1)
        grow = i * bh - m + rows
        gcol = cols - m
        rlive = ((grow >= 0) & (grow < h)).astype(jnp.float32)
        clive = ((gcol >= 0) & (gcol < w)).astype(jnp.float32)
        return a * rlive * clive

    def center(a, am):
        """Slice an array saved at margin `am` down to margin `m`."""
        d = am - m
        if d == 0:
            return a
        return a[d:a.shape[0] - d, d:a.shape[1] - d]

    for op in ops:
        kind = op["kind"]
        if kind == "conv3":
            wref, bref = wrefs[2 * op["wi"]], wrefs[2 * op["wi"] + 1]
            cin = t.shape[-1]
            cout = wref.shape[-1]
            tm = mask_oob(t, m)
            rr, cc = t.shape[0] - 2, t.shape[1] - 2
            acc = jnp.zeros((rr * cc, cout), jnp.float32)
            for dr in range(3):
                for dc in range(3):
                    tap = tm[dr:dr + rr, dc:dc + cc, :].reshape(rr * cc, cin)
                    acc = acc + jnp.dot(
                        tap,
                        wref[(dr * 3 + dc) * cin:(dr * 3 + dc + 1) * cin, :],
                        preferred_element_type=jnp.float32)
            t = (acc + bref[0]).reshape(rr, cc, cout)
            m -= 1
            t = _act(t, op.get("act"))
        elif kind == "conv1":
            wref, bref = wrefs[2 * op["wi"]], wrefs[2 * op["wi"] + 1]
            sh = t.shape
            t = jnp.dot(t.reshape(-1, sh[-1]), wref[:],
                        preferred_element_type=jnp.float32) + bref[0]
            t = _act(t.reshape(sh[0], sh[1], -1), op.get("act"))
        elif kind == "save":
            slots[op["slot"]] = (t, m)
        elif kind == "load_add":
            a, am = slots[op["slot"]]
            s = op.get("scale_wi")
            sc = wrefs[2 * s][0, 0] if s is not None else 1.0
            t = center(a, am) + sc * t
        elif kind == "conv1_saved":
            a, am = slots[op["slot"]]
            wref, bref = wrefs[2 * op["wi"]], wrefs[2 * op["wi"] + 1]
            a = center(a, am)
            sh = a.shape
            p = jnp.dot(a.reshape(-1, sh[-1]), wref[:],
                        preferred_element_type=jnp.float32) + bref[0]
            p = _act(p.reshape(sh[0], sh[1], -1), op.get("act"))
            t = t + p if op.get("add") else p
        elif kind == "gate_saved":
            a, am = slots[op["slot"]]
            t = center(a, am) * jax.nn.sigmoid(t)
        elif kind == "conv1_aux":
            wref, bref = wrefs[2 * op["wi"]], wrefs[2 * op["wi"] + 1]
            a = center(aux_t, k)
            sh = a.shape
            p = jnp.dot(a.reshape(-1, sh[-1]), wref[:],
                        preferred_element_type=jnp.float32) + bref[0]
            p = _act(p.reshape(sh[0], sh[1], -1), op.get("act"))
            t = t + p if op.get("add") else p
        elif kind == "ln":
            wref, bref = wrefs[2 * op["wi"]], wrefs[2 * op["wi"] + 1]
            sh = t.shape
            t = _ln(t.reshape(-1, sh[-1]), wref[0],
                    bref[0]).reshape(sh)
        elif kind == "act":
            t = _act(t, op["fn"])
        elif kind == "add_aux":
            s = op.get("scale_wi")
            sc = wrefs[2 * s][0, 0] if s is not None else 1.0
            t = t + sc * center(aux_t, k)
        elif kind == "clamp01":
            t = jnp.clip(t, 0.0, 1.0)
        else:
            raise ValueError(kind)
    assert m == 0, f"op chain consumed margin down to {m}, expected 0"
    o_ref[0] = t.astype(o_ref.dtype)


def run_conv_chain(x, ops, weights, k: int, out_channels: int,
                   aux=None, aux_channels: int = None,
                   interpret: bool = False):
    """Run a conv3-chain op list over [B,H,W,C] → [B,H,W,out_channels].

    `weights`: list of (w, b) in op order; conv3 kernels as HWIO (3,3,ci,co)
    (re-packed to (9·ci, co)), conv1 kernels (1,1,ci,co) or (ci,co); scalar
    params as () arrays referenced via scale_wi with b=None.
    `k` must equal the number of conv3 ops in the chain.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (k, k), (0, 0)])
    wp = w + 2 * k

    assert h % k == 0, (h, k)   # HR sizes are multiples of 16; k ∈ {2, 4}
    chans = [c, c] + [wt.shape[-1] if hasattr(wt, "shape") and wt.ndim > 0
                      else 1 for wt, _ in weights] + [out_channels]
    cap = _pick_bh(h, wp, tuple(ch for ch in chans), budget_bytes=6_000_000)
    # largest multiple of k dividing h, within the VMEM cap
    bh = k
    for d in range(k, h + 1, k):
        if h % d == 0 and d <= cap:
            bh = d
    nb = h // bh
    grid = (b, nb)

    f32 = lambda t: t.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    # halo side blocks: k rows just above/below the strip (k-row block units)
    in_specs = [
        pl.BlockSpec((1, bh, wp, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, wp, c),
                     lambda bi, i: (bi,
                                    jnp.maximum(i * (bh // k) - 1, 0),
                                    0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, wp, c),
                     lambda bi, i: (bi,
                                    jnp.minimum(i * (bh // k) + bh // k,
                                                h // k - 1),
                                    0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, xp, xp]
    has_aux = aux is not None
    if has_aux:
        ac = aux_channels if aux_channels is not None else aux.shape[-1]
        auxp = jnp.pad(aux, [(0, 0), (0, 0), (k, k), (0, 0)])
        in_specs += [
            pl.BlockSpec((1, bh, wp, ac), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wp, ac),
                         lambda bi, i: (bi,
                                        jnp.maximum(i * (bh // k) - 1, 0),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, wp, ac),
                         lambda bi, i: (bi,
                                        jnp.minimum(i * (bh // k) + bh // k,
                                                    h // k - 1),
                                        0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [auxp, auxp, auxp]

    flat_w = []
    for wt, bs in weights:
        if wt.ndim == 4 and wt.shape[0] == 3:       # conv3 HWIO
            ci, co = wt.shape[2], wt.shape[3]
            wk = wt.transpose(0, 1, 2, 3).reshape(9 * ci, co)
            in_specs.append(pl.BlockSpec((9 * ci, co), const(0, 0),
                                         memory_space=pltpu.VMEM))
            flat_w.append(wk)
        elif wt.ndim == 0:                           # scalar param
            in_specs.append(pl.BlockSpec((1, 1), const(0, 0),
                                         memory_space=pltpu.VMEM))
            flat_w.append(f32(wt).reshape(1, 1))
        elif wt.ndim == 1:                           # LN scale etc.
            in_specs.append(pl.BlockSpec((1, wt.shape[0]), const(0, 0),
                                         memory_space=pltpu.VMEM))
            flat_w.append(f32(wt).reshape(1, -1))
        else:                                        # conv1 / dense
            wk = wt.reshape(wt.shape[-2], wt.shape[-1])
            in_specs.append(pl.BlockSpec(wk.shape, const(0, 0),
                                         memory_space=pltpu.VMEM))
            flat_w.append(wk)
        bb = (jnp.zeros((1,), jnp.float32) if bs is None else f32(bs))
        in_specs.append(pl.BlockSpec((1, bb.shape[-1]), const(0, 0),
                                     memory_space=pltpu.VMEM))
        flat_w.append(bb.reshape(1, -1))
    args.extend(flat_w)

    kernel = functools.partial(_kernel, ops=tuple(ops), k=k, bh=bh, h=h, w=w,
                               n_weights=len(weights), has_aux=has_aux)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w, out_channels),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, out_channels), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=18 * b * h * w * sum(
                wt.shape[-1] * (wt.shape[-2] if wt.ndim >= 2 else 1)
                for wt, _ in weights if hasattr(wt, "ndim") and wt.ndim == 4),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=4 * b * h * w * max(
                (wt.shape[-1] for wt, _ in weights
                 if hasattr(wt, "ndim") and wt.ndim >= 2), default=1)),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(*args)
