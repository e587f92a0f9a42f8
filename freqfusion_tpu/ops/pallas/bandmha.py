"""Fused per-pixel band MHA (cross-band attention inner loop).

The fusion head's cross-band attention treats the 9 frequency bands as
tokens of a per-pixel MHA ([B,H,W,9,64] — models/lka.py
EnhancedCrossBandWithLKA, reference fusion_network.py CrossBandAttention).
XLA lowers this to batched 9×16 matmuls in [..., 9, 16]-shaped layouts —
measured ~41 ms at 192²×2, ~20× its flop cost, all layout waste.

This kernel keeps the band-concatenated [rows, T·D] layout (576 lanes)
end to end; the tiny per-pixel attention is re-expressed lane-parallel:

  scores(g→(g',h)) = (tile(q_g) ⊙ K_cat) @ M      (M: 0/1 group-sum mask)
  softmax over g' inside each head column group — exact, via a *rowwise*
  max subtraction (constant per row ⇒ softmax-invariant) and a group-sum
  matmul for the partition function
  PV: p @ Mᵀ expands probs back to lane positions; (⊙ V_cat) @ R sums g'
  groups per lane slot

plus the pre-LN, the shared per-band qkv/out projections, and the residual,
in one read and one write of the stacked tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wattn import MOSAIC_PARAMS, _ln, _mxu_dtype


def _masks(t: int, d: int, nh: int):
    """M: [T·D, T·nh] head-wise group-sum mask (col g'·nh+h sums lanes of
    band g', head h); R: [T·D, D] band-sum mask preserving lane slot."""
    hd = d // nh
    m = np.zeros((t * d, t * nh), np.float32)
    r = np.zeros((t * d, d), np.float32)
    for g in range(t):
        for c in range(d):
            h = c // hd
            m[g * d + c, g * nh + h] = 1.0
            r[g * d + c, c] = 1.0
    # Z-mask: for each column (g',h) of scores, which columns share its head
    # across all g'' — i.e. sum over the band axis, within the same head
    z = np.zeros((t * nh, t * nh), np.float32)
    for g in range(t):
        for h in range(nh):
            for g2 in range(t):
                z[g * nh + h, g2 * nh + h] = 1.0
    return m, r, z


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            lnw_ref, lnb_ref, m_ref, r_ref, z_ref, o_ref,
            *, t: int, d: int, nh: int, mdt):
    rows = x_ref.shape[1] * x_ref.shape[2]
    dt = mdt                     # MXU operand dtype (wattn._mxu_dtype)
    hd = d // nh
    scale = np.float32(hd ** -0.5)

    x = x_ref[0].reshape(rows, t * d)

    # per-band LN + shared qkv projection (band-sliced, lanes stay 64-wide)
    qs, ks, vs = [], [], []
    for g in range(t):
        ln = _ln(x[:, g * d:(g + 1) * d], lnw_ref[0], lnb_ref[0]).astype(dt)
        qkv = jnp.dot(ln, wqkv_ref[:], preferred_element_type=jnp.float32)
        qkv = qkv + bqkv_ref[0]
        qs.append(qkv[:, :d].astype(dt))
        ks.append(qkv[:, d:2 * d].astype(dt))
        vs.append(qkv[:, 2 * d:].astype(dt))
    k_cat = jnp.concatenate(ks, axis=-1)   # [rows, T·D]
    v_cat = jnp.concatenate(vs, axis=-1)

    outs = []
    for g in range(t):
        q_rep = jnp.concatenate([qs[g]] * t, axis=-1)  # tile over bands
        s = jnp.dot(((q_rep * scale) * k_cat).astype(dt), m_ref[:],
                    preferred_element_type=jnp.float32)  # [rows, T·nh]
        mx = jnp.max(s, axis=-1, keepdims=True)  # rowwise const: exact
        e = jnp.exp(s - mx)
        zsum = jnp.dot(e.astype(dt), z_ref[:],
                       preferred_element_type=jnp.float32)
        p = (e / zsum).astype(dt)
        p_exp = jnp.dot(p, m_ref[:].T, preferred_element_type=jnp.float32)
        pv = (p_exp.astype(dt) * v_cat)
        wout = jnp.dot(pv, r_ref[:], preferred_element_type=jnp.float32)
        pr = jnp.dot(wout.astype(dt), wproj_ref[:],
                     preferred_element_type=jnp.float32) + bproj_ref[0]
        outs.append((pr + x[:, g * d:(g + 1) * d]).astype(o_ref.dtype))

    o_ref[0] = jnp.concatenate(outs, axis=-1).reshape(x_ref.shape[1:])


def fused_band_mha(stacked, wqkv, bqkv, wproj, bproj, ln_w, ln_b,
                   num_heads: int, interpret: bool = False,
                   mxu_dtype=None):
    """stacked [B,H,W,T,D] → LN → per-pixel T-token MHA → +residual,
    same shape. Weights are TorchMHA's packed in_proj ([D,3D]) / out_proj."""
    b, h, w, t, d = stacked.shape
    mdt = _mxu_dtype(stacked.dtype, interpret, mxu_dtype)
    wqkv, wproj = wqkv.astype(mdt), wproj.astype(mdt)
    x = stacked.reshape(b, h, w, t * d)
    m, r, z = _masks(t, d, num_heads)

    # every op inside is pointwise over pixels; strips hold ~6 lane-padded
    # [T·D]-wide tensors (x, k_cat, v_cat, q_rep, p_exp, out) PLUS the 3·T
    # per-band q/k/v pieces (each lane-padded to 128) in f32
    from .nafblock import _pick_bh
    bh = _pick_bh(h, w, (t * d,) * 6 + (d,) * (3 * t),
                  budget_bytes=6_000_000)
    grid = (b, h // bh)

    f32 = lambda a: a.astype(jnp.float32)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    vec = lambda n: pl.BlockSpec((1, n), const(0, 0), memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, bh, w, t * d), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [
        img,
        pl.BlockSpec((d, 3 * d), const(0, 0), memory_space=pltpu.VMEM),
        vec(3 * d),
        pl.BlockSpec((d, d), const(0, 0), memory_space=pltpu.VMEM),
        vec(d),
        vec(d), vec(d),
        pl.BlockSpec((t * d, t * num_heads), const(0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t * d, d), const(0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t * num_heads, t * num_heads), const(0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel, t=t, d=d, nh=num_heads, mdt=mdt)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * t * d * (4 * d + 2 * t * num_heads),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * h * w * t * t * num_heads),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(x, wqkv, f32(bqkv).reshape(1, -1), wproj, f32(bproj).reshape(1, -1),
      f32(ln_w).reshape(1, -1), f32(ln_b).reshape(1, -1),
      # 0/1 group masks are bf16-exact → travel in the MXU operand dtype
      jnp.asarray(m, mdt), jnp.asarray(r, mdt), jnp.asarray(z, mdt))
    return out.reshape(stacked.shape)
