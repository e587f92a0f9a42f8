"""Fused window multi-head attention Pallas kernel (HAT W-MSA/SW-MSA and
DAT rectangular windows share this inner loop).

Why a kernel: the measured XLA chain for one HAT-L W-MSA at 192²/batch-2 is
~7.5 ms f32, of which ~5 ms is window partition/reverse/roll data movement
(scripts/profile_tpu.py probes) — HBM-traffic bound, not FLOP bound. This
kernel reads the (rolled) feature image once, computes qkv → +rel-pos-bias
(+shift mask) → softmax → PV → output projection entirely in VMEM, and
writes the attended image once.

Blocking: programs own a *vertical stack* of `gh` windows — block
[1, gh·wsh, wsw, C] flattens row-major to [gh·N, C] with each window's N
tokens contiguous in the sublane dim, so per-window work needs only static
sublane slices. Weights/bias use constant index maps (fetched once, resident
across the grid).

Head alignment: HAT-L's head_dim is 30 (embed 180 / 6 heads) — off the lane
grid. `_align_heads` re-packs the qkv output columns / proj input rows into
32-wide zero-padded head slots at trace time (zero dims contribute nothing
to QKᵀ or PV, so the math is bit-identical) giving 32-aligned in-kernel lane
slices without touching stored checkpoints.

MXU precision: Mosaic lowers an f32 jnp.dot as a ~3× multi-pass expansion,
while XLA's DEFAULT precision truncates f32 matmul operands to one bf16 MXU
pass (measured: fused HAB 3.1→≤0.4 ms at [1,352,512,180] —
scripts/probe_habparts.py). To match XLA's precision class AND its speed,
kernels cast matmul operands to bf16 (`_mxu_dtype`) and accumulate f32; the
residual stream, LayerNorms, softmax and bias/mask adds stay f32. Interpret
mode (CPU parity tests) keeps full input-dtype operands; set
FREQFUSION_MXU_F32=1 to force multi-pass f32 matmuls on TPU.

Replaces the reference's window attention inner loops
(/root/reference/src/models/hat/hat_arch.py:129-196,
 /root/reference/src/models/dat/dat_arch.py:177-342).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: v5e has 128 MiB of VMEM per core; Mosaic's default 16 MiB scoped-stack
#: ceiling rejects several of our strip kernels at wide shapes.
MOSAIC_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _mxu_dtype(in_dtype, interpret: bool, override=None):
    """Matmul *operand* dtype for a kernel (accumulation is always f32).

    Default bf16 on TPU — the same single-pass truncation XLA's DEFAULT
    precision applies to f32 matmuls, ~3× faster than Mosaic's multi-pass
    f32 lowering. Interpret mode keeps the input dtype so CPU parity tests
    see true-f32 math (mirroring XLA on CPU). `override` pins it explicitly
    (tests); FREQFUSION_MXU_F32=1 forces f32 operands on TPU."""
    if override is not None:
        return jnp.dtype(override)
    import os
    if interpret or os.environ.get("FREQFUSION_MXU_F32", "0") == "1":
        return jnp.dtype(in_dtype)
    return jnp.dtype(jnp.bfloat16)


def _pick_gh(n_win_rows: int, max_gh: int = 4) -> int:
    """Vertical window-stack per program. FREQFUSION_MAX_GH widens the
    search (e.g. 11 for 22 window rows at whole-image shapes) — larger
    stacks amortize weight fetches per program at the price of VMEM."""
    import os
    env = os.environ.get("FREQFUSION_MAX_GH")
    if env:
        try:
            # cap at 32 window rows (≈0.5M tokens/program at ws16·C180 —
            # past any feasible VMEM budget; bad values fail at Mosaic
            # compile otherwise, deep in the stack and hard to attribute)
            max_gh = max(max_gh, min(int(env), 32))
        except ValueError:
            pass
    best = 1
    for g in range(1, max_gh + 1):
        if n_win_rows % g == 0:
            best = g
    return best


def _mask_types(mask, n_wr: int, n_wc: int) -> np.ndarray:
    """[nW,N,N] shift mask → the 4 distinct window types [4,N,N]
    (0 interior, 1 last-col, 2 last-row, 3 corner), asserted exhaustive.
    Passing the full tensor embedded an O(image)·N² constant in the program
    (184 MB at 352×512/ws16 — blew the remote-compile request limit)."""
    g = np.asarray(mask).reshape(n_wr, n_wc, mask.shape[-2], mask.shape[-1])
    types = np.stack([g[0, 0], g[0, n_wc - 1],
                      g[n_wr - 1, 0], g[n_wr - 1, n_wc - 1]])
    for i in range(n_wr):
        for j in range(n_wc):
            t = (2 if i == n_wr - 1 else 0) + (1 if j == n_wc - 1 else 0)
            assert np.array_equal(g[i, j], types[t]), (i, j)
    return types


def _merged_bias_mask(bias, mask, n_wr: int, n_wc: int):
    """bias [nh,N,N] + shift mask → [4,nh,N,N] per-type biased masks.

    Shifted-window kernels feed this instead of separate bias/mask refs:
    the per-program window type (0 interior, 1 last-col, 2 last-row, 3
    corner) is selected by the BLOCK INDEX MAP, so the kernel does one add
    and zero selects — the r3 in-kernel `_select_mask` where-chain measured
    ~1.8 ms/call of pure overhead at 352×512 (probe_habglue). Consecutive
    programs mostly share a type, so Mosaic's revisit optimization skips
    the re-fetch along the row."""
    types = jnp.asarray(_mask_types(np.asarray(mask), n_wr, n_wc),
                        jnp.float32)
    return bias[None] + types[:, None]


def _type_index(i, j, n_wr: int, n_wc: int):
    """Window-type block index from program position (trace-time ints OK)."""
    r = (i // (n_wr - 1)) if n_wr > 1 else 1
    c = (j // (n_wc - 1)) if n_wc > 1 else 1
    return 2 * r + c


def _align_heads(wqkv, bqkv, wproj, num_heads, hd, hdp):
    """Re-pack heads into hdp-wide zero-padded slots (math-identical):
    pure pad+reshape — the target column order (section, head, slot) is
    exactly the row-major layout of [3, nh, hdp]."""
    c = wqkv.shape[0]
    pad = hdp - hd
    wqkv_p = jnp.pad(wqkv.reshape(c, 3, num_heads, hd),
                     ((0, 0), (0, 0), (0, 0), (0, pad)))
    bqkv_p = jnp.pad(bqkv.reshape(3, num_heads, hd),
                     ((0, 0), (0, 0), (0, pad)))
    wproj_p = jnp.pad(wproj.reshape(num_heads, hd, -1),
                      ((0, 0), (0, pad), (0, 0)))
    return (wqkv_p.reshape(c, 3 * num_heads * hdp),
            bqkv_p.reshape(3 * num_heads * hdp),
            wproj_p.reshape(num_heads * hdp, -1))


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            *rest, wsh: int, wsw: int, num_heads: int, head_dim: int,
            gh: int, has_mask: bool, mdt):
    (o_ref,) = rest
    n = wsh * wsw
    c = x_ref.shape[-1]
    cp = wproj_ref.shape[0]          # padded attention width (nh·hdp)
    hdp = cp // num_heads
    dt = mdt                         # MXU operand dtype (_mxu_dtype)
    bias2 = bias_ref[0] if has_mask else bias_ref
    xb = x_ref[0].reshape(gh * n, c)
    qkv = jnp.dot(xb.astype(dt), wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(dt)
    scale = jnp.asarray(head_dim ** -0.5, dt)

    for g in range(gh):
        head_outs = []
        for h in range(num_heads):
            q = qkv[g * n:(g + 1) * n, h * hdp:(h + 1) * hdp]
            k = qkv[g * n:(g + 1) * n, cp + h * hdp:cp + (h + 1) * hdp]
            v = qkv[g * n:(g + 1) * n, 2 * cp + h * hdp:2 * cp + (h + 1) * hdp]
            a = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = a + bias2[h]
            a = jax.nn.softmax(a, axis=-1).astype(dt)
            head_outs.append(jnp.dot(a, v, preferred_element_type=jnp.float32)
                             .astype(dt))
        wout = jnp.concatenate(head_outs, axis=-1)  # [N, cp]
        pr = jnp.dot(wout, wproj_ref[:], preferred_element_type=jnp.float32)
        pr = pr + bproj_ref[0]
        o_ref[0, g * wsh:(g + 1) * wsh, :, :] = (
            pr.reshape(wsh, wsw, c).astype(o_ref.dtype))


def _gelu_exact(x):
    """Exact-GELU for Mosaic kernels: this build lowers neither erf nor erfc,
    so Φ is built from exp via the Abramowitz–Stegun 7.1.26 rational erf
    (max |err| 1.5e-7 — well inside the kernels' 5e-5 parity budget)."""
    xf = x.astype(jnp.float32)
    z = xf * np.float32(1.0 / np.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * az)
    poly = t * (np.float32(0.254829592)
                + t * (np.float32(-0.284496736)
                       + t * (np.float32(1.421413741)
                              + t * (np.float32(-1.453152027)
                                     + t * np.float32(1.061405429)))))
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.where(z >= 0, erf_az, -erf_az)
    return 0.5 * xf * (1.0 + erf_z)


def _ln(x, w, b, eps=1e-5):
    """f32 LayerNorm over the last axis (torch nn.LayerNorm semantics)."""
    xf = x.astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    return (xf - u) * jax.lax.rsqrt(s + eps) * w + b


def _kernel_hab(x_ref, cx_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                bias_ref, ln1w_ref, ln1b_ref, ln2w_ref, ln2b_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, *rest, wsh: int, wsw: int,
                num_heads: int, head_dim: int, gh: int, has_mask: bool,
                has_ca: bool, conv_scale: float, mdt, quad: bool = False):
    """Whole HAB minus the CAB convs: LN1 → W-MSA (+proj) → residual combine
    with the precomputed CAB branch → LN2 → MLP → residual, one HBM read of
    (x, conv_x) and one write. See HAB in models/hat.py for the XLA chain.

    Shifted blocks (has_mask) receive bias+mask pre-merged per window type
    ([1,nh,N,N] block, type picked by the index map) — no in-kernel mask."""
    rest = list(rest)
    if quad:
        # in_shift: x arrives as 4 wrap-around quadrant refs (the caller's
        # jnp.roll folded into the index maps); assemble the rolled window.
        # Sublane-dim concat of 8-row pieces sits on the 8-sublane grid and
        # lane rows are full-width — the 128-alignment rule is satisfied.
        xtr_ref, xbl_ref, xbr_ref = rest[:3]
        rest = rest[3:]
        top = jnp.concatenate([x_ref[0], xtr_ref[0]], axis=1)
        bot = jnp.concatenate([xbl_ref[0], xbr_ref[0]], axis=1)
        x_win = jnp.concatenate([top, bot], axis=0)    # [wsh, wsw, c]
    else:
        x_win = x_ref[0]
    ca_ref = rest.pop(0) if has_ca else None
    (o_ref,) = rest
    n = wsh * wsw
    c = x_win.shape[-1]
    cp = wproj_ref.shape[0]
    hdp = cp // num_heads
    dt = mdt                         # MXU operand dtype (_mxu_dtype)
    bias2 = bias_ref[0] if has_mask else bias_ref
    xb = x_win.reshape(gh * n, c)
    ln1 = _ln(xb, ln1w_ref[0], ln1b_ref[0]).astype(dt)
    qkv = jnp.dot(ln1, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(dt)
    scale = jnp.asarray(head_dim ** -0.5, dt)

    for g in range(gh):
        head_outs = []
        for h in range(num_heads):
            q = qkv[g * n:(g + 1) * n, h * hdp:(h + 1) * hdp]
            k = qkv[g * n:(g + 1) * n, cp + h * hdp:cp + (h + 1) * hdp]
            v = qkv[g * n:(g + 1) * n, 2 * cp + h * hdp:2 * cp + (h + 1) * hdp]
            a = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = a + bias2[h]
            a = jax.nn.softmax(a, axis=-1).astype(dt)
            head_outs.append(jnp.dot(a, v, preferred_element_type=jnp.float32)
                             .astype(dt))
        wout = jnp.concatenate(head_outs, axis=-1)  # [N, cp]
        pr = jnp.dot(wout, wproj_ref[:], preferred_element_type=jnp.float32)
        pr = pr + bproj_ref[0]
        rows = slice(g * n, (g + 1) * n)
        cx = cx_ref[0].reshape(gh * n, c)[rows].astype(jnp.float32)
        if has_ca:
            cx = cx * ca_ref[0, 0, 0]
        y = xb[rows].astype(jnp.float32) + pr + cx * conv_scale
        ln2 = _ln(y, ln2w_ref[0], ln2b_ref[0]).astype(dt)
        h1 = jnp.dot(ln2, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = _gelu_exact(h1 + b1_ref[0]).astype(dt)
        h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
        y = y + h2 + b2_ref[0]
        o_ref[0, g * wsh:(g + 1) * wsh, :, :] = (
            y.reshape(wsh, wsw, c).astype(o_ref.dtype))


def fused_hab_block(
    x: jnp.ndarray,                 # [B, H, W, C] raw (pre-rolled) input
    conv_x: jnp.ndarray,            # [B, H, W, C] CAB branch (pre-rolled)
    ln1_w, ln1_b, ln2_w, ln2_b,     # [C] LayerNorm affines
    wqkv, bqkv, wproj, bproj,       # attention projections
    w1, b1, w2, b2,                 # MLP fc1/fc2
    bias: jnp.ndarray,              # [num_heads, N, N]
    mask,                           # [nW, N, N] shift mask or None
    window: Tuple[int, int],
    num_heads: int,
    conv_scale: float,
    cab_scale=None,                 # [B,1,1,C] CA gate applied to conv_x
    max_gh: int = 4,
    interpret: bool = False,
    mxu_dtype=None,
    in_shift: int = 0,
) -> jnp.ndarray:
    """One fused HAB pass (everything except the CAB convs): returns
    x + attn(LN1(x)) + conv_scale·conv_x + MLP(LN2(·)).

    For shifted blocks the caller rolls conv_x (cab_chain's folded store
    does it for free) and un-rolls the result — residuals commute with the
    roll, so doing the whole block in rolled coordinates is math-identical
    (models/hat.py HAB). With `in_shift` the X roll is folded in here too:
    x is passed UNROLLED and each window assembles from 4 wrap-around
    half-window quadrant refs (index-map modular arithmetic), saving the
    65 MB XLA roll per shifted HAB. Requires in_shift == wsh//2 == wsw//2
    and a mask (gh == 1).
    """
    b, h, w, c = x.shape
    wsh, wsw = window
    assert h % wsh == 0 and w % wsw == 0, (h, w, window)
    n = wsh * wsw
    hd = c // num_heads
    n_wr, n_wc = h // wsh, w // wsw
    has_mask = mask is not None
    if in_shift:
        assert has_mask and in_shift * 2 == wsh and in_shift * 2 == wsw, \
            (in_shift, window)
    # masked calls run gh=1 so the per-program merged bias type is exact
    # (gh was measured runtime-neutral — PERF.md r3 MAX_GH experiment)
    gh = 1 if has_mask else _pick_gh(n_wr, max_gh)
    mdt = _mxu_dtype(x.dtype, interpret, mxu_dtype)

    align = 32
    hdp = -(-hd // align) * align
    if hdp != hd:
        wqkv, bqkv, wproj = _align_heads(wqkv, bqkv, wproj, num_heads, hd, hdp)
    # matmul RHS weights travel in the MXU operand dtype (halves their
    # VMEM residency too); biases/LN affines stay f32
    wqkv, wproj, w1, w2 = (t.astype(mdt) for t in (wqkv, wproj, w1, w2))
    cp = num_heads * hdp
    hidden = w1.shape[1]

    grid = (b, n_wr // gh, n_wc)
    img_spec = pl.BlockSpec((1, gh * wsh, wsw, c),
                            lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    const = lambda *shape: (lambda bi, i, j: tuple(0 for _ in shape))
    vec = lambda m: pl.BlockSpec((1, m), const(0, 0), memory_space=pltpu.VMEM)
    f32 = lambda a: a.astype(jnp.float32)
    if has_mask:
        bias_arg = _merged_bias_mask(f32(bias), mask, n_wr, n_wc)
        bias_spec = pl.BlockSpec(
            (1, num_heads, n, n),
            lambda bi, i, j: (_type_index(i, j, n_wr, n_wc), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_arg = f32(bias)
        bias_spec = pl.BlockSpec((num_heads, n, n), const(0, 0, 0),
                                 memory_space=pltpu.VMEM)
    if in_shift:
        # x in 8-px half-window blocks; window (i,j) of roll(x, (-s,-s))
        # assembles from blocks (2i+1|2i+2, 2j+1|2j+2) mod the 8-grid.
        # x_ref becomes the TL quadrant; TR/BL/BR ride as trailing refs.
        nh8, nw8 = h // in_shift, w // in_shift
        quad = lambda ro, co: pl.BlockSpec(
            (1, in_shift, in_shift, c),
            lambda bi, i, j, ro=ro, co=co: (
                bi, (2 * i + 1 + ro) % nh8, (2 * j + 1 + co) % nw8, 0),
            memory_space=pltpu.VMEM)
        x_spec = quad(0, 0)
    else:
        x_spec = img_spec
    in_specs = [
        x_spec, img_spec,
        pl.BlockSpec((c, 3 * cp), const(0, 0), memory_space=pltpu.VMEM),
        vec(3 * cp),
        pl.BlockSpec((cp, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c),
        bias_spec,
        vec(c), vec(c), vec(c), vec(c),
        pl.BlockSpec((c, hidden), const(0, 0), memory_space=pltpu.VMEM),
        vec(hidden),
        pl.BlockSpec((hidden, c), const(0, 0), memory_space=pltpu.VMEM),
        vec(c),
    ]
    args = [x, conv_x, wqkv, bqkv.reshape(1, -1), wproj,
            f32(bproj).reshape(1, -1), bias_arg,
            f32(ln1_w).reshape(1, -1), f32(ln1_b).reshape(1, -1),
            f32(ln2_w).reshape(1, -1), f32(ln2_b).reshape(1, -1),
            w1, f32(b1).reshape(1, -1), w2, f32(b2).reshape(1, -1)]
    if in_shift:
        # TR / BL / BR quadrant views of the same x (trailing refs)
        for ro, co in ((0, 1), (1, 0), (1, 1)):
            in_specs.append(quad(ro, co))
            args.append(x)

    has_ca = cab_scale is not None
    if has_ca:
        in_specs.append(pl.BlockSpec((1, 1, 1, c),
                                     lambda bi, i, j: (bi, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(f32(cab_scale).reshape(-1, 1, 1, c))

    kernel = functools.partial(
        _kernel_hab, wsh=wsh, wsw=wsw, num_heads=num_heads, head_dim=hd,
        gh=gh, has_mask=has_mask, has_ca=has_ca,
        conv_scale=float(conv_scale), mdt=mdt, quad=bool(in_shift))
    flops_per = (2 * gh * n * c * (4 * cp + 2 * hidden)
                 + 2 * gh * num_heads * n * n * hdp * 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * int(np.prod(grid)),
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=int(np.prod(grid)) * gh * n * (num_heads * n
                                                           + hidden)),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(*args)


def _kernel_res_mlp(a_ref, s_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, o_ref, *, mdt):
    """y = a + s; out = y + MLP(LN(y)) — the transformer-block tail shared by
    OCAB (models/hat.py) and similar residual+FFN epilogues."""
    sh = a_ref.shape
    c = sh[-1]
    y = (a_ref[0].astype(jnp.float32) + s_ref[0].astype(jnp.float32))
    y2 = y.reshape(-1, c)
    dt = mdt
    ln = _ln(y2, lnw_ref[0], lnb_ref[0]).astype(dt)
    h1 = jnp.dot(ln, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = _gelu_exact(h1 + b1_ref[0]).astype(dt)
    h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
    out = y2 + h2 + b2_ref[0]
    o_ref[0] = out.reshape(sh[1:]).astype(o_ref.dtype)


def fused_residual_ln_mlp(a, shortcut, ln_w, ln_b, w1, b1, w2, b2,
                          interpret: bool = False, mxu_dtype=None):
    """Fused `y = a + shortcut; y + MLP(LN(y))` over [B,H,W,C] images: one
    HBM read of (a, shortcut), one write, MLP matmuls VMEM-resident."""
    b, h, w, c = a.shape
    mdt = _mxu_dtype(a.dtype, interpret, mxu_dtype)
    w1, w2 = w1.astype(mdt), w2.astype(mdt)
    hidden = w1.shape[1]
    # row-strip blocks ≈ ≤1.5 MB (f32) to leave VMEM room for the MLP
    target = max(1, (1_500_000 // (w * c * 4)))
    bh = 1
    for d in range(1, h + 1):
        if h % d == 0 and d <= target:
            bh = d
    grid = (b, h // bh)
    img_spec = pl.BlockSpec((1, bh, w, c), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    const = lambda *shape: (lambda bi, i: tuple(0 for _ in shape))
    vec = lambda m: pl.BlockSpec((1, m), const(0, 0), memory_space=pltpu.VMEM)
    f32 = lambda t: t.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel_res_mlp, mdt=mdt),
        grid=grid,
        in_specs=[
            img_spec, img_spec,
            vec(c), vec(c),
            pl.BlockSpec((c, hidden), const(0, 0), memory_space=pltpu.VMEM),
            vec(hidden),
            pl.BlockSpec((hidden, c), const(0, 0), memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * w * c * hidden,
            bytes_accessed=3 * a.size * a.dtype.itemsize,
            transcendentals=b * h * w * hidden),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(a, shortcut, f32(ln_w).reshape(1, -1), f32(ln_b).reshape(1, -1),
      w1, f32(b1).reshape(1, -1), w2, f32(b2).reshape(1, -1))


def _kernel_qkv(q_ref, k_ref, v_ref, bias_ref, *rest, wsh: int, wsw: int,
                num_heads: int, head_dim: int, gh: int, has_mask: bool,
                mdt):
    """Pre-projected q/k/v images (DAT rect-window branches: the qkv Dense
    and the output proj live outside because AIM consumes v / the branch
    concat, dat_arch.py:409-424)."""
    (o_ref,) = rest
    n = wsh * wsw
    c = q_ref.shape[-1]
    dt = mdt
    bias2 = bias_ref[0] if has_mask else bias_ref
    qb = q_ref[0].reshape(gh * n, c).astype(dt)
    kb = k_ref[0].reshape(gh * n, c).astype(dt)
    vb = v_ref[0].reshape(gh * n, c).astype(dt)
    scale = jnp.asarray(head_dim ** -0.5, dt)

    for g in range(gh):
        head_outs = []
        for h in range(num_heads):
            rows = slice(g * n, (g + 1) * n)
            cols = slice(h * head_dim, (h + 1) * head_dim)
            a = jax.lax.dot_general(qb[rows, cols] * scale, kb[rows, cols],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = a + bias2[h]
            a = jax.nn.softmax(a, axis=-1).astype(dt)
            head_outs.append(
                jnp.dot(a, vb[rows, cols], preferred_element_type=jnp.float32)
                .astype(dt))
        wout = jnp.concatenate(head_outs, axis=-1)  # [N, C]
        o_ref[0, g * wsh:(g + 1) * wsh, :, :] = (
            wout.reshape(wsh, wsw, c).astype(o_ref.dtype))


def fused_window_attention_qkv(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,  # [B, H, W, C] each
    bias: jnp.ndarray,              # [num_heads, N, N] (may be traced)
    mask: Optional[np.ndarray],     # [nW, N, N] shift mask or None
    window: Tuple[int, int],
    num_heads: int,
    max_gh: int = 4,
    interpret: bool = False,
    mxu_dtype=None,
) -> jnp.ndarray:
    """Fused MHA over pre-projected rect windows; returns [B, H, W, C]."""
    b, h, w, c = q.shape
    wsh, wsw = window
    assert h % wsh == 0 and w % wsw == 0, (h, w, window)
    n = wsh * wsw
    hd = c // num_heads
    n_wr, n_wc = h // wsh, w // wsw
    has_mask = mask is not None
    gh = 1 if has_mask else _pick_gh(n_wr, max_gh)
    mdt = _mxu_dtype(q.dtype, interpret, mxu_dtype)

    grid = (b, n_wr // gh, n_wc)
    img_spec = pl.BlockSpec((1, gh * wsh, wsw, c),
                            lambda bi, i, j: (bi, i, j, 0),
                            memory_space=pltpu.VMEM)
    if has_mask:
        bias_arg = _merged_bias_mask(bias.astype(jnp.float32), mask,
                                     n_wr, n_wc)
        bias_spec = pl.BlockSpec(
            (1, num_heads, n, n),
            lambda bi, i, j: (_type_index(i, j, n_wr, n_wc), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_arg = bias.astype(jnp.float32)
        bias_spec = pl.BlockSpec((num_heads, n, n),
                                 lambda bi, i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [img_spec, img_spec, img_spec, bias_spec]
    args = [q, k, v, bias_arg]

    kernel = functools.partial(
        _kernel_qkv, wsh=wsh, wsw=wsw, num_heads=num_heads, head_dim=hd,
        gh=gh, has_mask=has_mask, mdt=mdt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(np.prod(grid)) * 2 * gh * num_heads * n * n * hd * 2,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=int(np.prod(grid)) * gh * num_heads * n * n),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(*args)


def _kernel_xqkv(x_ref, wqkv_ref, bqkv_ref, bias_ref, *rest, wsh: int,
                 wsw: int, num_heads: int, head_dim: int, gh: int,
                 has_mask: bool, mdt):
    """Rect-window MHA with the qkv projection fused in: reads the full-C
    feature image, projects this branch's 3·co qkv columns in VMEM, and
    writes the co-wide attended image (no output projection — DAT's proj
    happens inside the fused AIM gates kernel, ops/pallas/aim.py)."""
    (o_ref,) = rest
    n = wsh * wsw
    cin = x_ref.shape[-1]
    co = wqkv_ref.shape[1] // 3
    dt = mdt
    bias2 = bias_ref[0] if has_mask else bias_ref
    xb = x_ref[0].reshape(gh * n, cin)
    qkv = jnp.dot(xb.astype(dt), wqkv_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(dt)
    scale = jnp.asarray(head_dim ** -0.5, dt)

    for g in range(gh):
        head_outs = []
        rows = slice(g * n, (g + 1) * n)
        for h in range(num_heads):
            q = qkv[rows, h * head_dim:(h + 1) * head_dim]
            k = qkv[rows, co + h * head_dim:co + (h + 1) * head_dim]
            v = qkv[rows, 2 * co + h * head_dim:2 * co + (h + 1) * head_dim]
            a = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = a + bias2[h]
            a = jax.nn.softmax(a, axis=-1).astype(dt)
            head_outs.append(jnp.dot(a, v, preferred_element_type=jnp.float32)
                             .astype(dt))
        wout = jnp.concatenate(head_outs, axis=-1)  # [N, co]
        o_ref[0, g * wsh:(g + 1) * wsh, :, :] = (
            wout.reshape(wsh, wsw, co).astype(o_ref.dtype))


def fused_window_attention_xqkv(
    x: jnp.ndarray,                 # [B, H, W, Cin] full-width feature image
    wqkv: jnp.ndarray,              # [Cin, 3·co] this branch's qkv columns
    bqkv: jnp.ndarray,              # [3·co]
    bias: jnp.ndarray,              # [num_heads, N, N] (may be traced)
    mask: Optional[np.ndarray],     # [nW, N, N] shift mask or None
    window: Tuple[int, int],
    num_heads: int,
    max_gh: int = 4,
    interpret: bool = False,
    mxu_dtype=None,
) -> jnp.ndarray:
    """DAT spatial-branch attention with the qkv Dense fused in: one HBM
    read of x per branch replaces the XLA qkv image (write + three
    half-width reads). Returns the co-wide pre-projection attended image.
    Replaces dat_arch.py:417-474's per-branch qkv split + windowed MHA."""
    b, h, w, cin = x.shape
    wsh, wsw = window
    assert h % wsh == 0 and w % wsw == 0, (h, w, window)
    n = wsh * wsw
    co = wqkv.shape[1] // 3
    hd = co // num_heads
    n_wr, n_wc = h // wsh, w // wsw
    has_mask = mask is not None
    gh = 1 if has_mask else _pick_gh(n_wr, max_gh)
    mdt = _mxu_dtype(x.dtype, interpret, mxu_dtype)
    wqkv = wqkv.astype(mdt)

    grid = (b, n_wr // gh, n_wc)
    img = lambda c_: pl.BlockSpec((1, gh * wsh, wsw, c_),
                                  lambda bi, i, j: (bi, i, j, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda *shape: (lambda bi, i, j: tuple(0 for _ in shape))
    if has_mask:
        bias_arg = _merged_bias_mask(bias.astype(jnp.float32), mask,
                                     n_wr, n_wc)
        bias_spec = pl.BlockSpec(
            (1, num_heads, n, n),
            lambda bi, i, j: (_type_index(i, j, n_wr, n_wc), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_arg = bias.astype(jnp.float32)
        bias_spec = pl.BlockSpec((num_heads, n, n), const(0, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        img(cin),
        pl.BlockSpec((cin, 3 * co), const(0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * co), const(0, 0), memory_space=pltpu.VMEM),
        bias_spec,
    ]
    args = [x, wqkv, bqkv.astype(jnp.float32).reshape(1, -1), bias_arg]

    kernel = functools.partial(
        _kernel_xqkv, wsh=wsh, wsw=wsw, num_heads=num_heads, head_dim=hd,
        gh=gh, has_mask=has_mask, mdt=mdt)
    flops_per = (2 * gh * n * cin * 3 * co
                 + 2 * gh * num_heads * n * n * hd * 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=img(co),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * int(np.prod(grid)),
            bytes_accessed=(x.size + b * h * w * co) * x.dtype.itemsize,
            transcendentals=int(np.prod(grid)) * gh * num_heads * n * n),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(*args)


def _kernel_oca(q_ref, *rest, ws: int, ows: int, num_heads: int,
                head_dim: int, mdt):
    kv_refs = rest[:18]
    wproj_ref, bproj_ref, bias_ref, o_ref = rest[18:]
    nq = ws * ws
    nk = ows * ows
    c = q_ref.shape[-1]
    dt = mdt
    # assemble the 24×24 kv window from 3×3 half-window views
    k_rows = [jnp.concatenate([kv_refs[r * 3 + s][0] for s in range(3)],
                              axis=1) for r in range(3)]
    kw = jnp.concatenate(k_rows, axis=0).reshape(nk, c).astype(dt)
    v_rows = [jnp.concatenate([kv_refs[9 + r * 3 + s][0] for s in range(3)],
                              axis=1) for r in range(3)]
    vw = jnp.concatenate(v_rows, axis=0).reshape(nk, c).astype(dt)
    qw = q_ref[0].reshape(nq, c).astype(dt)
    scale = jnp.asarray(head_dim ** -0.5, dt)

    head_outs = []
    for h in range(num_heads):
        cols = slice(h * head_dim, (h + 1) * head_dim)
        a = jax.lax.dot_general(qw[:, cols] * scale, kw[:, cols],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = a + bias_ref[h]
        a = jax.nn.softmax(a, axis=-1).astype(dt)
        head_outs.append(
            jnp.dot(a, vw[:, cols], preferred_element_type=jnp.float32)
            .astype(dt))
    wout = jnp.concatenate(head_outs, axis=-1)
    pr = jnp.dot(wout, wproj_ref[:], preferred_element_type=jnp.float32)
    pr = pr + bproj_ref[0]
    o_ref[0] = pr.reshape(ws, ws, c).astype(o_ref.dtype)


def fused_overlap_attention(
    q: jnp.ndarray,                 # [B, H, W, C] projected queries
    k: jnp.ndarray, v: jnp.ndarray,  # [B, H, W, C] projected keys/values
    wproj: jnp.ndarray, bproj: jnp.ndarray,
    bias: jnp.ndarray,              # [nh, ws², ows²] OCA rel-pos bias
    window: int, overlap: int, num_heads: int,
    interpret: bool = False,
    mxu_dtype=None,
) -> jnp.ndarray:
    """OCAB inner attention: ws×ws queries over (ws+overlap)² overlapping
    keys/values (hat_arch.py:352-438), fused with the output projection.

    The overlapping k/v windows are fed as NINE half-window-strided views of
    the padded images (block (ws/2, ws/2), index maps (2i+r, 2j+s)) and
    re-assembled in VMEM — overlapping reads without halo DMA (which this
    Mosaic build rejects at non-128 lane dims), without materializing the
    2.25× unfolded kv tensor, and with per-window blocks small enough to fit
    VMEM at any image width.
    """
    b, h, w, c = q.shape
    ws = window
    ows = ws + overlap
    p = overlap // 2
    assert h % ws == 0 and w % ws == 0 and ws % 2 == 0 and overlap == ws // 2
    n_wr, n_wc = h // ws, w // ws
    hs = ws // 2  # half-window view size; 3×3 views cover (ws+overlap)²
    mdt = _mxu_dtype(q.dtype, interpret, mxu_dtype)
    wproj = wproj.astype(mdt)

    kp = jnp.pad(k, [(0, 0), (p, p), (p, p), (0, 0)])
    vp = jnp.pad(v, [(0, 0), (p, p), (p, p), (0, 0)])

    grid = (b, n_wr, n_wc)
    view = lambda r, s: pl.BlockSpec(
        (1, hs, hs, c),
        lambda bi, i, j, r=r, s=s: (bi, 2 * i + r, 2 * j + s, 0),
        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, ws, ws, c),
                             lambda bi, i, j: (bi, i, j, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [view(r, s) for r in range(3) for s in range(3)]  # k
    in_specs += [view(r, s) for r in range(3) for s in range(3)]  # v
    in_specs += [
        pl.BlockSpec((c, c), lambda bi, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, ws * ws, ows * ows),
                     lambda bi, i, j: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _kernel_oca, ws=ws, ows=ows, num_heads=num_heads,
        head_dim=c // num_heads, mdt=mdt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, ws, c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(np.prod(grid)) * (
                2 * num_heads * ws * ws * ows * ows * (c // num_heads) * 2
                + 2 * ws * ws * c * c),
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=int(np.prod(grid)) * num_heads
            * ws * ws * ows * ows),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(q, *([kp] * 9), *([vp] * 9), wproj, bproj.reshape(1, -1),
      bias.astype(jnp.float32))


def fused_window_attention(
    x: jnp.ndarray,                 # [B, H, W, C] (already shift-rolled)
    wqkv: jnp.ndarray,              # [C, 3C]
    bqkv: jnp.ndarray,              # [3C]
    wproj: jnp.ndarray,             # [C, C]
    bproj: jnp.ndarray,             # [C]
    bias: jnp.ndarray,              # [num_heads, N, N] rel-pos bias
    mask: Optional[np.ndarray],     # [nW, N, N] shift mask or None
    window: Tuple[int, int],
    num_heads: int,
    max_gh: int = 4,
    align: int = 32,
    interpret: bool = False,
    mxu_dtype=None,
) -> jnp.ndarray:
    """One fused (S)W-MSA pass; returns the attended image [B, H, W, C]."""
    b, h, w, c = x.shape
    wsh, wsw = window
    assert h % wsh == 0 and w % wsw == 0, (h, w, window)
    n = wsh * wsw
    hd = c // num_heads
    n_wr, n_wc = h // wsh, w // wsw
    has_mask = mask is not None
    gh = 1 if has_mask else _pick_gh(n_wr, max_gh)
    mdt = _mxu_dtype(x.dtype, interpret, mxu_dtype)

    hdp = -(-hd // align) * align if align else hd
    if hdp != hd:
        wqkv, bqkv, wproj = _align_heads(wqkv, bqkv, wproj, num_heads, hd, hdp)
    wqkv, wproj = wqkv.astype(mdt), wproj.astype(mdt)
    cp = num_heads * hdp

    grid = (b, n_wr // gh, n_wc)
    const = lambda *shape: (lambda bi, i, j: tuple(0 for _ in shape))
    if has_mask:
        bias_arg = _merged_bias_mask(bias.astype(jnp.float32), mask,
                                     n_wr, n_wc)
        bias_spec = pl.BlockSpec(
            (1, num_heads, n, n),
            lambda bi, i, j: (_type_index(i, j, n_wr, n_wc), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_arg = bias.astype(jnp.float32)
        bias_spec = pl.BlockSpec((num_heads, n, n), const(0, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, gh * wsh, wsw, c), lambda bi, i, j: (bi, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * cp), const(0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * cp), const(0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, c), const(0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const(0, 0), memory_space=pltpu.VMEM),
        bias_spec,
    ]
    args = [x, wqkv, bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1),
            bias_arg]

    kernel = functools.partial(
        _kernel, wsh=wsh, wsw=wsw, num_heads=num_heads, head_dim=hd,
        gh=gh, has_mask=has_mask, mdt=mdt)
    flops_per = 2 * gh * n * c * 4 * cp + 2 * gh * num_heads * n * n * hdp * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, gh * wsh, wsw, c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per * int(np.prod(grid)),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=int(np.prod(grid)) * gh * num_heads * n * n),
        compiler_params=MOSAIC_PARAMS,
        interpret=interpret,
    )(*args)
