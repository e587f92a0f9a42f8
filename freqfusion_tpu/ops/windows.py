"""Window-attention utilities shared by the DAT and HAT experts.

All table/mask builders run in **numpy at trace time** (shapes are static
under jit), so the device program sees them as constants — no data-dependent
control flow, no `.item()`; the TPU-first replacement for the reference's
buffer registration + on-the-fly mask recompute (dat_arch.py:426-489,
hat_arch.py:882-940).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, hs: int, ws: int) -> jnp.ndarray:
    """[B,H,W,C] → [B*nW, hs*ws, C] (row-major windows, torch ordering)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // hs, hs, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, hs * ws, c)


def window_reverse(wins: jnp.ndarray, hs: int, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, hs*ws, C] → [B,H,W,C]."""
    c = wins.shape[-1]
    b = wins.shape[0] // ((h // hs) * (w // ws))
    x = wins.reshape(b, h // hs, w // ws, hs, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def relative_position_index(hs: int, ws: int) -> np.ndarray:
    """Swin-style relative position index table, [hs*ws, hs*ws] int32.

    Index into a (2hs-1)(2ws-1) bias table; ordering matches torch's
    meshgrid(indexing='ij') + flatten construction.
    """
    coords = np.stack(np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += hs - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def relative_coords_table(hs: int, ws: int) -> np.ndarray:
    """All relative (dy,dx) offsets, [(2hs-1)*(2ws-1), 2] float32 — the input
    the DAT DynamicPosBias MLP is evaluated on."""
    bh = np.arange(1 - hs, hs)
    bw = np.arange(1 - ws, ws)
    grid = np.stack(np.meshgrid(bh, bw, indexing="ij"))
    return grid.reshape(2, -1).T.astype(np.float32)


def extract_overlapping_windows(x: jnp.ndarray, win: int, overlap: int) -> jnp.ndarray:
    """[B,H,W,C] → [B*nW, (win+overlap)², C] overlapping windows.

    TPU-native replacement for the reference OCAB's `nn.Unfold(kernel=ows,
    stride=win, pad=(ows-win)/2)` (hat_arch.py:377,408-410): zero-pad by
    overlap/2 per side, then assemble each in-window offset r as ONE strided
    slice `xp[:, r::win][:nh]` — 2·ows static strided slices total, no
    gather ops (XLA gathers on this backend are pathologically slow; the
    round-1 `jnp.take` version cost ~45 ms per OCAB call).  Window ordering
    is row-major and the per-window layout is [owh, oww, C], identical to
    the reference's rearrange to '(owh oww) ch'.
    """
    b, h, w, c = x.shape
    ows = win + overlap
    p = overlap // 2
    xp = jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)])
    nh, nw = h // win, w // win
    # rows: stack offset-r strided views → [B, nh, ows, Wp, C]
    span_h = win * (nh - 1) + 1
    xr = jnp.stack([xp[:, r:r + span_h:win] for r in range(ows)], axis=2)
    # cols: same along W → [B, nh, ows, nw, ows, C]
    span_w = win * (nw - 1) + 1
    xc = jnp.stack([xr[:, :, :, s:s + span_w:win] for s in range(ows)], axis=4)
    xc = jnp.transpose(xc, (0, 1, 3, 2, 4, 5))  # [B, nh, nw, owh, oww, C]
    return xc.reshape(b * nh * nw, ows * ows, c)


@functools.lru_cache(maxsize=None)
def _axis_onehot(s: int) -> np.ndarray:
    """S[q, k, a] = 1 iff a == q - k + s - 1 — the per-axis selector of the
    separable relative-position expansion, [s, s, 2s-1] float32."""
    q = np.arange(s)[:, None, None]
    k = np.arange(s)[None, :, None]
    a = np.arange(2 * s - 1)[None, None, :]
    return (a == q - k + s - 1).astype(np.float32)


def swin_bias_from_table(table: jnp.ndarray, hs: int, ws: int) -> jnp.ndarray:
    """[(2hs-1)(2ws-1), nh] bias table → [nh, hs·ws, hs·ws] bias matrix,
    built as a separable one-hot einsum instead of `table[rpi]`.

    XLA gathers are pathologically slow on this TPU backend (~5 ms for the
    65k-element window-bias gather — 72 of them accounted for most of
    HAT-L's device time in round 1). The relative-position structure is a
    2-D Toeplitz pattern, separable per axis: bias[h, qy qx, ky kx] =
    img[qy-ky+hs-1, qx-kx+ws-1, h] = Σ_ab Sy[qy,ky,a]·Sx[qx,kx,b]·img[a,b,h]
    with Sy/Sx trace-time one-hot constants. One einsum replaces the r3
    stack-of-flipped-slices build (measured 1.5 ms/call at ws=16 — layout-
    bound; 144 calls/image across HAT+DAT). HIGHEST precision keeps the
    one-hot contraction exact (DEFAULT would truncate table values to bf16).
    """
    nh = table.shape[-1]
    img = table.reshape(2 * hs - 1, 2 * ws - 1, nh)
    sy = jnp.asarray(_axis_onehot(hs), table.dtype)
    sx = jnp.asarray(_axis_onehot(ws), table.dtype)
    out = jnp.einsum("abh,yka,xsb->hyxks", img, sy, sx,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    n = hs * ws
    return out.reshape(nh, n, n)


def oca_bias_from_table(table: jnp.ndarray, ws: int, wse: int) -> jnp.ndarray:
    """[(ws+wse-1)², nh] OCAB bias table → [nh, ws², wse²], gather-free.

    The OCA index is (ky-qy+ws-wse+1) mod D per axis (D = ws+wse-1; the
    reference's construction wraps negatives, bijectively since the offset
    range spans exactly D integers) — a roll by wse-2 linearizes it into
    ascending contiguous slices.
    """
    d = ws + wse - 1
    nh = table.shape[-1]
    # the wrap is on the FLAT index (bijective: the offset range spans
    # exactly d² integers), so linearize with a flat roll, then reshape
    img = jnp.roll(table, (wse - 2) * (d + 1), axis=0).reshape(d, d, nh)
    rows = jnp.stack([img[ws - 1 - qy:ws - 1 - qy + wse]
                      for qy in range(ws)], 0)
    full = jnp.stack([rows[:, :, ws - 1 - qx:ws - 1 - qx + wse]
                      for qx in range(ws)], 1)
    return jnp.transpose(full.reshape(ws, ws, wse, wse, nh)
                         .reshape(ws * ws, wse * wse, nh), (2, 0, 1))


@functools.lru_cache(maxsize=None)
def oca_relative_position_index(ws: int, wse: int) -> np.ndarray:
    """OCAB relative position index, [ws², wse²] int32: query coords in the
    ws×ws window vs key coords in the wse×wse extended window."""
    ori = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    ext = np.stack(np.meshgrid(np.arange(wse), np.arange(wse), indexing="ij")).reshape(2, -1)
    rel = ext[:, None, :] - ori[:, :, None]  # [2, ws², wse²]
    rel = rel.transpose(1, 2, 0)
    rel += ws - wse + 1
    rel[:, :, 0] *= ws + wse - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(h: int, w: int, hs: int, ws: int, sh: int, sw: int) -> np.ndarray:
    """Shifted-window attention mask, [nW, hs*ws, hs*ws] float32 {0,-100}.

    Labels image regions by shift boundary, partitions into (hs,ws) windows,
    and masks cross-region pairs — semantics of Swin/DAT mask construction.
    """
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hsl in (slice(0, h - hs), slice(h - hs, h - sh), slice(h - sh, h)):
        for wsl in (slice(0, w - ws), slice(w - ws, w - sw), slice(w - sw, w)):
            img[hsl, wsl] = cnt
            cnt += 1
    img = img.reshape(h // hs, hs, w // ws, ws).transpose(0, 2, 1, 3)
    wins = img.reshape(-1, hs * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)
