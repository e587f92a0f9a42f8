"""Block DCT-II utilities (8×8, JPEG-style zigzag banding).

TPU-first design: instead of the reference's per-block D·X·Dᵀ matmul pair +
mask + inverse pair (4 small 8×8 matmuls per band,
multi_domain_frequency.py:150-190), each fixed band-projection is folded into
a single precomputed 64×64 operator  M_b = (D⊗D)ᵀ · diag(mask_b) · (D⊗D), and
all bands are evaluated with ONE [..,64] × [64, bands·64] matmul that maps
straight onto the MXU.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def zigzag_indices(n: int = 8) -> np.ndarray:
    """JPEG zigzag scan order of an n×n block, [n,n] int32 (0 = DC)."""
    out = np.zeros((n, n), dtype=np.int32)
    i = j = 0
    for idx in range(n * n):
        out[i, j] = idx
        if (i + j) % 2 == 0:  # moving up-right
            if j == n - 1:
                i += 1
            elif i == 0:
                j += 1
            else:
                i -= 1
                j += 1
        else:  # moving down-left
            if i == n - 1:
                j += 1
            elif j == 0:
                i += 1
            else:
                i += 1
                j -= 1
    return out


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int = 8) -> np.ndarray:
    """Orthonormal DCT-II matrix, [n,n] float32 (Dᵀ = D⁻¹)."""
    d = np.zeros((n, n), dtype=np.float64)
    for k in range(n):
        for i in range(n):
            if k == 0:
                d[k, i] = 1.0 / math.sqrt(n)
            else:
                d[k, i] = math.sqrt(2.0 / n) * math.cos(
                    math.pi * k * (2 * i + 1) / (2 * n))
    return d.astype(np.float32)


@functools.lru_cache(maxsize=None)
def band_masks_thirds(n: int = 8):
    """(low, mid, high) zigzag-third masks (multi_domain_frequency.py:100-120)."""
    z = zigzag_indices(n)
    total = n * n
    low = (z < total // 3).astype(np.float32)
    high = (z >= 2 * total // 3).astype(np.float32)
    mid = 1.0 - low - high
    return low, mid, high


@functools.lru_cache(maxsize=None)
def band_masks_ratio(n: int, low_ratio: float, high_ratio: float):
    """(low, mid, high) masks with idx < total·low → low, idx ≥ total·(1-high)
    → high (frequency_decomposition.py:133-170 semantics)."""
    z = zigzag_indices(n)
    total = n * n
    lo_t = int(total * low_ratio)
    hi_t = int(total * (1.0 - high_ratio))
    low = (z < lo_t).astype(np.float32)
    high = (z >= hi_t).astype(np.float32)
    mid = (1.0 - low - high).clip(0.0)
    return low, mid, high


@functools.lru_cache(maxsize=None)
def band_operator(n: int, masks_key: str, low_ratio: float = 0.25,
                  high_ratio: float = 0.25) -> np.ndarray:
    """Fused [n², bands·n²] operator: vec(block) → concat of per-band
    spatially-reconstructed blocks."""
    if masks_key == "thirds":
        masks = band_masks_thirds(n)
    else:
        masks = band_masks_ratio(n, low_ratio, high_ratio)
    d = dct_matrix(n).astype(np.float64)
    kmat = np.kron(d, d)  # vec(D X Dᵀ) = (D⊗D) vec(X), row-major vec
    ops = [kmat.T @ np.diag(m.reshape(-1).astype(np.float64)) @ kmat for m in masks]
    return np.concatenate(ops, axis=1).astype(np.float32)


def blockify(x: jnp.ndarray, n: int = 8) -> jnp.ndarray:
    """NHWC (H,W multiples of n) → [B, nH, nW, C, n²] row-major blocks."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // n, n, w // n, n, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(b, h // n, w // n, c, n * n)


def unblockify(xb: jnp.ndarray, n: int = 8) -> jnp.ndarray:
    """[B, nH, nW, C, n²] → NHWC."""
    b, nh, nw, c, _ = xb.shape
    x = xb.reshape(b, nh, nw, c, n, n)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, nh * n, nw * n, c)


def reflect_pad_to_block(x: jnp.ndarray, n: int = 8):
    h, w = x.shape[1], x.shape[2]
    ph = (n - h % n) % n
    pw = (n - w % n) % n
    if ph or pw:
        x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="reflect")
    return x, (h, w)


def block_dct_bands(x: jnp.ndarray, operator: np.ndarray, n: int = 8,
                    num_bands: int = 3) -> Sequence[jnp.ndarray]:
    """Decompose NHWC into `num_bands` spatial band images with one matmul."""
    xp, (h, w) = reflect_pad_to_block(x, n)
    blocks = blockify(xp, n)
    out = jnp.einsum("bijcv,vu->bijcu", blocks,
                     jnp.asarray(operator).astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    bands = []
    for k in range(num_bands):
        band = unblockify(out[..., k * n * n:(k + 1) * n * n], n)
        bands.append(band[:, :h, :w, :])
    return bands


def dct2d(blocks: jnp.ndarray, n: int = 8) -> jnp.ndarray:
    """Forward 2-D DCT of [..., n, n] blocks: D·X·Dᵀ."""
    d = jnp.asarray(dct_matrix(n))
    return jnp.einsum("ka,...ab,lb->...kl", d, blocks, d,
                      preferred_element_type=jnp.float32).astype(blocks.dtype)


def idct2d(coeffs: jnp.ndarray, n: int = 8) -> jnp.ndarray:
    """Inverse 2-D DCT of [..., n, n] coefficients: Dᵀ·Y·D."""
    d = jnp.asarray(dct_matrix(n))
    return jnp.einsum("ka,...kl,lb->...ab", d, coeffs, d,
                      preferred_element_type=jnp.float32).astype(coeffs.dtype)
