"""Common layout/normalization ops (NHWC, TPU-friendly).

The framework is NHWC end-to-end (channels-last is the native TPU layout);
torch-side NCHW semantics from the reference are mapped here once so model
code never thinks about layout again.
"""

from __future__ import annotations

import functools as _functools
import jax
import jax.numpy as jnp


def channel_layernorm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                      eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the channel axis of NHWC tensors.

    Equivalent to the reference's `LayerNorm2d` (biased variance over C,
    cf. /root/reference/src/models/nafnet/nafnet_arch.py:26-41) but on the
    last axis, which XLA fuses into neighbouring elementwise ops.
    """
    u = jnp.mean(x, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(x - u), axis=-1, keepdims=True)
    x = (x - u) * jax.lax.rsqrt(s + eps)
    return x * weight + bias


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """PixelShuffle on NHWC with torch channel ordering.

    torch PixelShuffle on NCHW views C as (C_out, r, r); in NHWC that is a
    reshape to [..., H, W, C_out, r, r] followed by interleaving r into H/W.
    """
    *lead, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(*lead, h, w, co, r, r)
    # [..., H, W, co, rh, rw] -> [..., H, rh, W, rw, co]
    perm = list(range(len(lead))) + [len(lead) + i for i in (0, 3, 1, 4, 2)]
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, h * r, w * r, co)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle` (torch channel ordering)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // r, r, w // r, r, c)
    perm = list(range(len(lead))) + [len(lead) + i for i in (0, 2, 4, 1, 3)]
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, h // r, w // r, c * r * r)


def pad_to_multiple(x: jnp.ndarray, mult: int, mode: str = "reflect"):
    """Pad H/W of NHWC up to a multiple of `mult` (bottom/right, like the
    reference's pad-to-window, expert_loader.py:63-91 / nafnet_arch.py:220).

    Returns (padded, (orig_h, orig_w)).
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        cfg = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, cfg, mode=mode if mode != "zero" else "constant")
    return x, (h, w)


def same_pad(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Symmetric zero 'same' padding for odd kernels on NHWC."""
    ph, pw = kh // 2, kw // 2
    cfg = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    return jnp.pad(x, cfg)


def gaussian_1d(size: int, sigma: float):
    """Normalized 1-D gaussian taps, float32 — THE construction every
    gaussian window in the repo derives from (SSIM loss, edge pyramid,
    blur_band_matrix), so the three can never drift apart."""
    import numpy as np
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@_functools.lru_cache(maxsize=None)
def blur_band_matrix(n: int, size: int, sigma: float):
    """[n, n] banded Toeplitz matrix of a 1-D gaussian with zero-padded
    'same' conv semantics (border rows just lose mass — torch
    F.conv2d(padding=size//2)). m[i, j] = g[i - j + size//2]."""
    import numpy as np
    g = gaussian_1d(size, sigma)
    pad = size // 2
    m = np.zeros((n, n), np.float32)
    for k, gk in enumerate(g):
        off = k - pad
        idx = np.arange(max(0, -off), min(n, n - off))
        m[idx + off, idx] += gk
    return m


def gaussian_blur_matmul(x: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of NHWC images as two banded-Toeplitz
    MATMULS over the spatial axes (r5). Depthwise convs on few-channel
    images run at C/128 lane utilization and their VJP lowers to
    conv-transpose; this form keeps both directions on the MXU with
    B·W·C-row matmuls. Numerically the zero-padded 'same' depthwise conv
    of the outer-product window (ssim regression test pins it)."""
    mh = jnp.asarray(blur_band_matrix(x.shape[1], size, sigma), x.dtype)
    mw = jnp.asarray(blur_band_matrix(x.shape[2], size, sigma), x.dtype)
    y = jnp.tensordot(x, mh, axes=[[1], [0]],
                      precision=jax.lax.Precision.HIGHEST)   # [B,W,C,H']
    y = jnp.tensordot(y, mw, axes=[[1], [0]],
                      precision=jax.lax.Precision.HIGHEST)   # [B,C,H',W']
    return jnp.transpose(y, (0, 2, 3, 1))
