"""Matmul-based 2-D real FFT (ortho-normalized), TPU-native.

XLA's FFT op is unimplemented/unstable on this TPU backend, and the sizes the
framework transforms are tile-sized (≤ a few hundred per axis), where a dense
DFT-by-matmul runs on the MXU faster than a butterfly would on the VPU.  All
arithmetic is real (cos/sin factor matrices built in numpy at trace time), so
it jits, differentiates and shards like any other matmul.

Matches `torch.fft.rfft2(x, norm='ortho')` / `irfft2(. , s, norm='ortho')` on
the (H, W) axes of NHWC tensors, returning a (real, imag) pair instead of a
complex array.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """cos/sin DFT matrices [n, n] float32 (angle 2π·k·f/n)."""
    k = np.arange(n)[:, None]
    f = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * f / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _half_weights(n: int) -> np.ndarray:
    """Spectrum-doubling weights for the half spectrum of length n//2+1."""
    nf = n // 2 + 1
    w = np.full(nf, 2.0, dtype=np.float32)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    return w


def fft2(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ortho full complex FFT over the (H, W) axes of a real [B,H,W,C]
    tensor → (re, im), each [B,H,W,C]. Used by the FFT training loss."""
    b, h, w, c = x.shape
    cw, sw = map(jnp.asarray, _dft_mats(w))
    inv_sw = 1.0 / np.sqrt(w)
    re1 = jnp.einsum("bhwc,wf->bhfc", x, cw) * inv_sw
    im1 = -jnp.einsum("bhwc,wf->bhfc", x, sw) * inv_sw
    ch, sh = map(jnp.asarray, _dft_mats(h))
    inv_sh = 1.0 / np.sqrt(h)
    re = (jnp.einsum("bhfc,hg->bgfc", re1, ch)
          + jnp.einsum("bhfc,hg->bgfc", im1, sh)) * inv_sh
    im = (jnp.einsum("bhfc,hg->bgfc", im1, ch)
          - jnp.einsum("bhfc,hg->bgfc", re1, sh)) * inv_sh
    return re, im


def fftshift2(x: jnp.ndarray) -> jnp.ndarray:
    """torch.fft.fftshift over the (H, W) axes of [B,H,W,C]."""
    return jnp.roll(x, (x.shape[1] // 2, x.shape[2] // 2), axis=(1, 2))


def rfft2(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ortho rFFT over the (H, W) axes of [B,H,W,C] → (re, im), each
    [B, H, W//2+1, C]."""
    b, h, w, c = x.shape
    nf = w // 2 + 1
    cw, sw = _dft_mats(w)
    cw, sw = jnp.asarray(cw[:, :nf]), jnp.asarray(sw[:, :nf])
    inv_sw = 1.0 / np.sqrt(w)
    # rFFT along W: e^{-iθ} = cos − i·sin
    re1 = jnp.einsum("bhwc,wf->bhfc", x, cw) * inv_sw
    im1 = -jnp.einsum("bhwc,wf->bhfc", x, sw) * inv_sw
    # full FFT along H
    ch, sh = map(jnp.asarray, _dft_mats(h))
    inv_sh = 1.0 / np.sqrt(h)
    re = (jnp.einsum("bhfc,hg->bgfc", re1, ch)
          + jnp.einsum("bhfc,hg->bgfc", im1, sh)) * inv_sh
    im = (jnp.einsum("bhfc,hg->bgfc", im1, ch)
          - jnp.einsum("bhfc,hg->bgfc", re1, sh)) * inv_sh
    return re, im


def irfft2(re: jnp.ndarray, im: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Ortho inverse of :func:`rfft2` → [B, h, w, C] real."""
    # inverse full FFT along H: e^{+iθ}
    ch, sh = map(jnp.asarray, _dft_mats(h))
    inv_sh = 1.0 / np.sqrt(h)
    re1 = (jnp.einsum("bgfc,hg->bhfc", re, ch)
           - jnp.einsum("bgfc,hg->bhfc", im, sh)) * inv_sh
    im1 = (jnp.einsum("bgfc,hg->bhfc", im, ch)
           + jnp.einsum("bgfc,hg->bhfc", re, sh)) * inv_sh
    # inverse rFFT along W from the weighted half spectrum
    nf = w // 2 + 1
    cw, sw = _dft_mats(w)
    wts = _half_weights(w)
    cw = jnp.asarray(cw[:, :nf] * wts[None, :])
    sw = jnp.asarray(sw[:, :nf] * wts[None, :])
    inv_sw = 1.0 / np.sqrt(w)
    # Re((re+i·im)·e^{+iθ}) = re·cosθ − im·sinθ (conjugate pairs fold into wts)
    return (jnp.einsum("bhfc,wf->bhwc", re1, cw)
            - jnp.einsum("bhfc,wf->bhwc", im1, sw)) * inv_sw
