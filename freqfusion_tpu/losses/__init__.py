"""Training losses — the weight-driven combined loss of the reference.

Re-design of /root/reference/src/losses/perceptual_loss.py as pure jax
functions: L1 / L2 / Charbonnier / SSIM / FFT (ortho fft2 + fftshift,
magnitude + 0.1·phase, radial 2× high-freq weighting) / SWT (stationary
wavelet via dilated depthwise convs, band weights a=0.5 h=1.5 v=1.5 d=2.0) /
Sobel edge — dispatched by `CombinedLoss`, which computes a component only
when its weight > 0 (perceptual_loss.py:1228-1279) and swaps weights per
training stage (`set_weights`).

VGG and CLIP perceptual losses require pretrained backbones; when none is
reachable (zero-egress env) `CombinedLoss` mirrors the reference's
graceful-degradation ladder (SWT→FFT, perceptual_loss.py:1266-1274) by
redirecting their weight to the FFT loss with a warning. Both go live the
moment weights exist: FREQFUSION_VGG19_WEIGHTS / FREQFUSION_CLIP_WEIGHTS,
or pass vgg_loss= / clip_loss= (reference use_clip dispatch,
perceptual_loss.py:1087-1098, 1228-1279).
"""

from __future__ import annotations

import functools
import warnings
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft import fft2, fftshift2

# pywt wavelet decomposition filters. haar/db4 are the shipped-recipe pair
# (pinned published constants); every other dbN is constructed on demand —
# see wavelet_filters below. The reference accepts any pywt wavelet name
# (perceptual_loss.py:625-682); pywt isn't installed here, so the Daubechies
# construction itself is implemented.
_WAVELETS = {
    "haar": ([0.7071067811865476, 0.7071067811865476],
             [-0.7071067811865476, 0.7071067811865476]),
    "db4": ([-0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
             -0.18703481171888114, -0.027983769416983849, 0.63088076792959036,
             0.71484657055291582, 0.23037781330885523],
            [-0.23037781330885523, 0.71484657055291582, -0.63088076792959036,
             -0.027983769416983849, 0.18703481171888114, 0.030841381835986965,
             -0.032883011666982945, -0.010597401784997278]),
}


@functools.lru_cache(maxsize=None)
def wavelet_filters(name: str):
    """(dec_lo, dec_hi) for a pywt wavelet name, matching pywt's layout.

    haar/db4 come from the pinned tables above; any other ``dbN`` (N≤20) is
    built by the standard Daubechies construction — spectral factorization
    of the half-band polynomial P(y)=Σ C(N-1+k,k)·yᵏ, keeping the roots
    inside the unit circle (minimal phase), N zeros at z=-1, filter
    normalized to Σh=√2 — which is exactly how the published tables are
    generated. sym1-sym3 alias db1-db3 (identical filters); higher symlets
    differ only by root *selection* and are not tabulated here (the recipe
    uses db4, reference train_config).
    """
    if name in _WAVELETS:
        return _WAVELETS[name]
    alias = {"db1": "haar", "sym1": "haar", "sym2": "db2", "sym3": "db3"}
    if name in alias:
        return wavelet_filters(alias[name])
    import re as _re
    m = _re.fullmatch(r"db(\d+)", name)
    if not m or not 1 <= int(m.group(1)) <= 20:
        raise ValueError(
            f"unsupported wavelet {name!r}: haar, dbN (N<=20) or sym1-sym3")
    return _daubechies(int(m.group(1)))


def _daubechies(n: int):
    """Minimal-phase Daubechies-n (dec_lo, dec_hi), pywt layout."""
    # P(y): binomial coefficients C(N-1+k, k), k = 0..N-1 (highest first)
    from math import comb
    p = np.array([comb(n - 1 + k, k) for k in range(n - 1, -1, -1)], float)
    rec_lo = np.poly1d([1.0])
    for _ in range(n):                       # (1+z)^N factor
        rec_lo = rec_lo * np.poly1d([1.0, 1.0])
    roots_y = np.roots(p) if n > 1 else []
    for y0 in roots_y:
        # y = (2 - z - 1/z)/4  →  z² − (2−4y)z + 1 = 0; keep |z| < 1
        zs = np.roots([1.0, -(2.0 - 4.0 * y0), 1.0])
        rec_lo = rec_lo * np.poly1d([1.0, -zs[np.argmin(np.abs(zs))]])
    h = np.real(rec_lo.coeffs)
    h = h * (np.sqrt(2.0) / h.sum())
    dec_lo = h[::-1]
    dec_hi = np.array([(-1.0) ** (k + 1) * dec_lo[len(h) - 1 - k]
                       for k in range(len(h))])
    return (dec_lo.tolist(), dec_hi.tolist())


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def charbonnier_loss(pred, target, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def ssim_loss(pred, target, window_size: int = 11):
    """1 − mean SSIM with an 11×11 σ=1.5 window, zero-padded 'same' conv
    (perceptual_loss.py:197-291 semantics)."""
    c = pred.shape[-1]
    win = jnp.asarray(_gaussian_window(window_size))[:, :, None, None]
    win = jnp.tile(win, (1, 1, 1, c))
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, win, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = filt(pred), filt(target)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(pred * pred) - mu1_sq
    s2 = filt(target * target) - mu2_sq
    s12 = filt(pred * target) - mu12
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return 1.0 - jnp.mean(smap)


@functools.lru_cache(maxsize=None)
def _radial_weights(h: int, w: int, high_weight: float) -> np.ndarray:
    cy, cx = h // 2, w // 2
    yy, xx = np.meshgrid(np.arange(h) - cy, np.arange(w) - cx, indexing="ij")
    dist = np.sqrt(xx**2 + yy**2) / np.sqrt(cy**2 + cx**2)
    return (1.0 + (high_weight - 1.0) * dist).astype(np.float32)


def fft_loss(pred, target, high_freq_weight: float = 2.0):
    """L1 on centered spectrum magnitude + 0.1·phase, radially weighted."""
    pre, pim = fft2(pred)
    tre, tim = fft2(target)
    pre, pim, tre, tim = map(fftshift2, (pre, pim, tre, tim))
    pmag = jnp.sqrt(pre**2 + pim**2 + 1e-12)
    tmag = jnp.sqrt(tre**2 + tim**2 + 1e-12)
    pphase = jnp.arctan2(pim, pre)
    tphase = jnp.arctan2(tim, tre)
    wts = jnp.asarray(_radial_weights(pred.shape[1], pred.shape[2],
                                      high_freq_weight))[None, :, :, None]
    mag = jnp.mean(jnp.abs(pmag - tmag) * wts)
    phase = jnp.mean(jnp.abs(pphase - tphase) * wts)
    return mag + 0.1 * phase


def _swt_coeffs(x, wavelet: str, level: int):
    """Stationary wavelet coefficients via dilated depthwise convs with
    reflect padding (the reference's GPU path, perceptual_loss.py:684-733)."""
    lo, hi = wavelet_filters(wavelet)
    k = len(lo)
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    # 2-D filters [k,k,1,4C]: LL, LH, HL, HH per input channel
    ll = np.outer(lo, lo)
    lh = np.outer(hi, lo)  # torch: lo.unsqueeze(0)*hi.unsqueeze(1) → rows hi
    hl = np.outer(lo, hi)
    hh = np.outer(hi, hi)
    c = x.shape[-1]
    h, w = x.shape[1], x.shape[2]
    base = np.stack([ll, lh, hl, hh], axis=-1)  # [k,k,4]

    coeffs = []
    current = x
    for lvl in range(level):
        dil = 2 ** lvl
        pad = (k - 1) * dil
        xp = jnp.pad(current, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                     mode="reflect")
        kern = jnp.asarray(base)[:, :, None, :]            # [k,k,1,4]
        kern = jnp.tile(kern, (1, 1, 1, c)).reshape(k, k, 1, 4 * c)
        out = jax.lax.conv_general_dilated(
            xp, kern, (1, 1), "VALID", rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)
        out = out[:, :h, :w, :].reshape(x.shape[0], h, w, c, 4)
        ca, ch_, cv, cd = (out[..., i] for i in range(4))
        coeffs.append((ca, ch_, cv, cd))
        current = ca
    return coeffs


def swt_loss(pred, target, wavelet: str = "db4", level: int = 2,
             band_weights=(0.5, 1.5, 1.5, 2.0)):
    pc = _swt_coeffs(pred, wavelet, level)
    tc = _swt_coeffs(target, wavelet, level)
    loss = 0.0
    for lvl in range(level):
        for band in range(4):
            loss += band_weights[band] * jnp.mean(jnp.abs(pc[lvl][band] - tc[lvl][band]))
    return loss / level


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def edge_loss(pred, target):
    """Sobel gradient L1 (perceptual_loss.py:996-1047)."""
    c = pred.shape[-1]

    def grads(x):
        out = []
        for kern in (_SOBEL_X, _SOBEL_Y):
            k = jnp.asarray(kern)[:, :, None, None] * jnp.ones((1, 1, 1, c))
            out.append(jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c, precision=jax.lax.Precision.HIGHEST))
        return out

    pgx, pgy = grads(pred)
    tgx, tgy = grads(target)
    return jnp.mean(jnp.abs(pgx - tgx)) + jnp.mean(jnp.abs(pgy - tgy))


# Real flax VGG19 architecture + converter (losses/vgg.py); the constructor
# still raises when no weights are reachable (zero-egress env), which keeps
# the CombinedLoss redirect-to-FFT degradation of round 1.
from .vgg import (  # noqa: E402  (re-export)
    VGG19Features, VGGPerceptualLoss, load_vgg19_params, vgg_key_fn)


# Real flax CLIP ViT-B/32 image tower + converter (losses/clip.py); same
# unavailability contract — live the moment a checkpoint lands.
from .clip import (  # noqa: E402  (re-export)
    CLIPPerceptualLoss, CLIPVisionTransformer, clip_key_fn, load_clip_params)


DEFAULT_WEIGHTS = {
    "l1": 1.0, "charbonnier": 0.5, "l2": 0.5, "vgg": 0.1, "swt": 0.2,
    "fft": 0.15, "edge": 0.1, "ssim": 0.1, "clip": 0.0,
}

_UNAVAILABLE = ("vgg", "clip")  # need pretrained backbones (zero-egress env)


class CombinedLoss:
    """Weight-driven multi-loss dispatcher (perceptual_loss.py:1054-1300).

    Only components with weight > 0 are computed (so each stage jits to a
    minimal graph). Unavailable perceptual components redirect their weight
    to FFT, mirroring the reference's SWT→FFT exception fallback.
    """

    def __init__(self, weights: Dict[str, float] = None,
                 swt_wavelet: str = "db4", swt_level: int = 2,
                 vgg_loss: "VGGPerceptualLoss" = None,
                 clip_loss: "CLIPPerceptualLoss" = None):
        self.swt_wavelet = swt_wavelet
        self.swt_level = swt_level
        self._vgg = vgg_loss
        self._clip = clip_loss
        self.weights: Dict[str, float] = dict(DEFAULT_WEIGHTS)
        if weights is not None:
            self.set_weights(weights)

    def set_weights(self, weights: Dict[str, float]):
        for k in weights:
            if k not in DEFAULT_WEIGHTS:
                raise KeyError(f"unknown loss component {k!r}")
        self.weights.update(weights)
        if self.weights.get("vgg", 0.0) > 0 and self._vgg is None:
            try:  # goes live if FREQFUSION_VGG19_WEIGHTS points at a ckpt
                self._vgg = VGGPerceptualLoss()
            except RuntimeError:
                pass
        if self.weights.get("clip", 0.0) > 0 and self._clip is None:
            try:  # goes live if FREQFUSION_CLIP_WEIGHTS points at a ckpt
                self._clip = CLIPPerceptualLoss()
            except RuntimeError:
                pass
        for k in _UNAVAILABLE:
            if k == "vgg" and self._vgg is not None:
                continue
            if k == "clip" and self._clip is not None:
                continue
            if self.weights.get(k, 0.0) > 0:
                warnings.warn(
                    f"{k} perceptual loss unavailable (no pretrained backbone "
                    "in this environment); redirecting its weight to FFT loss")
                self.weights["fft"] = self.weights.get("fft", 0.0) + self.weights[k]
                self.weights[k] = 0.0

    def __call__(self, pred, target) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        fns = {
            "l1": l1_loss,
            "l2": l2_loss,
            "charbonnier": charbonnier_loss,
            "ssim": ssim_loss,
            "fft": fft_loss,
            "edge": edge_loss,
            "swt": lambda p, t: swt_loss(p, t, self.swt_wavelet, self.swt_level),
        }
        if self._vgg is not None:
            fns["vgg"] = self._vgg
        if self._clip is not None:
            fns["clip"] = self._clip
        total = jnp.asarray(0.0)
        components = {}
        for name, fn in fns.items():
            wt = float(self.weights.get(name, 0.0))
            if wt > 0.0:
                val = fn(pred, target)
                components[name] = val
                total = total + wt * val
        components["total"] = total
        return total, components
