"""Parity and invariant tests for shared ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from freqfusion_tpu.ops import (
    resize, upsample, downsample,
    channel_layernorm, pixel_shuffle, pixel_unshuffle,
    pad_to_multiple,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _to_torch_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("scale", [2, 4])
def test_upsample_matches_torch(mode, scale):
    x = _rand((2, 13, 17, 3))
    ours = np.asarray(upsample(jnp.asarray(x), scale, mode))
    ref = _from_torch_nchw(
        F.interpolate(_to_torch_nchw(x), scale_factor=scale, mode=mode,
                      align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_downsample_matches_torch(mode):
    x = _rand((1, 64, 48, 3), seed=1)
    ours = np.asarray(downsample(jnp.asarray(x), 2, mode))
    ref = _from_torch_nchw(
        F.interpolate(_to_torch_nchw(x), scale_factor=0.5, mode=mode,
                      align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_arbitrary_resize_matches_torch():
    x = _rand((1, 40, 30, 3), seed=2)
    ours = np.asarray(resize(jnp.asarray(x), 97, 55, "bicubic"))
    ref = _from_torch_nchw(
        F.interpolate(_to_torch_nchw(x), size=(97, 55), mode="bicubic",
                      align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_channel_layernorm_matches_layernorm2d():
    # Reference LayerNorm2d: biased variance over C (nafnet_arch.py:26-41).
    x = _rand((2, 8, 8, 16), seed=3)
    w = _rand((16,), seed=4)
    b = _rand((16,), seed=5)
    ours = np.asarray(channel_layernorm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    xt = _to_torch_nchw(x)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    ref = (xt - u) / torch.sqrt(s + 1e-6)
    ref = torch.from_numpy(w)[:, None, None] * ref + torch.from_numpy(b)[:, None, None]
    np.testing.assert_allclose(ours, _from_torch_nchw(ref), atol=1e-5, rtol=1e-5)


def test_pixel_shuffle_matches_torch():
    x = _rand((2, 5, 7, 36), seed=6)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = _from_torch_nchw(F.pixel_shuffle(_to_torch_nchw(x), 2))
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)


def test_pixel_unshuffle_roundtrip():
    x = _rand((1, 8, 8, 4), seed=7)
    y = pixel_unshuffle(jnp.asarray(x), 2)
    assert y.shape == (1, 4, 4, 16)
    np.testing.assert_allclose(np.asarray(pixel_shuffle(y, 2)), x)


def test_pad_to_multiple_reflect():
    x = jnp.asarray(_rand((1, 13, 10, 3), seed=8))
    padded, (h, w) = pad_to_multiple(x, 16)
    assert padded.shape == (1, 16, 16, 3)
    assert (h, w) == (13, 10)
    np.testing.assert_allclose(np.asarray(padded[:, :13, :10]), np.asarray(x))
    # reflect row: padded[13] should equal x[11] (reflect w/o edge repeat)
    np.testing.assert_allclose(np.asarray(padded[:, 13, :10]), np.asarray(x[:, 11]))
