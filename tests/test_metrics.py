"""Metric protocol tests (PSNR/SSIM invariants + cross-check vs reference formulas)."""

import numpy as np
import jax.numpy as jnp

from freqfusion_tpu.utils import metrics


def test_psnr_identical_images_is_large():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32))
    assert float(metrics.psnr(x, x)) > 100.0


def test_psnr_known_value():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.1)
    # mse = 0.01 → psnr = 20 dB
    assert abs(float(metrics.psnr(a, b)) - 20.0) < 1e-3


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 48, 48, 3)).astype(np.float32))
    assert abs(float(metrics.ssim(x, x, crop_border=0, y_channel=True)) - 1.0) < 1e-5


def test_ssim_noise_lowers_score():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
    noisy = np.clip(x + rng.normal(scale=0.2, size=x.shape).astype(np.float32), 0, 1)
    assert float(metrics.ssim(jnp.asarray(x), jnp.asarray(noisy), 0)) < 0.9


def test_rgb_to_y_range():
    # black → 16/255, white → 241/255 (studio swing)
    black = jnp.zeros((1, 4, 4, 3))
    white = jnp.ones((1, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(metrics.rgb_to_y(black)), 16.0 / 255.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(metrics.rgb_to_y(white)), (65.481 + 128.553 + 24.966 + 16.0) / 255.0,
        atol=1e-5)


def test_metric_calculator_accumulates():
    mc = metrics.MetricCalculator(crop_border=4)
    rng = np.random.default_rng(3)
    hr = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    sr = jnp.clip(hr + 0.01, 0, 1)
    mc.update(sr, hr)
    out = mc.compute()
    assert out["count"] == 2
    assert 30.0 < out["psnr"] < 100.0


def test_file_protocol_psnr():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    p, s = metrics.psnr_ssim_files(a, a, border=4)
    assert p == float("inf") and abs(s - 1.0) < 1e-9
