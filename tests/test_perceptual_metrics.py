"""PerceptualEvaluator: availability flags, native metrics, score formula."""

import math

import numpy as np

from freqfusion_tpu.utils.perceptual_metrics import PerceptualEvaluator


def test_native_metrics_and_flags():
    ev = PerceptualEvaluator()
    assert "psnr" in ev.available_metrics and "ssim" in ev.available_metrics
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    res = ev.evaluate_pair(img, img)
    assert res["psnr"] == float("inf") and abs(res["ssim"] - 1.0) < 1e-9
    assert res["sharpness"] > 0
    assert math.isnan(res["niqe"]) or isinstance(res["niqe"], float)


def test_perceptual_score_formula():
    means = {"lpips": 0.2, "dists": 0.1, "clipiqa": 0.6, "maniqa": 0.5,
             "musiq": 60.0, "niqe": 4.0}
    # (1-.2)+(1-.1)+.6+.5+.6+.6 = 4.0
    assert abs(PerceptualEvaluator.perceptual_score(means) - 4.0) < 1e-9


def test_perceptual_score_skips_nan():
    means = {"lpips": float("nan"), "dists": 0.1, "clipiqa": float("nan"),
             "maniqa": float("nan"), "musiq": float("nan"), "niqe": float("nan")}
    assert abs(PerceptualEvaluator.perceptual_score(means) - 0.9) < 1e-9


def test_sharpness_orders_blurry_below_sharp():
    rng = np.random.default_rng(1)
    sharp = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    blurry = np.full((32, 32, 3), 128, np.uint8)
    assert PerceptualEvaluator.sharpness(sharp) > PerceptualEvaluator.sharpness(blurry)
