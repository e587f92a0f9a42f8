"""Native NIQE (utils/niqe.py): sanity, monotonicity, eval.py wiring."""

import os
import subprocess
import sys

import numpy as np
import pytest

from freqfusion_tpu.utils.niqe import (fit_mvg, fit_pristine, niqe,
                                       niqe_features)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _textured(rng, h=256, w=256):
    """A natural-statistics-ish image: smoothed multi-scale noise."""
    img = np.zeros((h, w))
    for s in (4, 8, 16, 32):
        low = rng.standard_normal((h // s + 2, w // s + 2))
        up = np.kron(low, np.ones((s, s)))[:h, :w]
        img += up / s
    img = img - img.min()
    img = img / img.max() * 255.0
    return np.repeat(img[..., None], 3, axis=-1).astype(np.uint8)


def test_features_shape_and_finite():
    rng = np.random.default_rng(0)
    rows = niqe_features(_textured(rng), patch=96)
    assert rows is not None and rows.shape[1] == 36
    assert np.isfinite(rows).all()
    mu, cov = fit_mvg(rows)
    assert mu.shape == (36,) and cov.shape == (36, 36)


def test_too_small_returns_none():
    rng = np.random.default_rng(0)
    assert niqe_features(_textured(rng, 64, 64), patch=96) is None


def test_monotone_in_distortion():
    rng = np.random.default_rng(1)
    pristine = fit_pristine([_textured(rng) for _ in range(4)])
    clean = _textured(np.random.default_rng(9))
    score_clean = niqe(clean, pristine)

    # heavy blur (repeated box filter) destroys the natural statistics
    blurred = clean.astype(np.float64)
    for _ in range(8):
        blurred = (np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0) +
                   np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1) +
                   blurred) / 5.0
    score_blur = niqe(blurred.astype(np.uint8), pristine)

    noisy = np.clip(clean.astype(np.float64) +
                    np.random.default_rng(2).normal(0, 40, clean.shape),
                    0, 255).astype(np.uint8)
    score_noise = niqe(noisy, pristine)

    assert np.isfinite([score_clean, score_blur, score_noise]).all()
    assert score_blur > score_clean, (score_blur, score_clean)
    assert score_noise > score_clean, (score_noise, score_clean)


def test_eval_cli_niqe_column(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    out_dir, tgt_dir = tmp_path / "out", tmp_path / "tgt"
    out_dir.mkdir(), tgt_dir.mkdir()
    for i in range(2):
        tgt = _textured(np.random.default_rng(10 + i), 192, 192)
        noisy = np.clip(tgt.astype(np.float64) +
                        rng.normal(0, 12, tgt.shape), 0, 255).astype(np.uint8)
        Image.fromarray(tgt).save(tgt_dir / f"im{i}.png")
        Image.fromarray(noisy).save(out_dir / f"im{i}.png")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"),
         "--output", str(out_dir), "--target", str(tgt_dir), "--workers", "1"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    txt = (tmp_path / f"{tmp_path.name}--out.txt").read_text()
    niqe_line = [l for l in txt.splitlines() if l.startswith("niqe:")][0]
    val = float(niqe_line.split(":")[1])
    assert np.isfinite(val), txt
