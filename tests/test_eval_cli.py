"""eval.py CLI behavior: pooled numpy metrics coexist with live jitted
tower columns (reference eval.py:162-221 shards metric math over workers;
:48-133 adds the pyiqa full-reference columns)."""

import csv
import importlib
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_pairs(tmp_path, n=3):
    from freqfusion_tpu.utils.imageio import save_image

    rng = np.random.default_rng(3)
    out_dir, tgt_dir = tmp_path / "out", tmp_path / "gt"
    out_dir.mkdir(), tgt_dir.mkdir()
    for i in range(n):
        img = rng.uniform(size=(40, 48, 3)).astype(np.float32)
        save_image(img, str(out_dir / f"im{i:02d}.png"))
        save_image(np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
                   .astype(np.float32), str(tgt_dir / f"im{i:02d}.png"))
    return out_dir, tgt_dir


def test_pooled_rows_with_live_towers(tmp_path, monkeypatch):
    """workers>1 AND a live tower: EVERYTHING — numpy metrics and towers —
    shards over the pool with one decode per pair (VERDICT r3 #7), and the
    CSV rows stay aligned (each tower value derives from ITS image, not a
    shuffled order)."""
    out_dir, tgt_dir = _write_pairs(tmp_path)

    sys.path.insert(0, REPO)
    ev = importlib.import_module("eval")

    # a deterministic per-image "tower": mean |out - tgt| — image-specific,
    # so any row misalignment changes the value
    def fake_towers():
        return {"lpips": lambda out, tgt: float(
            np.mean(np.abs(out.astype(np.float64) - tgt.astype(np.float64))))}

    import freqfusion_tpu.utils.perceptual_metrics as pm
    monkeypatch.setattr(pm, "load_native_towers", fake_towers)
    # column discovery is a jax-free env probe (the parent must not init
    # XLA before forking); forked workers inherit the monkeypatch above
    (tmp_path / "w.pth").write_bytes(b"x")
    monkeypatch.setenv("FREQFUSION_LPIPS_WEIGHTS", str(tmp_path / "w.pth"))
    monkeypatch.setattr(ev, "_WORKER_TOWERS", None)

    monkeypatch.setattr(sys, "argv", [
        "eval.py", "--output", str(out_dir), "--target", str(tgt_dir),
        "--workers", "2", "--no-niqe", "--csv-dir", str(tmp_path)])
    ev.main()

    csvs = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert len(csvs) == 1
    with open(tmp_path / csvs[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["image", "psnr", "ssim", "niqe", "lpips"]
    body, mean_row = rows[1:-1], rows[-1]
    assert mean_row[0] == "MEAN"

    # recompute each image's expected tower value and match its row
    from PIL import Image
    for name, _p, _s, _nq, lp in body:
        out = np.asarray(Image.open(out_dir / name).convert("RGB"))
        tgt = np.asarray(Image.open(tgt_dir / name).convert("RGB"))
        want = float(np.mean(np.abs(out.astype(np.float64) -
                                    tgt.astype(np.float64))))
        assert float(lp) == pytest.approx(want, abs=1e-4), name
    assert float(mean_row[4]) == pytest.approx(
        np.mean([float(r[4]) for r in body]), abs=1e-4)
