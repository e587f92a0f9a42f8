"""Native DISTS: architecture + converter parity with random weights
(VERDICT round-2 partial row 38 — the dists column of the evaluator goes
live the moment the official checkpoint lands). The torch side is the
published DISTS recipe (Ding et al. 2020) hand-built on a torchvision-
layout VGG16 (pyiqa/torchvision can't download weights here); mirrors the
reference's pyiqa `dists` metric at /root/reference/eval.py:51-56."""

import numpy as np
import jax.numpy as jnp
import pytest

from freqfusion_tpu.utils.dists import (
    DISTS_STAGE_CHANNELS, IMAGENET_MEAN, IMAGENET_STD, NativeDISTS,
    VGG16_CONV_CHANNELS, _POOL_INDICES, _STAGE_ENDS)

from ref_utils import has_torch


def _torch_vgg16_convs(seed=0):
    """torchvision vgg16().features conv layout with small random weights
    (scaled down so five stages of relus don't blow up activations)."""
    import torch
    torch.manual_seed(seed)
    convs, in_ch = {}, 3
    for idx, c in VGG16_CONV_CHANNELS.items():
        m = torch.nn.Conv2d(in_ch, c, 3, padding=1)
        with torch.no_grad():
            m.weight.mul_(0.25)
        convs[idx] = m
        in_ch = c
    return convs


def _torch_l2_pool(x):
    import torch
    a = torch.hann_window(5, periodic=False)[1:-1]
    g = (a[:, None] * a[None, :])
    g = (g / g.sum()).view(1, 1, 3, 3).repeat(x.shape[1], 1, 1, 1)
    out = torch.nn.functional.conv2d(x ** 2, g, stride=2, padding=1,
                                     groups=x.shape[1])
    return torch.sqrt(out + 1e-12)


def _torch_dists(convs, alpha, beta, x, y):
    """The official DISTS forward, hand-built: normalized VGG16 trunk with
    L2 pooling, six stages (raw input + relu{1_2,2_2,3_3,4_3,5_3}),
    α-weighted mean term + β-weighted correlation term."""
    import torch

    def feats(t):
        out = [t]
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        h = (t - mean) / std
        for idx in range(max(_STAGE_ENDS) + 1):
            if idx in convs:
                h = convs[idx](h)
            elif idx in _POOL_INDICES:
                h = _torch_l2_pool(h)
            else:
                h = torch.relu(h)
            if idx in _STAGE_ENDS:
                out.append(h)
        return out

    with torch.no_grad():
        fx, fy = feats(x), feats(y)
        w_sum = alpha.sum() + beta.sum()
        al = torch.split(alpha / w_sum, list(DISTS_STAGE_CHANNELS), dim=1)
        be = torch.split(beta / w_sum, list(DISTS_STAGE_CHANNELS), dim=1)
        c1 = c2 = 1e-6
        d1 = d2 = 0.0
        for k in range(len(DISTS_STAGE_CHANNELS)):
            xm = fx[k].mean([2, 3], keepdim=True)
            ym = fy[k].mean([2, 3], keepdim=True)
            s1 = (2 * xm * ym + c1) / (xm ** 2 + ym ** 2 + c1)
            d1 = d1 + (al[k] * s1).sum(1, keepdim=True)
            xv = ((fx[k] - xm) ** 2).mean([2, 3], keepdim=True)
            yv = ((fy[k] - ym) ** 2).mean([2, 3], keepdim=True)
            cov = (fx[k] * fy[k]).mean([2, 3], keepdim=True) - xm * ym
            s2 = (2 * cov + c2) / (xv + yv + c2)
            d2 = d2 + (be[k] * s2).sum(1, keepdim=True)
        return (1 - (d1 + d2)).view(-1).numpy()


def _random_ckpt(tmp_path, seed=0, layout="stage"):
    """Save a random DISTS checkpoint in the official `stageK.N.*` layout
    or the plain torchvision `features.N.*` layout."""
    import torch
    convs = _torch_vgg16_convs(seed=seed)
    torch.manual_seed(seed + 100)
    n = sum(DISTS_STAGE_CHANNELS)
    alpha = torch.rand(1, n, 1, 1)
    beta = torch.rand(1, n, 1, 1)

    stage_of = {}
    for k, end in enumerate(_STAGE_ENDS):
        start = 0 if k == 0 else _POOL_INDICES[k - 1] + 1
        for idx in range(start, end + 1):
            stage_of[idx] = k + 1
    sd = {}
    for idx, m in convs.items():
        for leaf, p in (("weight", m.weight), ("bias", m.bias)):
            key = (f"stage{stage_of[idx]}.{idx}.{leaf}" if layout == "stage"
                   else f"features.{idx}.{leaf}")
            sd[key] = p.detach()
    sd["alpha"], sd["beta"] = alpha, beta
    path = str(tmp_path / f"dists_random_{layout}.pth")
    torch.save(sd, path)
    return path, convs, alpha, beta


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
@pytest.mark.parametrize("layout", ["stage", "features"])
def test_dists_parity_random_weights(tmp_path, layout):
    import torch
    path, convs, alpha, beta = _random_ckpt(tmp_path, seed=0, layout=layout)

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, size=(2, 64, 80, 3)).astype(np.float32)
    b = rng.uniform(0, 1, size=(2, 64, 80, 3)).astype(np.float32)

    native = NativeDISTS(weights_path=path)
    ours = np.asarray(native._fn(native.params, native.alpha, native.beta,
                                 jnp.asarray(a), jnp.asarray(b)))

    to_t = lambda im: torch.from_numpy(np.moveaxis(im, -1, 1).copy())
    theirs = _torch_dists(convs, alpha, beta, to_t(a), to_t(b))
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
    assert ours.shape == (2,)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_dists_goes_live_in_evaluator(tmp_path, monkeypatch):
    path, *_ = _random_ckpt(tmp_path, seed=2)
    monkeypatch.setenv("FREQFUSION_DISTS_WEIGHTS", path)

    from freqfusion_tpu.utils.perceptual_metrics import PerceptualEvaluator
    ev = PerceptualEvaluator()
    assert "dists" in ev.available_metrics
    rng = np.random.default_rng(1)
    out = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    tgt = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    res = ev.evaluate_pair(out, tgt)
    assert np.isfinite(res["dists"]) and res["dists"] > 0
    same = ev.evaluate_pair(out, out)
    assert abs(same["dists"]) < 1e-5
    # lower-is-better metric enters the aggregate as (1 - dists)
    score = ev.perceptual_score({"dists": res["dists"]})
    assert np.isclose(score, 1.0 - res["dists"])


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_eval_cli_live_dists_column(tmp_path):
    """eval.py emits a finite dists column (csv + txt + total_score) when
    FREQFUSION_DISTS_WEIGHTS is set — the reference's pyiqa column gone
    native (/root/reference/eval.py:51-56, 245-268)."""
    import os
    import subprocess
    import sys

    import torch  # noqa: F401  (ckpt writing)
    from PIL import Image

    path, *_ = _random_ckpt(tmp_path, seed=3)
    out_dir, tgt_dir = tmp_path / "out", tmp_path / "tgt"
    out_dir.mkdir(), tgt_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        tgt = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        noisy = np.clip(tgt.astype(np.int16)
                        + rng.integers(-10, 11, tgt.shape), 0, 255)
        Image.fromarray(tgt).save(tgt_dir / f"{i}.png")
        Image.fromarray(noisy.astype(np.uint8)).save(out_dir / f"{i}.png")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, FREQFUSION_DISTS_WEIGHTS=path,
               JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(repo, "eval.py"),
         "--output", str(out_dir), "--target", str(tgt_dir),
         "--workers", "1", "--no-niqe", "--csv-dir", str(tmp_path)],
        check=True, env=env, timeout=600, cwd=repo)

    csvs = list(tmp_path.glob("*--out.csv"))
    assert csvs, "eval.py wrote no csv"
    header, *rows = csvs[0].read_text().strip().splitlines()
    assert "dists" in header.split(",")
    col = header.split(",").index("dists")
    vals = [float(r.split(",")[col]) for r in rows]
    assert all(np.isfinite(vals)) and all(v > 0 for v in vals)
    txt = csvs[0].with_suffix(".txt").read_text()
    dists_mean = float([l for l in txt.splitlines()
                        if l.startswith("dists:")][0].split()[1])
    total = float([l for l in txt.splitlines()
                   if l.startswith("total_score:")][0].split()[1])
    assert np.isclose(dists_mean, np.mean(vals[:-1]), atol=1e-5)
    assert total > 0  # (1-dists) term entered the score


def test_dists_unavailable_without_weights(monkeypatch):
    monkeypatch.delenv("FREQFUSION_DISTS_WEIGHTS", raising=False)
    with pytest.raises(RuntimeError):
        NativeDISTS()
    from freqfusion_tpu.utils.perceptual_metrics import PerceptualEvaluator
    ev = PerceptualEvaluator()
    assert ev._native_dists is None
