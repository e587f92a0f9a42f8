"""Native LPIPS('alex'): architecture + converter parity with random
weights (VERDICT round-2 partial row 38 — the lpips column goes live the
moment a trunk+heads state dict lands). The torch side is the published
LPIPS recipe (Zhang et al. 2018) hand-built on a torchvision-layout AlexNet
(the lpips/torchvision packages can't download weights here)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.utils.lpips import (
    ALEX_CONVS, AlexLPIPS, ALEX_TAP_CHANNELS, NativeLPIPS, lpips_key_fn,
    load_lpips_params)
from freqfusion_tpu.utils.convert import fill_params

from ref_utils import has_torch, to_nchw


def _torch_alex_features(seed=0):
    import torch
    torch.manual_seed(seed)
    layers, in_ch = [], 3
    for idx in range(12):
        if idx in ALEX_CONVS:
            c, k, s, p = ALEX_CONVS[idx]
            layers.append(torch.nn.Conv2d(in_ch, c, k, stride=s, padding=p))
            in_ch = c
        elif idx in (2, 5):
            layers.append(torch.nn.MaxPool2d(3, 2))
        else:
            layers.append(torch.nn.ReLU(inplace=False))
    seq = torch.nn.Sequential(*layers)
    with torch.no_grad():
        for m in seq:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.mul_(0.2)
    return seq


def _torch_lpips(seq, lins, x0, x1):
    """The lpips package's forward, hand-built: scaling layer → taps →
    unit-normalize → squared diff → 1×1 no-bias heads → spatial mean."""
    import torch
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        t = (x - shift) / scale
        out = []
        for i, m in enumerate(seq):
            t = m(t)
            if i in (1, 4, 7, 9, 11):
                out.append(t)
        return out

    with torch.no_grad():
        total = 0.0
        for f0, f1, w in zip(feats(x0), feats(x1), lins):
            n0 = f0 / (f0.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            n1 = f1 / (f1.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (n0 - n1).pow(2)
            total = total + torch.nn.functional.conv2d(d, w).mean(dim=(2, 3))
        return total.view(-1).numpy()


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_lpips_parity_random_weights(tmp_path):
    import torch
    seq = _torch_alex_features()
    torch.manual_seed(1)
    lins = [torch.rand(1, c, 1, 1) * 0.1 for c in ALEX_TAP_CHANNELS]

    sd = {f"features.{i}.{leaf}": p.detach()
          for i, m in enumerate(seq) if isinstance(m, torch.nn.Conv2d)
          for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    sd.update({f"lin{k}.model.1.weight": w for k, w in enumerate(lins)})
    path = str(tmp_path / "lpips_random.pth")
    torch.save(sd, path)

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, size=(2, 64, 80, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(2, 64, 80, 3)).astype(np.float32)

    model = AlexLPIPS()
    params = load_lpips_params(model, path)
    ours = np.asarray(model.apply(params, jnp.asarray(a), jnp.asarray(b)))

    theirs = _torch_lpips(seq, lins, to_nchw(a), to_nchw(b))
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
    assert ours.shape == (2,) and (ours > 0).all()


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_lpips_goes_live_in_evaluator(tmp_path, monkeypatch):
    import torch
    seq = _torch_alex_features(seed=2)
    torch.manual_seed(3)
    sd = {f"features.{i}.{leaf}": p.detach()
          for i, m in enumerate(seq) if isinstance(m, torch.nn.Conv2d)
          for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    sd.update({f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
               for k, c in enumerate(ALEX_TAP_CHANNELS)})
    path = str(tmp_path / "lpips_random.pth")
    torch.save(sd, path)
    monkeypatch.setenv("FREQFUSION_LPIPS_WEIGHTS", path)

    from freqfusion_tpu.utils.perceptual_metrics import PerceptualEvaluator
    ev = PerceptualEvaluator()
    assert "lpips" in ev.available_metrics
    rng = np.random.default_rng(1)
    out = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    tgt = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    res = ev.evaluate_pair(out, tgt)
    assert np.isfinite(res["lpips"]) and res["lpips"] > 0
    same = ev.evaluate_pair(out, out)
    assert same["lpips"] < 1e-6
    # lower-is-better metric enters the aggregate as (1 - lpips)
    score = ev.perceptual_score({"lpips": res["lpips"]})
    assert np.isclose(score, 1.0 - res["lpips"])


def test_lpips_raises_without_weights(monkeypatch):
    monkeypatch.delenv("FREQFUSION_LPIPS_WEIGHTS", raising=False)
    with pytest.raises(RuntimeError):
        NativeLPIPS()
