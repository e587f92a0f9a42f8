"""VGG19 perceptual loss: architecture + converter parity with random
weights (VERDICT round-1 missing #5 — the loss goes live the moment real
IMAGENET1K weights land)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.losses import CombinedLoss
from freqfusion_tpu.losses.vgg import (
    LAYER_NAME_MAPPING, VGG19Features, VGG19_CONV_CHANNELS,
    VGGPerceptualLoss, vgg_key_fn)
from freqfusion_tpu.utils.convert import fill_params

from ref_utils import has_torch, to_nchw, to_nhwc


def _torch_vgg19_features(max_idx: int, seed=0):
    """Hand-built torchvision vgg19().features layout (the layout is the
    spec — perceptual_loss.py:335-341; torchvision itself can't download
    weights here)."""
    import torch
    torch.manual_seed(seed)
    layers = []
    in_ch = 3
    for idx in range(max_idx + 1):
        if idx in VGG19_CONV_CHANNELS:
            out_ch = VGG19_CONV_CHANNELS[idx]
            layers.append(torch.nn.Conv2d(in_ch, out_ch, 3, padding=1))
            in_ch = out_ch
        elif idx in (4, 9, 18, 27, 36):
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.ReLU(inplace=False))
    seq = torch.nn.Sequential(*layers)
    with torch.no_grad():
        for p in seq.parameters():
            p.mul_(0.2)  # tame activations through 16 random convs
    return seq


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_vgg19_feature_parity_random_weights():
    import torch
    layers = ("relu2_2", "relu3_4", "relu4_4")
    max_idx = max(LAYER_NAME_MAPPING[l] for l in layers)
    seq = _torch_vgg19_features(max_idx)
    sd = {f"features.{i}.{leaf}": p.detach().numpy()
          for i, m in enumerate(seq)
          if isinstance(m, torch.nn.Conv2d)
          for leaf, p in (("weight", m.weight), ("bias", m.bias))}

    model = VGG19Features(layers, use_input_norm=True)
    x = np.random.default_rng(0).uniform(size=(1, 32, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, rep = fill_params(variables["params"], sd, vgg_key_fn)
    assert not rep["missing"], rep["missing"][:5]

    ours = model.apply({"params": params}, jnp.asarray(x))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        t = (to_nchw(x) - mean) / std
        feats = {}
        for i, m in enumerate(seq):
            t = m(t)
            for name in layers:
                if LAYER_NAME_MAPPING[name] == i:
                    feats[name] = t
    for name in layers:
        np.testing.assert_allclose(np.asarray(ours[name]),
                                   to_nhwc(feats[name]), atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_vgg_loss_goes_live_with_weights(tmp_path):
    import torch
    max_idx = max(LAYER_NAME_MAPPING[l] for l in ("relu2_2", "relu3_4", "relu4_4"))
    seq = _torch_vgg19_features(max_idx, seed=1)
    sd = {f"features.{i}.{leaf}": p.detach()
          for i, m in enumerate(seq)
          if isinstance(m, torch.nn.Conv2d)
          for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    path = str(tmp_path / "vgg19_random.pth")
    torch.save(sd, path)

    loss = VGGPerceptualLoss(weights_path=path)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    v = float(loss(a, b))
    assert np.isfinite(v) and v > 0
    assert float(loss(a, a)) < 1e-6

    # CombinedLoss keeps vgg live instead of redirecting to FFT
    os.environ["FREQFUSION_VGG19_WEIGHTS"] = path
    try:
        cl = CombinedLoss({"l1": 1.0, "vgg": 0.1, "charbonnier": 0, "l2": 0,
                           "swt": 0, "fft": 0, "edge": 0, "ssim": 0})
        assert cl.weights["vgg"] == 0.1 and cl.weights["fft"] == 0.0
        total, comps = cl(a, b)
        assert "vgg" in comps and np.isfinite(float(total))
    finally:
        del os.environ["FREQFUSION_VGG19_WEIGHTS"]


def test_vgg_still_raises_without_weights():
    with pytest.raises(RuntimeError):
        VGGPerceptualLoss()
