"""Native MANIQA: converter parity vs a minimal torch mirror of the
documented state-dict layout, and the evaluator go-live path (reference
pyiqa `maniqa` at /root/reference/eval.py:48-58). Synthetic small-dim
checkpoints — official weights can't be fetched here. The swin bias/mask
tables reuse ops/windows.py, whose swin semantics are already pinned
against the reference HAT (tests/test_hat.py)."""

import numpy as np
import pytest

from conftest import has_torch

from freqfusion_tpu.ops import windows as W
from freqfusion_tpu.utils.maniqa import (
    MANIQA, NativeMANIQA, infer_maniqa_config, maniqa_key_fn)

CFG = dict(width=32, patch=8, layers=4, img=32, dim1=24, dim2=16,
           num_tab=2, window=4, depth=2, heads=2, mlp=20)


def _synthetic_maniqa_sd(seed=0, **over):
    c = {**CFG, **over}
    rng = np.random.default_rng(seed)
    f = lambda *s: (rng.normal(size=s) * 0.05).astype(np.float32)
    side = c["img"] // c["patch"]
    n = side * side
    d = c["width"]
    sd = {
        "vit.patch_embed.proj.weight": f(d, 3, c["patch"], c["patch"]),
        "vit.patch_embed.proj.bias": f(d),
        "vit.cls_token": f(1, 1, d),
        "vit.pos_embed": f(1, 1 + n, d),
        "conv1.weight": f(c["dim1"], 4 * d, 1, 1), "conv1.bias": f(c["dim1"]),
        "conv2.weight": f(c["dim2"], c["dim1"], 1, 1),
        "conv2.bias": f(c["dim2"]),
        "fc_score.0.weight": f(c["dim2"], c["dim2"]),
        "fc_score.0.bias": f(c["dim2"]),
        "fc_score.3.weight": f(1, c["dim2"]), "fc_score.3.bias": f(1),
        "fc_weight.0.weight": f(c["dim2"], c["dim2"]),
        "fc_weight.0.bias": f(c["dim2"]),
        "fc_weight.3.weight": f(1, c["dim2"]), "fc_weight.3.bias": f(1),
    }
    for i in range(c["layers"]):
        p = f"vit.blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + f(d), f"{p}.norm1.bias": f(d),
            f"{p}.norm2.weight": 1 + f(d), f"{p}.norm2.bias": f(d),
            f"{p}.attn.qkv.weight": f(3 * d, d), f"{p}.attn.qkv.bias": f(3 * d),
            f"{p}.attn.proj.weight": f(d, d), f"{p}.attn.proj.bias": f(d),
            f"{p}.mlp.fc1.weight": f(4 * d, d), f"{p}.mlp.fc1.bias": f(4 * d),
            f"{p}.mlp.fc2.weight": f(d, 4 * d), f"{p}.mlp.fc2.bias": f(d),
        })
    for stage in (1, 2):
        for i in range(c["num_tab"]):
            p = f"tablock{stage}.{i}"
            sd.update({f"{p}.c_q.weight": f(n, n), f"{p}.c_q.bias": f(n),
                       f"{p}.c_k.weight": f(n, n), f"{p}.c_k.bias": f(n),
                       f"{p}.c_v.weight": f(n, n), f"{p}.c_v.bias": f(n)})
        dim = c["dim1"] if stage == 1 else c["dim2"]
        for j in range(c["depth"]):
            p = f"swintransformer{stage}.blocks.{j}"
            sd.update({
                f"{p}.norm1.weight": 1 + f(dim), f"{p}.norm1.bias": f(dim),
                f"{p}.norm2.weight": 1 + f(dim), f"{p}.norm2.bias": f(dim),
                f"{p}.attn.qkv.weight": f(3 * dim, dim),
                f"{p}.attn.qkv.bias": f(3 * dim),
                f"{p}.attn.proj.weight": f(dim, dim),
                f"{p}.attn.proj.bias": f(dim),
                f"{p}.attn.relative_position_bias_table":
                    f((2 * c["window"] - 1) ** 2, c["heads"]),
                f"{p}.mlp.fc1.weight": f(c["mlp"], dim),
                f"{p}.mlp.fc1.bias": f(c["mlp"]),
                f"{p}.mlp.fc2.weight": f(dim, c["mlp"]),
                f"{p}.mlp.fc2.bias": f(dim),
            })
    return sd


def _torch_vit_block(t, tok, base, heads):
    import torch
    import torch.nn.functional as F
    b, n, d = tok.shape
    h = F.layer_norm(tok, (d,), t[f"{base}.norm1.weight"],
                     t[f"{base}.norm1.bias"], eps=1e-6)
    qkv = F.linear(h, t[f"{base}.attn.qkv.weight"], t[f"{base}.attn.qkv.bias"])
    q, k, v = qkv.reshape(b, n, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
    att = (q @ k.transpose(-2, -1) / np.sqrt(d // heads)).softmax(-1)
    o = (att @ v).transpose(1, 2).reshape(b, n, d)
    tok = tok + F.linear(o, t[f"{base}.attn.proj.weight"],
                         t[f"{base}.attn.proj.bias"])
    h = F.layer_norm(tok, (d,), t[f"{base}.norm2.weight"],
                     t[f"{base}.norm2.bias"], eps=1e-6)
    h = F.gelu(F.linear(h, t[f"{base}.mlp.fc1.weight"],
                        t[f"{base}.mlp.fc1.bias"]))
    return tok + F.linear(h, t[f"{base}.mlp.fc2.weight"],
                          t[f"{base}.mlp.fc2.bias"])


def _torch_swin_block(t, x, base, ws, heads, shift, scale):
    """x: [B,h,w,C] torch. Bias/mask tables come from ops/windows.py (their
    swin semantics are pinned by the HAT parity suite)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    b, h, w, c = x.shape
    hd = c // heads
    n = ws * ws
    shortcut = x
    x = F.layer_norm(x, (c,), t[f"{base}.norm1.weight"],
                     t[f"{base}.norm1.bias"], eps=1e-5)
    if shift:
        x = torch.roll(x, (-shift, -shift), (1, 2))
    xw = x.reshape(b, h // ws, ws, w // ws, ws, c).permute(
        0, 1, 3, 2, 4, 5).reshape(-1, n, c)
    bw = xw.shape[0]
    qkv = F.linear(xw, t[f"{base}.attn.qkv.weight"],
                   t[f"{base}.attn.qkv.bias"])
    q, k, v = qkv.reshape(bw, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
    att = q @ k.transpose(-2, -1) * hd ** -0.5
    bias = np.asarray(W.swin_bias_from_table(
        jnp.asarray(t[f"{base}.attn.relative_position_bias_table"].numpy()),
        ws, ws))
    att = att + torch.from_numpy(bias)[None]
    if shift:
        m = np.asarray(W.shift_attn_mask(h, w, ws, ws, shift, shift))
        nw = m.shape[0]
        att = (att.reshape(bw // nw, nw, heads, n, n)
               + torch.from_numpy(m)[None, :, None]).reshape(bw, heads, n, n)
    att = att.softmax(-1)
    o = (att @ v).transpose(1, 2).reshape(bw, n, c)
    o = F.linear(o, t[f"{base}.attn.proj.weight"], t[f"{base}.attn.proj.bias"])
    o = o.reshape(b, h // ws, w // ws, ws, ws, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    if shift:
        o = torch.roll(o, (shift, shift), (1, 2))
    x = shortcut + scale * o
    h2 = F.layer_norm(x, (c,), t[f"{base}.norm2.weight"],
                      t[f"{base}.norm2.bias"], eps=1e-5)
    h2 = F.gelu(F.linear(h2, t[f"{base}.mlp.fc1.weight"],
                         t[f"{base}.mlp.fc1.bias"]))
    return x + scale * F.linear(h2, t[f"{base}.mlp.fc2.weight"],
                                t[f"{base}.mlp.fc2.bias"])


def _torch_maniqa_forward(sd, x_nhwc, cfg):
    import torch
    import torch.nn.functional as F
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    c = cfg
    side = c["img"] // c["patch"]
    n = side * side
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    x = (x - 0.5) / 0.5
    x = F.conv2d(x, t["vit.patch_embed.proj.weight"],
                 t["vit.patch_embed.proj.bias"], stride=c["patch"])
    b, d = x.shape[0], x.shape[1]
    tok = x.permute(0, 2, 3, 1).reshape(b, -1, d)
    tok = torch.cat([t["vit.cls_token"].expand(b, 1, d), tok], 1)
    tok = tok + t["vit.pos_embed"]
    heads = max(1, d // 64)
    feats = []
    feat_idx = tuple(range(c["layers"] - 4, c["layers"])) \
        if c["layers"] < 10 else (6, 7, 8, 9)
    for i in range(c["layers"]):
        tok = _torch_vit_block(t, tok, f"vit.blocks.{i}", heads)
        if i in feat_idx:
            feats.append(tok[:, 1:])
    f = torch.cat(feats, -1).transpose(1, 2)  # [B, C, N]

    def tab(f, base):
        # the OFFICIAL TABlock forward verbatim (IIGROUP/MANIQA), including
        # the raw transpose(1,2).reshape(B,C,N) memory reinterpretation
        B, C, N = f.shape
        q = F.linear(f, t[f"{base}.c_q.weight"], t[f"{base}.c_q.bias"])
        k = F.linear(f, t[f"{base}.c_k.weight"], t[f"{base}.c_k.bias"])
        v = F.linear(f, t[f"{base}.c_v.weight"], t[f"{base}.c_v.bias"])
        att = (q @ k.transpose(-2, -1) * N ** -0.5).softmax(-1)
        y = (att @ v).transpose(1, 2).reshape(B, C, N)
        return f + y

    for i in range(c["num_tab"]):
        f = tab(f, f"tablock1.{i}")
    f = f.transpose(1, 2).reshape(b, side, side, -1)
    f = F.linear(f, t["conv1.weight"][:, :, 0, 0], t["conv1.bias"])
    for j in range(c["depth"]):
        f = _torch_swin_block(t, f, f"swintransformer1.blocks.{j}",
                              c["window"], c["heads"],
                              0 if j % 2 == 0 else c["window"] // 2, 0.8)
    f = f.reshape(b, n, -1).transpose(1, 2)
    for i in range(c["num_tab"]):
        f = tab(f, f"tablock2.{i}")
    f = f.transpose(1, 2).reshape(b, side, side, -1)
    f = F.linear(f, t["conv2.weight"][:, :, 0, 0], t["conv2.bias"])
    for j in range(c["depth"]):
        f = _torch_swin_block(t, f, f"swintransformer2.blocks.{j}",
                              c["window"], c["heads"],
                              0 if j % 2 == 0 else c["window"] // 2, 0.8)
    tkn = f.reshape(b, n, -1)
    s = F.relu(F.linear(F.relu(F.linear(tkn, t["fc_score.0.weight"],
                                        t["fc_score.0.bias"])),
                        t["fc_score.3.weight"], t["fc_score.3.bias"]))[..., 0]
    wg = torch.sigmoid(
        F.linear(F.relu(F.linear(tkn, t["fc_weight.0.weight"],
                                 t["fc_weight.0.bias"])),
                 t["fc_weight.3.weight"], t["fc_weight.3.bias"]))[..., 0]
    return (s * wg).sum(-1) / (wg.sum(-1) + 1e-8)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_maniqa_parity_vs_torch_mirror():
    import jax
    import jax.numpy as jnp
    from freqfusion_tpu.utils import convert as cv

    sd = _synthetic_maniqa_sd()
    model = infer_maniqa_config(sd)
    assert (model.vit_width, model.vit_layers, model.dim1, model.dim2,
            model.window, model.swin_heads) == (32, 4, 24, 16, 4, 2)
    assert model.feat_idx == (0, 1, 2, 3)

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, CFG["img"], CFG["img"], 3)).astype(np.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    params, report = cv.fill_params(shapes["params"], sd, maniqa_key_fn,
                                    strict=True)
    assert not report["missing"] and not report["unused"]
    ours = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x)))
    theirs = _torch_maniqa_forward(sd, x, CFG).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
    assert (ours >= 0).all() and (ours <= 1).all()


def test_tablock_official_reshape_quirk():
    """The TABlock output must be the official raw [B,N,C]→[B,C,N]
    reinterpretation of the attention result — NOT a plain residual add of
    `attn @ v` (VERDICT r4 #4: published checkpoints were trained with the
    quirk, so reproducing it is load-bearing for fidelity)."""
    import jax
    import jax.numpy as jnp
    from freqfusion_tpu.utils.maniqa import TABlock

    b, c, n = 1, 6, 4     # C != N so the reshape genuinely scrambles
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, c, n)),
                    jnp.float32)
    m = TABlock(n)
    v = m.init(jax.random.PRNGKey(1), x)
    got = m.apply(v, x)

    p = v["params"]
    q = x @ p["c_q"]["kernel"] + p["c_q"]["bias"]
    k = x @ p["c_k"]["kernel"] + p["c_k"]["bias"]
    vv = x @ p["c_v"]["kernel"] + p["c_v"]["bias"]
    att = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * n ** -0.5, -1)
    y = att @ vv
    want = x + jnp.transpose(y, (0, 2, 1)).reshape(b, c, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # and it differs from the quirk-free version
    assert not np.allclose(np.asarray(got), np.asarray(x + y), atol=1e-4)


def test_random_crops_official_protocol():
    from freqfusion_tpu.utils.maniqa import _random_crops

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 80, 3)).astype(np.float32)
    crops = _random_crops(img, 32, 20)
    assert crops.shape == (20, 32, 32, 3)
    # seeded: identical across calls
    np.testing.assert_array_equal(crops, _random_crops(img, 32, 20))
    # crops actually vary in position
    assert not np.allclose(crops[0], crops[1])
    # undersized images upscale first
    small = rng.uniform(size=(20, 24, 3)).astype(np.float32)
    assert _random_crops(small, 32, 4).shape == (4, 32, 32, 3)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_maniqa_crop_protocol_selection(tmp_path, monkeypatch):
    import torch

    sd = _synthetic_maniqa_sd(seed=5)
    path = tmp_path / "maniqa.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    monkeypatch.setenv("FREQFUSION_MANIQA_WEIGHTS", str(path))
    assert NativeMANIQA().num_crops == 20          # official default
    monkeypatch.setenv("FREQFUSION_MANIQA_CROPS", "five")
    assert NativeMANIQA().num_crops == 0           # 5-crop fallback
    monkeypatch.setenv("FREQFUSION_MANIQA_CROPS", "7")
    tower = NativeMANIQA()
    assert tower.num_crops == 7
    img = (np.random.default_rng(6).uniform(size=(50, 70, 3)) * 255) \
        .astype(np.uint8)
    v1, v2 = tower(img), tower(img)
    assert np.isfinite(v1) and v1 == v2            # seeded determinism


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_maniqa_go_live(tmp_path, monkeypatch):
    import torch

    sd = _synthetic_maniqa_sd(seed=5)
    path = tmp_path / "maniqa.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    monkeypatch.setenv("FREQFUSION_MANIQA_WEIGHTS", str(path))

    tower = NativeMANIQA()
    assert tower.size == CFG["img"]  # input size follows the TABlock dims
    rng = np.random.default_rng(6)
    img = (rng.uniform(size=(50, 70, 3)) * 255).astype(np.uint8)
    v1, v2 = tower(img), tower(img)
    assert np.isfinite(v1) and v1 == v2 and 0.0 <= v1 <= 1.0

    from freqfusion_tpu.utils.perceptual_metrics import load_native_towers
    towers = load_native_towers()
    assert "maniqa" in towers


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_five_towers_and_full_total_score(tmp_path, monkeypatch):
    """VERDICT r3 #4 done-bar: with every env configured,
    load_native_towers returns 5 towers and the Total Score formula runs
    with every term. Synthetic checkpoints follow each tower suite's own
    recipe."""
    import torch

    from test_musiq import _synthetic_musiq_sd

    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in _synthetic_maniqa_sd(seed=5).items()},
               tmp_path / "maniqa.pth")
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in _synthetic_musiq_sd(seed=5).items()},
               tmp_path / "musiq.pth")
    monkeypatch.setenv("FREQFUSION_MANIQA_WEIGHTS",
                       str(tmp_path / "maniqa.pth"))
    monkeypatch.setenv("FREQFUSION_MUSIQ_WEIGHTS", str(tmp_path / "musiq.pth"))

    # lpips (test_lpips recipe)
    from test_lpips import ALEX_TAP_CHANNELS, _torch_alex_features
    seq = _torch_alex_features(seed=2)
    torch.manual_seed(3)
    lp = {f"features.{i}.{leaf}": p.detach()
          for i, m in enumerate(seq) if isinstance(m, torch.nn.Conv2d)
          for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    lp.update({f"lin{k}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
               for k, c in enumerate(ALEX_TAP_CHANNELS)})
    torch.save(lp, tmp_path / "lpips.pth")
    monkeypatch.setenv("FREQFUSION_LPIPS_WEIGHTS", str(tmp_path / "lpips.pth"))

    # dists (test_dists recipe)
    from test_dists import _random_ckpt
    dists_path, *_ = _random_ckpt(tmp_path, seed=0, layout="stage")
    monkeypatch.setenv("FREQFUSION_DISTS_WEIGHTS", dists_path)

    # clipiqa (test_clipiqa go-live recipe: embedding sized to the vocab)
    from test_clipiqa import (SimpleBPETokenizer, _synthetic_text_sd,
                              _write_merges)
    from test_clip_loss import _synthetic_sd as vision_sd
    merges = [("o", "o"), ("oo", "d</w>"), ("g", "ood</w>"), ("b", "ad</w>"),
              ("a", "d</w>"), ("p", "h"), ("ph", "ot"), ("phot", "o</w>")]
    bpe = _write_merges(tmp_path / "bpe.txt", merges)
    tok = SimpleBPETokenizer(bpe)
    clip_sd = vision_sd(width=64, patch=32, layers=2, out=16, seed=2)
    clip_sd.update(_synthetic_text_sd(vocab=tok.vocab_size, width=32,
                                      layers=2, context=16, out=16, seed=3))
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in clip_sd.items()}, tmp_path / "clip.pth")
    monkeypatch.setenv("FREQFUSION_CLIPIQA_WEIGHTS", str(tmp_path / "clip.pth"))
    monkeypatch.setenv("FREQFUSION_CLIP_BPE", bpe)

    from freqfusion_tpu.utils.perceptual_metrics import (
        PerceptualEvaluator, load_native_towers)
    towers = load_native_towers()
    assert set(towers) == {"lpips", "dists", "clipiqa", "musiq", "maniqa"}

    rng = np.random.default_rng(7)
    out = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    tgt = np.clip(out.astype(np.int32)
                  + rng.integers(-8, 8, out.shape), 0, 255).astype(np.uint8)
    means = {k: fn(out, tgt) for k, fn in towers.items()}
    means["niqe"] = 6.0
    assert all(np.isfinite(v) for v in means.values())
    score = PerceptualEvaluator.perceptual_score(means)
    # every term present: the score must move when any one term moves
    assert np.isfinite(score)
    bumped = dict(means, musiq=means["musiq"] + 10.0)
    assert abs(PerceptualEvaluator.perceptual_score(bumped)
               - score - 0.1) < 1e-9
