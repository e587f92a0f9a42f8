"""TSD-SR refinement + V2 fusion head: shape/identity/gradient invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.fusion_v2 import (
    AdaptiveFrequencyDecompositionV2, FusionHeadV2)
from freqfusion_tpu.models.tsdsr import (
    CompleteSRPipeline, DiT, TSDSRDiT, TSDSRInference, sinusoidal_time_embed)


def test_dit_shapes_and_zero_init():
    model = DiT(hidden=64, depth=2, heads=4, patch=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([500.0, 10.0]))
    out = model.apply(params, x, jnp.array([500.0, 10.0]))
    assert out.shape == x.shape
    # zero-init final layer + zero-init adaLN mod → exact zero noise at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_tsdsr_one_step_residual():
    model = TSDSRDiT(hidden=64, depth=1, heads=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # with zero-init DiT output, refinement is identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_time_embedding_distinct():
    e = sinusoidal_time_embed(jnp.array([1.0, 500.0]), 64)
    assert e.shape == (2, 64)
    assert float(jnp.abs(e[0] - e[1]).max()) > 0.1


def test_inference_identity_passthrough_without_weights():
    """Mirrors the reference's missing-weights passthrough
    (tsdsr_wrapper.py:322-333)."""
    pipe = CompleteSRPipeline()
    infer = TSDSRInference()
    sr = jnp.asarray(np.random.default_rng(2).uniform(
        size=(1, 16, 16, 3)).astype(np.float32))
    assert not infer.available
    np.testing.assert_allclose(np.asarray(infer.refine(sr)), np.asarray(sr))
    np.testing.assert_allclose(np.asarray(pipe(sr)), np.asarray(sr))


def test_v2_adaptive_decomposition_reconstructs():
    model = AdaptiveFrequencyDecompositionV2()
    x = jnp.asarray(np.random.default_rng(3).uniform(
        size=(2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    low, mid, high, (lt, ht) = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(low + mid + high), np.asarray(x),
                               atol=1e-3)
    assert np.all((0.15 <= np.asarray(lt)) & (np.asarray(lt) <= 0.40))
    assert np.all((0.60 <= np.asarray(ht)) & (np.asarray(ht) <= 0.85))


def test_v2_fusion_head_end_to_end():
    rng = np.random.default_rng(4)
    lr = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    outs = {n: jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
            for n in ("hat", "dat", "nafnet")}
    model = FusionHeadV2()
    variables = model.init(jax.random.PRNGKey(0), lr, outs)
    sr = model.apply(variables, lr, outs)
    assert sr.shape == (1, 32, 32, 3)
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params < 0.5e6  # compact variant (~167K in the reference)


# ---------------------------------------------------------------------------
# DiT checkpoint loader (VERDICT r3 #5): shape-analyzed load + torch parity
# ---------------------------------------------------------------------------

def _torch_dit_mirror(cfg, seed=0):
    """Torch mirror of models.tsdsr.DiT at cfg dims, serialized in the
    tsdsr_key_fn contract layout. Returns (state_dict, forward_fn) where
    forward_fn maps (NHWC latent np, timesteps np) -> NHWC np with the
    TSDSRDiT residual applied."""
    import math
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    hid, depth, heads = cfg["hidden"], cfg["depth"], cfg["heads"]
    p, cin, ted = cfg["patch"], cfg["in_channels"], cfg["time_embed_dim"]
    mlp = int(hid * cfg["mlp_ratio"])

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.ModuleDict({"mod": nn.Linear(hid, 2 * hid)})
            self.qkv = nn.Linear(hid, 3 * hid)
            self.proj = nn.Linear(hid, hid)
            self.norm2 = nn.ModuleDict({"mod": nn.Linear(hid, 2 * hid)})
            self.fc1 = nn.Linear(hid, mlp)
            self.fc2 = nn.Linear(mlp, hid)

        def _ada(self, x, cond, mod):
            scale, shift = mod(cond).chunk(2, dim=-1)
            x = F.layer_norm(x, (hid,), eps=1e-6)
            return x * (1 + scale[:, None]) + shift[:, None]

        def forward(self, x, cond):
            h = self._ada(x, cond, self.norm1["mod"])
            b, n, c = h.shape
            qkv = self.qkv(h).reshape(b, n, 3, heads, c // heads)
            q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c // heads),
                              dim=-1)
            x = x + self.proj((a @ v).transpose(1, 2).reshape(b, n, c))
            h = self._ada(x, cond, self.norm2["mod"])
            return x + self.fc2(F.gelu(self.fc1(h)))

    class TorchDiT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Conv2d(cin, hid, p, stride=p)
            self.time_fc1 = nn.Linear(ted, 4 * hid)
            self.time_fc2 = nn.Linear(4 * hid, hid)
            self.blocks = nn.ModuleList(Block() for _ in range(depth))
            self.norm = nn.LayerNorm(hid, eps=1e-6)
            self.final_layer = nn.Linear(hid, p * p * cin)

        def forward(self, x_nchw, t):
            tok = self.patch_embed(x_nchw)            # [B,hid,gh,gw]
            b, _, gh, gw = tok.shape
            tok = tok.flatten(2).transpose(1, 2)      # [B,N,hid]
            half = ted // 2
            freqs = torch.exp(-math.log(10000.0)
                              * torch.arange(half) / (half - 1))
            ang = t[:, None].float() * freqs[None]
            te = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)
            cond = self.time_fc2(F.gelu(self.time_fc1(te)))
            for blk in self.blocks:
                tok = blk(tok, cond)
            out = self.final_layer(self.norm(tok))
            out = out.reshape(b, gh, gw, p, p, cin)
            out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, cin)
            return out

    net = TorchDiT().eval()

    def forward(x_nhwc, ts):
        with torch.no_grad():
            x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
            out = net(x, torch.from_numpy(ts))        # NHWC already
            return x_nhwc + 0.1 * out.numpy()

    sd = {f"dit.{k}": v.detach().numpy() for k, v in net.state_dict().items()}
    # ModuleDict serializes norm1.mod as the contract expects already
    return sd, forward


TINY = dict(hidden=64, depth=2, heads=1, patch=2, in_channels=4,
            mlp_ratio=2.0, time_embed_dim=16)


def test_dit_loader_parity(tmp_path):
    """Synthetic torch checkpoint → loader infers config → ≤2e-4 parity."""
    import pytest
    torch = pytest.importorskip("torch")
    from freqfusion_tpu.models.tsdsr import infer_dit_config, load_tsdsr_params

    sd, fwd = _torch_dit_mirror(TINY)
    ck = tmp_path / "tsdsr_dit.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ck)

    cfg = infer_dit_config(sd)
    assert cfg == TINY

    model, variables = load_tsdsr_params(str(ck))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ts = np.array([500.0, 10.0], np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(ts)))
    ref = fwd(x, ts)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_inference_goes_live_from_env(tmp_path, monkeypatch):
    """TSDSRInference.available flips true with a checkpoint + codec
    (VERDICT r3 #5 'done' criterion)."""
    import pytest
    torch = pytest.importorskip("torch")

    sd, _ = _torch_dit_mirror(TINY)
    ck = tmp_path / "tsdsr_dit.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ck)
    monkeypatch.setenv("FREQFUSION_TSDSR_WEIGHTS", str(ck))

    class IdentityCodec:
        def encode(self, x):
            return jnp.concatenate([x, x[..., :1]], axis=-1)

        def decode(self, z):
            return z[..., :3]

    infer = TSDSRInference(codec=IdentityCodec())
    assert infer.available
    sr = jnp.asarray(np.random.default_rng(5).uniform(
        size=(1, 8, 8, 3)).astype(np.float32))
    out = np.asarray(infer.refine(sr))
    assert out.shape == sr.shape
    assert np.all((out >= 0.0) & (out <= 1.0))
    # random (non-zero-init) DiT weights: the refiner must actually act
    assert float(np.abs(out - np.asarray(sr)).max()) > 1e-5


def test_inference_degrades_on_bad_checkpoint(tmp_path, monkeypatch):
    bad = tmp_path / "bad.pth"
    bad.write_bytes(b"not a checkpoint")
    monkeypatch.setenv("FREQFUSION_TSDSR_WEIGHTS", str(bad))
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        infer = TSDSRInference()
    assert not infer.available
    assert any("TSD-SR DiT loading failed" in str(x.message) for x in w)
