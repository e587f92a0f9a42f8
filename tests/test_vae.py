"""SD AutoencoderKL codec: architecture + converter parity with random
weights (VERDICT round-2 partial row 20 — TSD-SR's latent codec goes live
the moment the diffusers VAE state dict lands). The torch side hand-builds
the diffusers AutoencoderKL layout at tiny dims (diffusers itself isn't
installed here)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.vae import (
    AutoencoderKL, SDVAECodec, load_vae_params, vae_key_fn)
from freqfusion_tpu.utils.convert import fill_params

from ref_utils import has_torch, to_nchw, to_nhwc

CFG = dict(block_out_channels=(8, 16), layers_per_block=1, latent_channels=4,
           groups=4)


def _torch_vae(seed=0):
    """diffusers-layout AutoencoderKL at CFG dims, as plain torch modules.
    Returns (state_dict, encode_fn, decode_fn)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    g = CFG["groups"]

    class Res(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = nn.GroupNorm(g, cin, eps=1e-6)
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = nn.GroupNorm(g, cout, eps=1e-6)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

        def forward(self, x):
            h = self.conv1(F.silu(self.norm1(x)))
            h = self.conv2(F.silu(self.norm2(h)))
            if self.conv_shortcut is not None:
                x = self.conv_shortcut(x)
            return x + h

    class Attn(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.group_norm = nn.GroupNorm(g, c, eps=1e-6)
            self.to_q = nn.Linear(c, c)
            self.to_k = nn.Linear(c, c)
            self.to_v = nn.Linear(c, c)
            self.to_out = nn.ModuleList([nn.Linear(c, c)])

        def forward(self, x):
            b, c, hh, ww = x.shape
            t = self.group_norm(x).flatten(2).transpose(1, 2)  # [B,N,C]
            q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
            a = torch.softmax(q @ k.transpose(1, 2) * c ** -0.5, dim=-1)
            o = self.to_out[0](a @ v)
            return x + o.transpose(1, 2).reshape(b, c, hh, ww)

    import torch
    ch = CFG["block_out_channels"]
    lat = CFG["latent_channels"]

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(3, ch[0], 3, padding=1)
            self.down_blocks = nn.ModuleList()
            cin = ch[0]
            for i, c in enumerate(ch):
                blk = nn.Module()
                blk.resnets = nn.ModuleList(
                    [Res(cin if j == 0 else c, c)
                     for j in range(CFG["layers_per_block"])])
                if i < len(ch) - 1:
                    ds = nn.Module()
                    ds.conv = nn.Conv2d(c, c, 3, stride=2)
                    blk.downsamplers = nn.ModuleList([ds])
                self.down_blocks.append(blk)
                cin = c
            self.mid_block = nn.Module()
            self.mid_block.resnets = nn.ModuleList([Res(ch[-1], ch[-1]),
                                                    Res(ch[-1], ch[-1])])
            self.mid_block.attentions = nn.ModuleList([Attn(ch[-1])])
            self.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=1e-6)
            self.conv_out = nn.Conv2d(ch[-1], 2 * lat, 3, padding=1)

        def forward(self, x):
            x = self.conv_in(x)
            for i, blk in enumerate(self.down_blocks):
                for r in blk.resnets:
                    x = r(x)
                if hasattr(blk, "downsamplers"):
                    x = F.pad(x, (0, 1, 0, 1))
                    x = blk.downsamplers[0].conv(x)
            x = self.mid_block.resnets[0](x)
            x = self.mid_block.attentions[0](x)
            x = self.mid_block.resnets[1](x)
            return self.conv_out(F.silu(self.conv_norm_out(x)))

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            rch = list(reversed(ch))
            self.conv_in = nn.Conv2d(lat, rch[0], 3, padding=1)
            self.mid_block = nn.Module()
            self.mid_block.resnets = nn.ModuleList([Res(rch[0], rch[0]),
                                                    Res(rch[0], rch[0])])
            self.mid_block.attentions = nn.ModuleList([Attn(rch[0])])
            self.up_blocks = nn.ModuleList()
            cin = rch[0]
            for i, c in enumerate(rch):
                blk = nn.Module()
                blk.resnets = nn.ModuleList(
                    [Res(cin if j == 0 else c, c)
                     for j in range(CFG["layers_per_block"] + 1)])
                if i < len(rch) - 1:
                    us = nn.Module()
                    us.conv = nn.Conv2d(c, c, 3, padding=1)
                    blk.upsamplers = nn.ModuleList([us])
                self.up_blocks.append(blk)
                cin = c
            self.conv_norm_out = nn.GroupNorm(g, rch[-1], eps=1e-6)
            self.conv_out = nn.Conv2d(rch[-1], 3, 3, padding=1)

        def forward(self, z):
            x = self.conv_in(z)
            x = self.mid_block.resnets[0](x)
            x = self.mid_block.attentions[0](x)
            x = self.mid_block.resnets[1](x)
            for blk in self.up_blocks:
                for r in blk.resnets:
                    x = r(x)
                if hasattr(blk, "upsamplers"):
                    x = F.interpolate(x, scale_factor=2, mode="nearest")
                    x = blk.upsamplers[0].conv(x)
            return self.conv_out(F.silu(self.conv_norm_out(x)))

    class TorchVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)
            self.post_quant_conv = nn.Conv2d(lat, lat, 1)

    vae = TorchVAE()
    with torch.no_grad():
        for p in vae.parameters():
            p.mul_(0.3)

    def enc(x):
        with torch.no_grad():
            m = vae.quant_conv(vae.encoder(x))
            return m.chunk(2, dim=1)[0]

    def dec(z):
        with torch.no_grad():
            return vae.decoder(vae.post_quant_conv(z))

    return vae.state_dict(), enc, dec


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_vae_parity_random_weights(tmp_path):
    import torch
    sd, enc, dec = _torch_vae()
    path = str(tmp_path / "vae_random.pth")
    torch.save(sd, path)

    model = AutoencoderKL(**CFG)
    params = load_vae_params(model, path)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 16, 24, 3)).astype(np.float32)

    mean, logvar = model.apply(params, jnp.asarray(x), method="encode")
    t_mean = to_nhwc(enc(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(mean), t_mean, atol=1e-5, rtol=1e-4)
    assert mean.shape == (1, 8, 12, 4)  # ÷2 spatial (2 blocks → 1 downsample)

    z = rng.normal(size=mean.shape).astype(np.float32) * 0.5
    out = model.apply(params, jnp.asarray(z), method="decode")
    t_out = to_nhwc(dec(to_nchw(z)))
    np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_codec_flips_tsdsr_live(tmp_path, monkeypatch):
    import torch
    sd, _, _ = _torch_vae(seed=1)
    path = str(tmp_path / "vae_random.pth")
    torch.save(sd, path)
    monkeypatch.setenv("FREQFUSION_SDVAE_WEIGHTS", path)

    codec = SDVAECodec(model=AutoencoderKL(**CFG))
    img = jnp.asarray(np.random.default_rng(2).uniform(
        size=(1, 16, 16, 3)), jnp.float32)
    lat = codec.encode(img)
    assert lat.shape == (1, 8, 8, 4)
    rec = codec.decode(lat)
    assert rec.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(rec)).all()
    assert float(rec.min()) >= 0.0 and float(rec.max()) <= 1.0

    # sampled encode differs from the mean but stays finite
    lat_s = codec.encode(img, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(lat_s)).all()
    assert not np.allclose(np.asarray(lat_s), np.asarray(lat))

    # the codec flips TSDSRInference from identity to the real path
    from freqfusion_tpu.models.tsdsr import TSDSRDiT, TSDSRInference
    dit = TSDSRDiT(hidden=32, depth=1, heads=2)
    dparams = dit.init(jax.random.PRNGKey(0), lat)
    inf = TSDSRInference(dit=dit, params=dparams, codec=codec)
    assert inf.available
    refined = inf.refine(img)
    assert refined.shape == img.shape
    assert np.isfinite(np.asarray(refined)).all()
    # and without a codec it stays an identity (env cleared so the
    # constructor-time auto-load finds nothing)
    monkeypatch.delenv("FREQFUSION_SDVAE_WEIGHTS")
    ident = TSDSRInference(dit=dit, params=dparams, codec=None)
    assert not ident.available
    np.testing.assert_array_equal(np.asarray(ident.refine(img)),
                                  np.asarray(img))


def test_codec_raises_without_weights(monkeypatch):
    monkeypatch.delenv("FREQFUSION_SDVAE_WEIGHTS", raising=False)
    with pytest.raises(RuntimeError):
        SDVAECodec(model=AutoencoderKL(**CFG))
