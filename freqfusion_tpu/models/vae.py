"""SD AutoencoderKL latent codec, TPU-native flax NHWC.

Re-design of the VAE the reference's TSD-SR wrapper pulls from diffusers
(/root/reference/src/models/tsdsr_wrapper.py:47-155: AutoencoderKL from
"stabilityai/stable-diffusion-2-1", scale 0.18215, frozen). The pretrained
weights cannot be fetched in this zero-egress environment, but the
architecture + converter are real: point `FREQFUSION_SDVAE_WEIGHTS` at the
diffusers VAE state dict (`.safetensors` or `.pth`, `encoder./decoder./
quant_conv/post_quant_conv` keys) and `SDVAECodec` goes live — which flips
`TSDSRInference.available` (models/tsdsr.py) from identity to the real
encode → refine → decode path. Random-weight parity against the diffusers
key layout is tested in tests/test_vae.py.

Default dims are the SD 2.1 VAE: 4-ch latent, ×8 spatial, block channels
(128, 256, 512, 512), 2 resnets/block, GroupNorm(32), SiLU, single-head
mid-block attention.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SD_SCALE_FACTOR = 0.18215


class _ResnetBlock(nn.Module):
    out_ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), name="conv1")(jax.nn.silu(h))
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), name="conv2")(jax.nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class _AttnBlock(nn.Module):
    """Single-head full self-attention over spatial tokens (the diffusers
    VAE mid-block `Attention`: group_norm → to_q/k/v → to_out, residual)."""

    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = nn.GroupNorm(self.groups, epsilon=1e-6, name="group_norm")(x)
        t = t.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(t)
        k = nn.Dense(c, name="to_k")(t)
        v = nn.Dense(c, name="to_v")(t)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q * c ** -0.5, k,
                       preferred_element_type=jnp.float32), axis=-1)
        o = jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = nn.Dense(c, name="to_out")(o)
        return x + o.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = _ResnetBlock(ch, self.groups, name=f"down_{i}_res_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                # diffusers Downsample2D: pad (0,1,0,1) + stride-2 VALID conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_{i}_ds")(x)
        ch = self.block_out_channels[-1]
        x = _ResnetBlock(ch, self.groups, name="mid_res_0")(x)
        x = _AttnBlock(self.groups, name="mid_attn")(x)
        x = _ResnetBlock(ch, self.groups, name="mid_res_1")(x)
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3),
                    name="conv_out")(jax.nn.silu(x))
        return x  # [B, H/8, W/8, 2*latent] (mean ‖ logvar)


class VAEDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    groups: int = 32

    @nn.compact
    def __call__(self, z):
        chans = list(reversed(self.block_out_channels))
        x = nn.Conv(chans[0], (3, 3), name="conv_in")(z)
        x = _ResnetBlock(chans[0], self.groups, name="mid_res_0")(x)
        x = _AttnBlock(self.groups, name="mid_attn")(x)
        x = _ResnetBlock(chans[0], self.groups, name="mid_res_1")(x)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block + 1):
                x = _ResnetBlock(ch, self.groups, name=f"up_{i}_res_{j}")(x)
            if i < len(chans) - 1:
                # diffusers Upsample2D: nearest ×2 + same conv
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), name=f"up_{i}_us")(x)
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="conv_norm_out")(x)
        return nn.Conv(self.out_channels, (3, 3),
                       name="conv_out")(jax.nn.silu(x))


class AutoencoderKL(nn.Module):
    """`encode(x)` → (mean, logvar); `decode(z)` → image; both NHWC.

    `__call__` round-trips deterministically (mode of the posterior) so a
    single init builds every param."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32

    def setup(self):
        self.encoder = VAEEncoder(self.block_out_channels,
                                  self.layers_per_block,
                                  self.latent_channels, self.groups)
        self.decoder = VAEDecoder(self.block_out_channels,
                                  self.layers_per_block, 3, self.groups)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, _ = self.encode(x)
        return self.decode(mean)


def vae_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → diffusers AutoencoderKL key, e.g.
    ('encoder','down_0_res_1','conv1','kernel')
      → 'encoder.down_blocks.0.resnets.1.conv1.weight'."""
    parts = [p for p in path if p != "params"]
    leaf = {"kernel": "weight", "bias": "bias", "scale": "weight"}[parts[-1]]
    mod = parts[0]
    if mod in ("quant_conv", "post_quant_conv"):
        return f"{mod}.{leaf}"
    if mod in ("encoder", "decoder"):
        return f"{mod}.{_local(parts[1], parts[2:-1])}.{leaf}"
    raise KeyError("/".join(parts))


def _local(name: str, rest) -> str:
    if name in ("conv_in", "conv_norm_out", "conv_out"):
        return name
    if name == "mid_attn":
        inner = rest[0] if rest else ""
        tgt = {"group_norm": "group_norm", "to_q": "to_q", "to_k": "to_k",
               "to_v": "to_v", "to_out": "to_out.0"}[inner]
        return f"mid_block.attentions.0.{tgt}"
    if name.startswith("mid_res_"):
        j = name.split("_")[-1]
        inner = rest[0] if rest else ""
        return f"mid_block.resnets.{j}.{inner}"
    if name.startswith("down_") and name.endswith("_ds"):
        return f"down_blocks.{name.split('_')[1]}.downsamplers.0.conv"
    if name.startswith("up_") and name.endswith("_us"):
        return f"up_blocks.{name.split('_')[1]}.upsamplers.0.conv"
    if "_res_" in name:
        kind, i, _, j = name.split("_")
        block = "down_blocks" if kind == "down" else "up_blocks"
        inner = rest[0] if rest else ""
        return f"{block}.{i}.resnets.{j}.{inner}"
    raise KeyError(name)


def load_vae_params(model: AutoencoderKL, weights_path: str):
    """Convert a diffusers AutoencoderKL state dict (.safetensors or torch
    .pth) into this module's params."""
    from ..utils import convert as cv

    if weights_path.endswith(".safetensors"):
        from safetensors import safe_open
        sd = {}
        with safe_open(weights_path, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    else:
        sd = cv.load_torch_checkpoint(weights_path)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    params, report = cv.fill_params(variables["params"], sd, vae_key_fn,
                                    strict=True)
    return {"params": params}


class SDVAECodec:
    """The latent codec TSDSRInference consumes: [0,1] NHWC image ↔
    scaled latent (tsdsr_wrapper.py:108-155 semantics, scale 0.18215).

    Weights resolution: explicit `params`, then `weights_path`, then the
    FREQFUSION_SDVAE_WEIGHTS env var; without any, the constructor raises
    and TSD-SR stays an identity passthrough (the reference's own
    missing-weights behavior)."""

    def __init__(self, params=None, weights_path: Optional[str] = None,
                 model: Optional[AutoencoderKL] = None,
                 scale_factor: float = SD_SCALE_FACTOR):
        self.model = model or AutoencoderKL()
        self.scale_factor = scale_factor
        weights_path = weights_path or os.environ.get(
            "FREQFUSION_SDVAE_WEIGHTS")
        if params is None and weights_path and os.path.exists(weights_path):
            params = load_vae_params(self.model, weights_path)
        if params is None:
            raise RuntimeError(
                "SD VAE weights unavailable (set FREQFUSION_SDVAE_WEIGHTS "
                "or pass params/weights_path); TSD-SR refinement stays an "
                "identity passthrough")
        self.params = params
        self._enc = jax.jit(lambda v, x: self.model.apply(v, x,
                                                          method="encode"))
        self._dec = jax.jit(lambda v, z: self.model.apply(v, z,
                                                          method="decode"))

    def encode(self, img: jnp.ndarray, rng: Optional[jax.Array] = None):
        """[B,H,W,3] in [0,1] → scaled latent [B,H/8,W/8,4] (posterior mean,
        or a sample when `rng` is given — the reference samples)."""
        mean, logvar = self._enc(self.params, img * 2.0 - 1.0)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * \
                jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.scale_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latent → [B,H,W,3] in [0,1]."""
        x = self._dec(self.params, z / self.scale_factor)
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
