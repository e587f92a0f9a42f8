"""Quantify the two round-1 open parity risks (VERDICT weak #5):

(a) tiled-primary vs full-image forward — the reference runs full-image
    first (io.py:214-231); our TPU path always tiles. The fusion head's FFT
    band is global, so tiles legitimately see different frequency context;
    this bounds the whole-output and seam-region deltas.
(b) bf16 params+activations vs f32 — the production bench dtype.

Numbers are printed and recorded in PARITY.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.infer.tiling import tiled_sr
from freqfusion_tpu.models.experts import FreqFusionSR
from freqfusion_tpu.models.fusion import FusionConfig

TINY = dict(
    hat_kwargs=dict(embed_dim=24, depths=(1,), num_heads=(2,), window=4,
                    squeeze=6),
    dat_kwargs=dict(embed_dim=32, depths=(1,), num_heads=(2,),
                    split_size=(2, 4), expansion=2.0),
    nafnet_kwargs=dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                       dec_blk_nums=(1, 1)))


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


@pytest.fixture(scope="module")
def model_and_params():
    model = FreqFusionSR(FusionConfig(fusion_dim=16, num_heads=2,
                                      refine_depth=2, refine_channels=8),
                         **TINY)
    lr = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 3)),
                     jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), lr)
    return model, variables


def test_tiled_vs_full_image_delta(model_and_params):
    model, variables = model_and_params
    rng = np.random.default_rng(1)
    lr = rng.uniform(size=(40, 56, 3)).astype(np.float32)

    full = np.asarray(model.apply(variables, jnp.asarray(lr)[None])[0])
    full = np.clip(full, 0.0, 1.0)

    fwd = jax.jit(lambda t: jnp.clip(model.apply(variables, t), 0.0, 1.0))
    tiled = tiled_sr(lr, lambda t: np.asarray(fwd(jnp.asarray(t))),
                     tile=32, overlap=8, batch=2)
    tiled = np.clip(tiled, 0.0, 1.0)

    psnr = _psnr(tiled, full)
    max_delta = float(np.abs(tiled - full).max())
    # seam band: HR pixels within overlap·scale of a tile boundary
    seam = np.zeros(full.shape[:2], bool)
    for y in (24 * 4,):  # single interior boundary at tile=32, stride=24
        seam[y - 32:y + 32, :] = True
        seam[:, y - 32:y + 32] = True
    seam_delta = float(np.abs(tiled - full)[seam].max())
    print(f"\nPARITY tiled-vs-full: PSNR {psnr:.2f} dB, max|Δ| {max_delta:.4f}, "
          f"seam max|Δ| {seam_delta:.4f}")
    # tiles see different global-FFT context than the full image, so deltas
    # are real but must stay perceptually irrelevant
    assert psnr > 35.0, psnr
    assert max_delta < 0.15, max_delta


@pytest.mark.slow
def test_bf16_vs_f32_drift(model_and_params):
    model, variables = model_and_params
    rng = np.random.default_rng(2)
    lr = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)

    f32 = np.clip(np.asarray(model.apply(variables, jnp.asarray(lr))), 0, 1)
    vb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    bf = model.apply(vb, jnp.asarray(lr, jnp.bfloat16))
    bf = np.clip(np.asarray(bf.astype(jnp.float32)), 0, 1)

    psnr = _psnr(bf, f32)
    print(f"\nPARITY bf16-vs-f32: PSNR {psnr:.2f} dB, "
          f"max|Δ| {float(np.abs(bf - f32).max()):.4f}")
    assert psnr > 30.0, psnr
