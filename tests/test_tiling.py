"""Tiled-inference invariants: seam-free reconstruction, arbitrary sizes."""

import numpy as np

from freqfusion_tpu.infer.tiling import num_tiles, tile_grid, tiled_sr
from freqfusion_tpu.ops.resize import upsample

import jax.numpy as jnp


def _bicubic_forward(tiles):
    return np.asarray(upsample(jnp.asarray(tiles), 4, "bicubic"))


def test_tile_grid_covers_everything():
    for size in (128, 129, 200, 255, 256, 300):
        starts = tile_grid(size, 128, 96)
        assert starts[0] == 0
        assert starts[-1] + 128 >= size
        covered = np.zeros(size, bool)
        for s in starts:
            covered[s:s + 128] = True
        assert covered.all()


def _nearest_forward(tiles):
    return np.asarray(upsample(jnp.asarray(tiles), 4, "nearest"))


def test_tiled_equals_full_for_pointwise_op():
    """With a purely local forward (nearest ×4, no receptive field), tiling +
    ramp stitching must reproduce the full-image result EXACTLY — proving the
    ramp weights normalize to 1 everywhere."""
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(100, 140, 3)).astype(np.float32)
    full = np.asarray(upsample(jnp.asarray(lr)[None], 4, "nearest"))[0]
    tiled = tiled_sr(lr, _nearest_forward, tile=64, overlap=16, batch=2)
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, atol=1e-5)


def test_tiled_close_to_full_for_bicubic():
    """Bicubic has a small receptive field; seams must stay visually exact
    (≤1e-2) thanks to the linear ramp blending."""
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(100, 140, 3)).astype(np.float32)
    full = np.asarray(upsample(jnp.asarray(lr)[None], 4, "bicubic"))[0]
    tiled = tiled_sr(lr, _bicubic_forward, tile=64, overlap=16, batch=2)
    assert np.abs(tiled - full).mean() < 1e-3


def test_small_image_single_tile():
    rng = np.random.default_rng(1)
    lr = rng.uniform(size=(40, 50, 3)).astype(np.float32)
    out = tiled_sr(lr, _bicubic_forward, tile=64, overlap=16, batch=1)
    assert out.shape == (160, 200, 3)


def test_num_tiles():
    assert num_tiles(128, 128, 128, 32) == 1
    assert num_tiles(256, 256, 128, 32) == 9  # 3x3 with stride 96


def test_whole_image_sr_pads_and_crops():
    from freqfusion_tpu.infer.tiling import whole_image_sr

    calls = {}

    def fwd(batch):
        calls["shape"] = batch.shape
        b, h, w, _ = batch.shape
        return np.repeat(np.repeat(batch, 4, axis=1), 4, axis=2)

    lr = np.random.default_rng(0).uniform(size=(37, 53, 3)).astype(np.float32)
    sr = whole_image_sr(lr, fwd, scale=4, multiple=16)
    assert calls["shape"] == (1, 48, 64, 3)
    assert sr.shape == (148, 212, 3)
    np.testing.assert_allclose(
        sr, np.repeat(np.repeat(lr, 4, axis=0), 4, axis=1), atol=1e-6)
