"""Native C++ stitch accumulator vs the numpy fallback."""

import numpy as np
import pytest

import freqfusion_tpu.native as native
from freqfusion_tpu.infer.tiling import tiled_sr
from freqfusion_tpu.ops.resize import upsample

import jax.numpy as jnp


def _nearest_forward(tiles):
    return np.asarray(upsample(jnp.asarray(tiles), 4, "nearest"))


def test_cpp_lib_builds():
    lib = native.load_stitch_lib()
    if lib is None:
        pytest.skip("g++ unavailable — numpy fallback covered elsewhere")
    assert hasattr(lib, "stitch_accumulate")


def test_cpp_and_numpy_paths_agree(monkeypatch):
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(70, 90, 3)).astype(np.float32)

    with_lib = tiled_sr(lr, _nearest_forward, tile=32, overlap=8, batch=2)

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    without_lib = tiled_sr(lr, _nearest_forward, tile=32, overlap=8, batch=2)

    np.testing.assert_allclose(with_lib, without_lib, atol=1e-5)
    # exactness for a pointwise forward
    full = np.asarray(upsample(jnp.asarray(lr)[None], 4, "nearest"))[0]
    np.testing.assert_allclose(with_lib, full, atol=1e-5)
