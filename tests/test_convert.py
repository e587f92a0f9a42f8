"""Converter unit tests: layout rules and tolerant-load semantics."""

import numpy as np
import pytest

from freqfusion_tpu.utils import convert as cv


def test_conv_kernel_oihw_to_hwio():
    t = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    out = cv._adapt(t, (5, 7, 3, 2), leaf="kernel")
    assert out.shape == (5, 7, 3, 2)
    np.testing.assert_allclose(out[1, 2, 0, 1], t[1, 0, 1, 2])


def test_dense_kernel_transposes():
    t = np.arange(6).reshape(2, 3).astype(np.float32)  # torch [out, in]
    out = cv._adapt(t, (3, 2), leaf="kernel")
    np.testing.assert_allclose(out, t.T)


def test_square_param_matrix_not_transposed():
    """expert_weights [E,bands] with E==bands must NOT be transposed — the
    regression behind the FrequencyAwareFusion parity fix."""
    t = np.arange(9).reshape(3, 3).astype(np.float32)
    out = cv._adapt(t, (3, 3), leaf="expert_weights")
    np.testing.assert_allclose(out, t)


def test_packed_mha_in_proj_transposes():
    t = np.arange(24).reshape(6, 4).astype(np.float32)  # torch [3E, E]
    out = cv._adapt(t, (4, 6), leaf="in_proj_weight")
    np.testing.assert_allclose(out, t.T)


def test_fill_params_strict_and_tolerant():
    params = {"a": {"kernel": np.zeros((2, 2), np.float32)},
              "b": {"bias": np.zeros((2,), np.float32)}}
    sd = {"a.weight": np.ones((2, 2), np.float32)}

    def key_fn(path):
        return ".".join(path[:-1]) + "." + {"kernel": "weight", "bias": "bias"}[path[-1]]

    with pytest.raises(KeyError):
        cv.fill_params(params, sd, key_fn, strict=True)
    filled, report = cv.fill_params(params, sd, key_fn, strict=False)
    assert report["loaded"] == 1 and len(report["missing"]) == 1
    np.testing.assert_allclose(filled["a"]["kernel"], np.ones((2, 2)).T)


def test_load_torch_checkpoint_unwrapping(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"module.layer.weight": torch.ones(2, 2)}
    torch.save({"params_ema": sd}, tmp_path / "c.pth")
    out = cv.load_torch_checkpoint(str(tmp_path / "c.pth"))
    assert "layer.weight" in out  # unwrapped + module. stripped
