"""Helpers for optional parity tests against the upstream PyTorch reference.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used purely as a
numerical oracle: we instantiate its torch modules with random weights,
convert the state dict with our converter, and require our TPU-native modules
to reproduce the outputs. Tests are skipped when the reference is absent.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, has_torch

requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference repo or torch not available")


def ref_import(modname: str):
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib
    return importlib.import_module(modname)


def to_nchw(x_nhwc: np.ndarray):
    import torch
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(t) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))


def torch_state_dict_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
