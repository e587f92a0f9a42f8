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


def _mock_timm():
    """The image lacks timm; the reference HAT only needs to_2tuple and
    trunc_normal_ from it, so provide minimal equivalents."""
    import types
    if "timm.models.layers" in sys.modules:
        return
    import torch

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    for name in ("timm", "timm.models", "timm.models.layers", "timm.layers"):
        sys.modules.setdefault(name, types.ModuleType(name))
    for mod in (sys.modules["timm.models.layers"], sys.modules["timm.layers"]):
        mod.to_2tuple = to_2tuple
        mod.trunc_normal_ = trunc_normal_
        mod.DropPath = torch.nn.Identity


def _mock_torchvision():
    """The image lacks torchvision; the reference loss module imports it at
    top level but only uses it for the (optional) VGG backbone."""
    import types
    if "torchvision" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision mocked: no pretrained backbones here")

    tv = types.ModuleType("torchvision")
    mdl = types.ModuleType("torchvision.models")
    mdl.vgg19 = _unavailable
    mdl.VGG19_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = mdl
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = mdl


def ref_import(modname: str):
    # Append (not prepend): the reference repo has top-level train.py/test.py/
    # eval.py that would otherwise shadow OUR entry points for later tests.
    # All reference imports go through its `src.*` package, which the repo
    # does not have, so append resolves them fine.
    if REFERENCE_DIR not in sys.path:
        sys.path.append(REFERENCE_DIR)
    _mock_timm()
    _mock_torchvision()
    import importlib
    return importlib.import_module(modname)


def to_nchw(x_nhwc: np.ndarray):
    import torch
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def to_nhwc(t) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))


def torch_state_dict_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
