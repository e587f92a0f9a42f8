"""VGG19 perceptual feature extractor, TPU-native flax.

Re-design of the reference's VGGFeatureExtractor / VGGPerceptualLoss
(/root/reference/src/losses/perceptual_loss.py:298-499). The IMAGENET1K
weights cannot be fetched in this zero-egress environment, but the
architecture + converter are real: point `weights_path` at a torchvision
VGG19 state dict (`features.N.weight` keys, or the reference loss module's
`feature_extractor.vgg_layers.N.weight` keys) and the loss is live.
Random-weight parity vs the torch layout is tested in
tests/test_vgg_loss.py.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19().features layout: conv indices and their widths
VGG19_CONV_CHANNELS = {
    0: 64, 2: 64,
    5: 128, 7: 128,
    10: 256, 12: 256, 14: 256, 16: 256,
    19: 512, 21: 512, 23: 512, 25: 512,
    28: 512, 30: 512, 32: 512, 34: 512,
}
#: relu layer name → torchvision features index (perceptual_loss.py:335-341)
LAYER_NAME_MAPPING = {
    "relu1_1": 1, "relu1_2": 3,
    "relu2_1": 6, "relu2_2": 8,
    "relu3_1": 11, "relu3_2": 13, "relu3_3": 15, "relu3_4": 17,
    "relu4_1": 20, "relu4_2": 22, "relu4_3": 24, "relu4_4": 26,
    "relu5_1": 29, "relu5_2": 31, "relu5_3": 33, "relu5_4": 35,
}
_POOL_INDICES = (4, 9, 18, 27, 36)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features(nn.Module):
    """VGG19 `.features` trunk up to the deepest requested relu.

    `__call__(x [B,H,W,3] in [0,1])` → {layer_name: [B,h,w,c]}.
    """

    feature_layers: Sequence[str] = ("relu2_2", "relu3_4", "relu4_4")
    use_input_norm: bool = True

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        max_idx = max(LAYER_NAME_MAPPING[l] for l in self.feature_layers)
        want = {LAYER_NAME_MAPPING[l]: l for l in self.feature_layers}
        feats: Dict[str, jnp.ndarray] = {}
        for idx in range(max_idx + 1):
            if idx in VGG19_CONV_CHANNELS:
                x = nn.Conv(VGG19_CONV_CHANNELS[idx], (3, 3),
                            name=f"conv_{idx}")(x)
            elif idx in _POOL_INDICES:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:  # relu slot
                x = jax.nn.relu(x)
            if idx in want:
                feats[want[idx]] = x
        return feats


def vgg_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torchvision key: ('conv_8','kernel') → 'features.8.weight'."""
    parts = [p for p in path if p != "params"]
    idx = parts[0].split("_")[1]
    leaf = {"kernel": "weight", "bias": "bias"}[parts[-1]]
    return f"features.{idx}.{leaf}"


DEFAULT_LAYER_WEIGHTS = {
    "relu1_2": 0.1, "relu2_2": 0.2, "relu3_4": 0.4,
    "relu4_4": 0.2, "relu5_4": 0.1,
}


class VGGPerceptualLoss:
    """Layer-weighted L1/L2 distance in VGG19 feature space
    (perceptual_loss.py:400-499).

    Weights resolution order: explicit `params`, then `weights_path`, then
    the FREQFUSION_VGG19_WEIGHTS env var; without any of these the
    constructor raises (zero-egress environment) and CombinedLoss redirects
    the vgg weight to the FFT loss — same degradation as round 1, but the
    loss goes live the moment a checkpoint lands.
    """

    def __init__(self, feature_layers: Optional[List[str]] = None,
                 layer_weights: Optional[Dict[str, float]] = None,
                 criterion: str = "l1",
                 params=None, weights_path: Optional[str] = None):
        self.feature_layers = list(feature_layers or
                                   ("relu2_2", "relu3_4", "relu4_4"))
        self.layer_weights = dict(layer_weights or DEFAULT_LAYER_WEIGHTS)
        if criterion not in ("l1", "l2"):
            raise ValueError(f"Unknown criterion: {criterion}")
        self.criterion = criterion
        self.model = VGG19Features(tuple(self.feature_layers))

        weights_path = weights_path or os.environ.get("FREQFUSION_VGG19_WEIGHTS")
        if params is None and weights_path and os.path.exists(weights_path):
            params = load_vgg19_params(self.model, weights_path)
        if params is None:
            raise RuntimeError(
                "VGG19 pretrained weights unavailable (set "
                "FREQFUSION_VGG19_WEIGHTS or pass params/weights_path); "
                "CombinedLoss redirects the vgg weight to the FFT loss")
        self.params = params

    def __call__(self, pred, target):
        pred = jnp.clip(pred, 0.0, 1.0)
        target = jax.lax.stop_gradient(jnp.clip(target, 0.0, 1.0))
        pf = self.model.apply(self.params, pred)
        tf = self.model.apply(self.params, target)
        loss, total_w = 0.0, 0.0
        for name in self.feature_layers:
            w = self.layer_weights.get(name, 1.0)
            d = pf[name] - tf[name]
            loss = loss + w * (jnp.mean(jnp.abs(d)) if self.criterion == "l1"
                               else jnp.mean(jnp.square(d)))
            total_w += w
        return loss / total_w


def load_vgg19_params(model: VGG19Features, weights_path: str):
    """Convert a torch VGG19 state dict (torchvision `features.N.*` keys or
    the reference loss module's `feature_extractor.vgg_layers.N.*` keys)."""
    from ..utils import convert as cv

    sd = cv.load_torch_checkpoint(weights_path)
    pref = "feature_extractor.vgg_layers."
    sd = {(f"features.{k[len(pref):]}" if k.startswith(pref) else k): v
          for k, v in sd.items()}
    # shape-only init (a real model.init runs the whole VGG forward on host)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3), jnp.float32)))
    params, report = cv.fill_params(variables["params"], sd, vgg_key_fn,
                                    strict=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return {"params": params}
