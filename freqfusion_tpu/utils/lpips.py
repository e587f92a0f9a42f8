"""Native LPIPS ('alex') — flax NHWC trunk + heads + torch-layout converter.

Re-design of the `lpips.LPIPS(net='alex')` metric the reference consumes
through the lpips/pyiqa packages (/root/reference/eval.py:52,110-122,
/root/reference/src/utils/perceptual_metrics.py:15-38). Those packages
download pretrained backbones, which a zero-egress environment cannot do —
but the architecture and converter here are real: point
`FREQFUSION_LPIPS_WEIGHTS` at a torch state dict holding the torchvision
AlexNet trunk (`features.N.weight/bias`) merged with the official LPIPS
linear heads (`lin{K}.model.1.weight`, shapes [1,C,1,1]) and the lpips
column in PerceptualEvaluator goes live. Random-weight parity against the
torch layout is tested in tests/test_lpips.py.

LPIPS recipe (Zhang et al. 2018, as shipped in the lpips package):
inputs in [-1,1] → fixed per-channel scaling → AlexNet relu1..relu5
features → channel-unit-normalize → squared difference → learned 1×1
no-bias head per tap → spatial mean → sum over taps.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision alexnet().features layout: index → (out_ch, kernel, stride, pad)
ALEX_CONVS = {
    0: (64, 11, 4, 2),
    3: (192, 5, 1, 2),
    6: (384, 3, 1, 1),
    8: (256, 3, 1, 1),
    10: (256, 3, 1, 1),
}
_ALEX_POOLS = (2, 5, 12)           # MaxPool2d(3, stride=2), VALID
_ALEX_TAPS = (1, 4, 7, 9, 11)      # relu1..relu5 slots
ALEX_TAP_CHANNELS = (64, 192, 384, 256, 256)

# lpips ScalingLayer constants (RGB, inputs in [-1,1])
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class AlexLPIPS(nn.Module):
    """`__call__(x0, x1)` — both [B,H,W,3] in [-1,1] — → [B] distances."""

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        # one batched trunk pass over both images (halves the conv calls)
        b = x0.shape[0]
        x = jnp.concatenate([x0, x1], axis=0)
        x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)

        taps = []
        for idx in range(max(_ALEX_TAPS) + 1):
            if idx in ALEX_CONVS:
                c, k, s, p = ALEX_CONVS[idx]
                x = nn.Conv(c, (k, k), strides=(s, s),
                            padding=((p, p), (p, p)), name=f"conv_{idx}")(x)
            elif idx in _ALEX_POOLS:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            else:  # relu slot
                x = jax.nn.relu(x)
            if idx in _ALEX_TAPS:
                taps.append(x)

        total = 0.0
        for k, feat in enumerate(taps):
            # channel-unit normalize (lpips normalize_tensor, eps=1e-10)
            norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
            feat = feat / (norm + 1e-10)
            d = jnp.square(feat[:b] - feat[b:])
            # learned 1×1 no-bias head → spatial average
            w = self.param(f"lin_{k}", nn.initializers.ones,
                           (d.shape[-1],), jnp.float32)
            # 1×1 no-bias conv + spatial average ≡ Σ_c w_c · mean_hw(d_c)
            total = total + jnp.sum(jnp.mean(d, axis=(1, 2)) * w, axis=-1)
        return total


def lpips_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torch key: ('conv_0','kernel') → 'features.0.weight',
    ('lin_2',) → 'lin2.model.1.weight'."""
    parts = [p for p in path if p != "params"]
    if parts[0].startswith("lin_"):
        return f"lin{parts[0].split('_')[1]}.model.1.weight"
    idx = parts[0].split("_")[1]
    leaf = {"kernel": "weight", "bias": "bias"}[parts[-1]]
    return f"features.{idx}.{leaf}"


class NativeLPIPS:
    """Jitted LPIPS('alex') distance on uint8 HWC RGB pairs.

    Weights resolution: explicit `params`, then `weights_path`, then the
    FREQFUSION_LPIPS_WEIGHTS env var; without any, the constructor raises
    and PerceptualEvaluator keeps reporting NaN for the lpips column (the
    reference's own unavailable-metric behavior, eval.py:120-123).
    """

    def __init__(self, params=None, weights_path: Optional[str] = None):
        self.model = AlexLPIPS()
        weights_path = weights_path or os.environ.get(
            "FREQFUSION_LPIPS_WEIGHTS")
        if params is None and weights_path and os.path.exists(weights_path):
            params = load_lpips_params(self.model, weights_path)
        if params is None:
            raise RuntimeError(
                "LPIPS pretrained weights unavailable (set "
                "FREQFUSION_LPIPS_WEIGHTS or pass params/weights_path)")
        self.params = params
        self._fn = jax.jit(self.model.apply)

    def __call__(self, output: np.ndarray, target: np.ndarray) -> float:
        """uint8 (or [0,255] float) HWC RGB images → LPIPS distance."""
        to_j = lambda a: jnp.asarray(
            np.asarray(a, np.float32)[None] / 127.5 - 1.0)
        return float(self._fn(self.params, to_j(output), to_j(target))[0])


def load_lpips_params(model: AlexLPIPS, weights_path: str):
    """Convert a merged torch state dict: torchvision alexnet
    `features.N.*` (optionally prefixed `net.`) + lpips `linK.model.1.weight`
    heads ([1,C,1,1] → per-channel vector)."""
    from . import convert as cv

    sd = cv.load_torch_checkpoint(weights_path)
    out = {}
    for k, v in sd.items():
        if k.startswith("net."):
            k = k[len("net."):]
        if k.startswith("lin") and k.endswith(".model.1.weight"):
            v = np.asarray(v).reshape(-1)  # [1,C,1,1] → [C]
        out[k] = v
    # shape-only init: the real model.init runs a forward (~17 s/process —
    # measured dominating the per-eval-worker tower load); every leaf is
    # overwritten by the checkpoint below anyway
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    params, report = cv.fill_params(variables["params"], out, lpips_key_fn,
                                    strict=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return {"params": params}
