"""Expert ensemble + full live model, TPU-native.

Replaces the reference's ExpertEnsemble (expert_loader.py:176-1112). The
reference achieves "parallel" expert execution with per-GPU placement, CUDA
streams and a thread pool (expert_loader.py:709-766); on TPU the three
experts are ONE jitted program — XLA overlaps and schedules them, and
multi-chip scaling shards the *tile batch* over the mesh instead of placing
experts on devices (SURVEY.md §2.8).

Feature taps (hook-based in the reference, expert_loader.py:817-883) are the
experts' explicit second return values:
  hat    [B,H,W,180] (conv_after_body out)
  dat    [B,H,W,180] (conv_after_body out)
  nafnet [B,4H,4W,64] (ending-conv input, HR resolution)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .dat import DAT
from .fusion import FusionConfig, FusionHead
from .hat import HAT
from .nafnet import NAFNetSR


class ExpertEnsemble(nn.Module):
    """Runs HAT-L, DAT and NAFNet-64 on an LR batch.

    H and W must be multiples of the HAT window (16) — the tiling driver
    guarantees this; pad with `ops.common.pad_to_multiple` otherwise
    (reference pad_to_window_size, expert_loader.py:63-91).
    """

    upscale: int = 4
    # per-expert constructor overrides (tests use tiny topologies)
    hat_kwargs: Optional[dict] = None
    dat_kwargs: Optional[dict] = None
    nafnet_kwargs: Optional[dict] = None

    def setup(self):
        self.hat = HAT(upscale=self.upscale, **(self.hat_kwargs or {}))
        self.dat = DAT(upscale=self.upscale, **(self.dat_kwargs or {}))
        self.nafnet = NAFNetSR(upscale=self.upscale, **(self.nafnet_kwargs or {}))

    def __call__(self, lr) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        h, w = lr.shape[1], lr.shape[2]
        hat_sr, hat_feat = self.hat(lr)
        dat_sr, dat_feat = self.dat(lr)
        naf_sr, naf_feat = self.nafnet(lr)
        outputs = {
            "hat": jnp.clip(hat_sr, 0.0, 1.0),
            "dat": jnp.clip(dat_sr, 0.0, 1.0),
            "nafnet": naf_sr,  # already clamped inside NAFNetSR
        }
        # all features resized to LR resolution, like the reference's hook
        # post-processing (expert_loader.py:936-949)
        features = {
            "hat": hat_feat,
            "dat": dat_feat,
            "nafnet": resize(naf_feat, h, w, "bilinear"),
        }
        return outputs, features


class FreqFusionSR(nn.Module):
    """The complete live model: frozen experts → trainable fusion head.

    `__call__(lr, with_features=False, train=False)` → SR [B,4H,4W,3].
    """

    cfg: FusionConfig = FusionConfig()
    hat_kwargs: Optional[dict] = None
    dat_kwargs: Optional[dict] = None
    nafnet_kwargs: Optional[dict] = None

    def setup(self):
        self.experts = ExpertEnsemble(
            upscale=self.cfg.upscale, hat_kwargs=self.hat_kwargs,
            dat_kwargs=self.dat_kwargs, nafnet_kwargs=self.nafnet_kwargs)
        self.fusion = FusionHead(self.cfg)

    def __call__(self, lr, with_features: bool = False, train: bool = False):
        outputs, features = self.experts(lr)
        # experts are frozen: no gradient flows back into them
        outputs = {k: jax.lax.stop_gradient(v) for k, v in outputs.items()}
        features = {k: jax.lax.stop_gradient(v) for k, v in features.items()}
        feats: Optional[Dict[str, jnp.ndarray]] = features if with_features else None
        return self.fusion(lr, outputs, feats, train)
