"""Alternative / baseline fusion pipelines, TPU-native.

Re-design of the standalone fusion models in
/root/reference/src/models/fusion_network.py that sit beside the production
CompleteEnhancedFusionSR:

- `FrequencyAwareFusion` (:614-841): flat fusion — FrequencyRouter softmax
  routing × learnable expert_weights [E,bands] × softmax band_importance,
  aggregated across bands, normalized over experts, refined by a small conv
  (0.1 residual) + learnable bilinear LR residual.
- `MultiFusionSR` (:848-949): experts + FrequencyAwareFusion wrapper.
- `MultiResolutionFusion` (:956-1080): the flat 64→128→256 softmax fusion
  baseline the hierarchical module replaced.
- `EnhancedMultiFusionSR` (:1243-1336): the legacy all-improvements wrapper.

All accept expert outputs explicitly (the TPU design has no hooks); wrappers
compose with models.experts.ExpertEnsemble.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .fusion_blocks import FrequencyRouter, MultiScaleFeatureExtractor


class FrequencyAwareFusion(nn.Module):
    num_experts: int = 3
    num_bands: int = 3
    use_residual: bool = True
    use_multiscale: bool = True
    upscale: int = 4

    @nn.compact
    def __call__(self, lr, expert_outputs: Union[List, Dict], train: bool = False):
        if isinstance(expert_outputs, dict):
            expert_outputs = list(expert_outputs.values())
        stack = jnp.stack(expert_outputs, axis=-2)  # [B,Hr,Wr,E,3]
        h_hr, w_hr = stack.shape[1], stack.shape[2]
        e = len(expert_outputs)

        router_in = lr
        if self.use_multiscale:
            router_in = MultiScaleFeatureExtractor(32, name="multiscale")(lr, train)
        routing = FrequencyRouter(self.num_experts, self.num_bands,
                                  name="freq_router")(router_in, train)
        routing = routing[..., :e, :]  # [B,H,W,E,bands]

        b, h, w = routing.shape[:3]
        flat = routing.reshape(b, h, w, e * self.num_bands)
        flat_hr = resize(flat, h_hr, w_hr, "bilinear")
        routing_hr = flat_hr.reshape(b, h_hr, w_hr, e, self.num_bands)

        expert_w = self.param("expert_weights", nn.initializers.ones,
                              (self.num_experts, self.num_bands))[:e]
        band_imp = self.param("band_importance", nn.initializers.ones,
                              (self.num_bands,))
        weighted = routing_hr * expert_w * jax.nn.softmax(band_imp)
        agg = weighted.sum(axis=-1)  # [B,Hr,Wr,E]
        agg = agg / (agg.sum(axis=-1, keepdims=True) + 1e-8)
        fused = jnp.sum(stack * agg[..., None], axis=-2)

        r = nn.Conv(32, (3, 3), use_bias=False, name="refine_conv1")(fused)
        r = nn.Conv(3, (3, 3), use_bias=False, name="refine_conv2")(jax.nn.relu(r))
        fused = fused + r * 0.1

        if self.use_residual:
            rw = self.param("residual_weight", lambda k, s: jnp.asarray(0.1), ())
            fused = fused + rw * resize(lr, h_hr, w_hr, "bilinear")
        return jnp.clip(fused, 0.0, 1.0)


class MultiResolutionFusion(nn.Module):
    """Flat 3-stage softmax fusion at 64/128/256 with 0.3 progressive blends."""

    num_experts: int = 3
    base_channels: int = 32

    @nn.compact
    def __call__(self, lr, expert_outputs: List[jnp.ndarray],
                 target_size: Optional[int] = None):
        stack = jnp.stack(expert_outputs, axis=-2)  # [B,Hs,Ws,E,3]
        hs, ws = stack.shape[1], stack.shape[2]
        target_size = target_size or hs

        def router(t, name):
            # names follow the torch Sequential indices (fusion_64.0 / .2)
            g = nn.Conv(self.base_channels, (3, 3), name=f"{name}_0")(t)
            g = nn.Conv(self.num_experts, (1, 1), name=f"{name}_2")(jax.nn.relu(g))
            return jax.nn.softmax(g, axis=-1)  # over experts

        def fuse_at(size_h, size_w, name, experts):
            lr_s = resize(lr, size_h, size_w, "bilinear")
            wts = router(lr_s, name)
            return jnp.sum(experts * wts[..., None], axis=-2)

        def down_experts(size):
            b = stack.shape[0]
            flat = stack.reshape(b, hs, ws, -1)
            return resize(flat, size, size, "bilinear").reshape(
                b, size, size, self.num_experts, 3)

        fused_64 = fuse_at(64, 64, "fusion_64", down_experts(64))
        up = jax.nn.relu(nn.Conv(3, (3, 3), name="up_64_128_1")(
            resize(fused_64, 128, 128, "bilinear")))
        fused_128 = fuse_at(128, 128, "fusion_128", down_experts(128)) + up * 0.3
        up = jax.nn.relu(nn.Conv(3, (3, 3), name="up_128_256_1")(
            resize(fused_128, hs, ws, "bilinear")))
        fused = fuse_at(hs, ws, "fusion_256", stack)
        # the 256 router runs at the experts' native size; blend progressive
        fused = fused + resize(up, hs, ws, "bilinear") * 0.3 if up.shape[1] != hs \
            else fused + up * 0.3

        r = nn.Conv(32, (3, 3), name="refine_0")(fused)
        r = nn.Conv(3, (3, 3), name="refine_2")(jax.nn.relu(r))
        fused = fused + r * 0.1
        if fused.shape[1] != target_size:
            fused = resize(fused, target_size, target_size, "bilinear")
        return jnp.clip(fused, 0.0, 1.0)


class MultiFusionSR(nn.Module):
    """Experts (provided externally, frozen) + FrequencyAwareFusion."""

    num_experts: int = 3
    upscale: int = 4
    use_residual: bool = True
    use_multiscale: bool = True

    @nn.compact
    def __call__(self, lr, expert_outputs, train: bool = False):
        return FrequencyAwareFusion(
            self.num_experts, use_residual=self.use_residual,
            use_multiscale=self.use_multiscale, upscale=self.upscale,
            name="fusion")(lr, expert_outputs, train)


class EnhancedMultiFusionSR(nn.Module):
    """Legacy all-improvements wrapper: multi-res fusion when enabled, else
    the flat frequency-aware fusion (fusion_network.py:1243-1336)."""

    num_experts: int = 3
    upscale: int = 4
    use_multi_resolution: bool = False

    @nn.compact
    def __call__(self, lr, expert_outputs: Dict[str, jnp.ndarray],
                 train: bool = False):
        expert_list = list(expert_outputs.values())
        if self.use_multi_resolution:
            return MultiResolutionFusion(self.num_experts,
                                         name="multi_res_fusion")(
                lr, expert_list, target_size=expert_list[0].shape[1])
        return FrequencyAwareFusion(self.num_experts, upscale=self.upscale,
                                    name="fusion")(lr, expert_list, train)
