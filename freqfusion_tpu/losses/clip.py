"""CLIP ViT-B/32 image encoder + Track-B prompt-similarity loss, TPU-native.

Re-design of the reference CLIPPerceptualLoss
(/root/reference/src/losses/perceptual_loss.py:856-989). The OpenAI CLIP
weights cannot be fetched in this zero-egress environment, but the full
loss goes live from a STOCK OpenAI CLIP state dict: when the checkpoint
carries the text-side keys (`token_embedding/transformer.*/ln_final/
text_projection`) and a BPE vocab is reachable (`bpe_path` or
FREQFUSION_CLIP_BPE), the reference's positive/negative prompt strings
(perceptual_loss.py:900-916) are embedded at init through the native CLIP
text transformer (utils/clipiqa.py), exactly as the reference does with
`clip.tokenize` + `encode_text`. Checkpoints that instead carry
precomputed `positive_features`/`negative_features` buffers keep working.
Structural conversion is tested with synthetic torch-layout state dicts in
tests/test_clip_loss.py.

Faithful semantics notes:
- the reference encodes images under `torch.no_grad()`, so the loss is a
  quality *penalty* with no gradient through CLIP — reproduced with
  `stop_gradient`;
- CLIP's MLP activation is QuickGELU (x·σ(1.702x)), not exact GELU.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import TorchMHA
from ..ops.resize import resize

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

# The reference's SR-tuned prompt lists (perceptual_loss.py:900-916)
POSITIVE_PROMPTS = (
    "a high quality detailed sharp photograph",
    "a professional clear image with fine details",
    "a sharp high resolution photo with crisp edges",
    "a perfectly focused detailed photograph",
    "an ultra high definition clear image",
)
NEGATIVE_PROMPTS = (
    "a blurry low quality noisy image",
    "an unclear distorted photograph",
    "a low resolution blurry picture",
    "a pixelated degraded image",
    "an out of focus fuzzy photo",
)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask=None):  # [B, N, E]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + TorchMHA(self.width, self.heads, dropout=0.0,
                         name="attn")(h, attn_mask=attn_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="c_fc")(h)
        h = nn.Dense(self.width, name="c_proj")(quick_gelu(h))
        return x + h


class CLIPVisionTransformer(nn.Module):
    """OpenAI CLIP visual tower (ViT-B/32 defaults).

    `__call__(x [B,224,224,3] normalized)` → [B, output_dim] UNnormalized
    image embeddings (callers l2-normalize, as the reference does).
    """

    patch: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        conv_w = self.param("conv1_kernel", nn.initializers.lecun_normal(),
                            (self.patch, self.patch, 3, self.width))
        x = jax.lax.conv_general_dilated(
            x, conv_w.astype(x.dtype), (self.patch, self.patch), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, self.width)

        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (self.width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (n + 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x],
            axis=1)
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = _ResidualAttentionBlock(self.width, self.heads,
                                        name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        return x @ proj


def clip_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → OpenAI CLIP `visual.*` key."""
    parts = [p for p in path if p != "params"]
    leaf = parts[-1]
    lmap = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "weight": "weight"}
    if parts[0] == "conv1_kernel":
        return "visual.conv1.weight"
    if parts[0] in ("class_embedding", "positional_embedding", "proj"):
        return f"visual.{parts[0]}"
    if parts[0] in ("ln_pre", "ln_post"):
        return f"visual.{parts[0]}.{lmap[leaf]}"
    if parts[0].startswith("resblocks_"):
        idx = parts[0].split("_")[1]
        base = f"visual.transformer.resblocks.{idx}"
        sub = parts[1]
        if sub == "attn":
            if leaf in ("in_proj_weight", "in_proj_bias"):
                return f"{base}.attn.{leaf}"
            return f"{base}.attn.out_proj.{lmap[leaf]}"
        if sub in ("ln_1", "ln_2"):
            return f"{base}.{sub}.{lmap[leaf]}"
        if sub in ("c_fc", "c_proj"):
            return f"{base}.mlp.{sub}.{lmap[leaf]}"
    raise KeyError(path)


class CLIPPerceptualLoss:
    """SNUCV prompt-similarity quality penalty (Track B), threshold 0.5.

    Weights resolution order: explicit `(params, pos_features,
    neg_features)`, then `weights_path`, then FREQFUSION_CLIP_WEIGHTS;
    without any, the constructor raises and CombinedLoss redirects the clip
    weight to the FFT loss — live the moment a checkpoint lands. Prompt
    features come from (in order): explicit buffers, the checkpoint's
    `positive_features`/`negative_features` buffers, or — the reference's
    own path — embedding the prompt strings through the checkpoint's text
    tower with the BPE tokenizer (`bpe_path` or FREQFUSION_CLIP_BPE).
    """

    def __init__(self, quality_threshold: float = 0.5, params=None,
                 pos_features=None, neg_features=None,
                 weights_path: Optional[str] = None,
                 model: Optional[CLIPVisionTransformer] = None,
                 bpe_path: Optional[str] = None,
                 positive_prompts=POSITIVE_PROMPTS,
                 negative_prompts=NEGATIVE_PROMPTS):
        self.quality_threshold = float(quality_threshold)
        self.model = model
        weights_path = weights_path or os.environ.get(
            "FREQFUSION_CLIP_WEIGHTS")
        if params is None and weights_path and os.path.exists(weights_path):
            self.model, params, pos_features, neg_features = load_clip_params(
                self.model, weights_path, bpe_path=bpe_path,
                positive_prompts=positive_prompts,
                negative_prompts=negative_prompts)
        if self.model is None:
            self.model = CLIPVisionTransformer()
        if params is None or pos_features is None or neg_features is None:
            raise RuntimeError(
                "CLIP pretrained weights unavailable (set "
                "FREQFUSION_CLIP_WEIGHTS — a stock OpenAI CLIP state dict "
                "plus FREQFUSION_CLIP_BPE embeds the reference prompts "
                "natively — or pass params + prompt features); CombinedLoss "
                "redirects the clip weight to the FFT loss")
        self.params = params

        def _norm(f):
            f = jnp.asarray(f, jnp.float32)
            return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

        self.pos = _norm(pos_features)
        self.neg = _norm(neg_features)

    def __call__(self, pred, target=None):
        x = jnp.clip(resize(pred, 224, 224, "bicubic"), 0.0, 1.0)
        mean = jnp.asarray(CLIP_MEAN, x.dtype)
        std = jnp.asarray(CLIP_STD, x.dtype)
        x = (x - mean) / std
        feats = jax.lax.stop_gradient(
            self.model.apply(self.params, x)).astype(jnp.float32)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        pos_sim = (feats @ self.pos.T).mean(axis=1)
        neg_sim = (feats @ self.neg.T).mean(axis=1)
        quality = (pos_sim - neg_sim + 1.0) / 2.0
        return jax.nn.relu(self.quality_threshold - quality + 0.1).mean()


def load_clip_params(model: Optional[CLIPVisionTransformer],
                     weights_path: str, bpe_path: Optional[str] = None,
                     positive_prompts=POSITIVE_PROMPTS,
                     negative_prompts=NEGATIVE_PROMPTS):
    """Convert an OpenAI CLIP state dict into (vision_module, vision
    variables, pos_features, neg_features).

    Prompt features: precomputed `positive_features`/`negative_features`
    buffers win if present; otherwise, when the state dict carries the
    text-side keys and a BPE vocab is reachable, the prompt strings are
    embedded through the native CLIP text transformer — the reference's
    init-time `clip.tokenize` + `encode_text` path
    (perceptual_loss.py:918-933). A vision `model=None` is inferred from
    the checkpoint shapes (any ViT CLIP size)."""
    from ..utils import convert as cv

    sd = cv.load_torch_checkpoint(weights_path)
    if model is None:
        from ..utils.clipiqa import infer_clip_config
        model = infer_clip_config(sd)[0]
    # shape-only init (a real model.init runs the whole tower forward)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3), jnp.float32)))
    params, report = cv.fill_params(variables["params"], sd, clip_key_fn,
                                    strict=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    pos = sd.get("positive_features")
    neg = sd.get("negative_features")
    if pos is None or neg is None:
        bpe_path = bpe_path or os.environ.get("FREQFUSION_CLIP_BPE")
        if "token_embedding.weight" in sd and bpe_path \
                and os.path.exists(bpe_path):
            pos, neg = _embed_prompts(sd, bpe_path, positive_prompts,
                                      negative_prompts)
    return model, {"params": params}, pos, neg


def _embed_prompts(sd, bpe_path: str, positive_prompts, negative_prompts):
    """Embed the prompt lists through the checkpoint's own text tower."""
    # lazy import: utils.clipiqa imports this module at load time
    from ..utils import convert as cv
    from ..utils.clipiqa import (SimpleBPETokenizer, clip_text_key_fn,
                                 infer_clip_config)

    text = infer_clip_config(sd)[1]
    tvars = jax.eval_shape(
        lambda: text.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, text.context), jnp.int32)))
    tparams, _ = cv.fill_params(tvars["params"], sd, clip_text_key_fn,
                                strict=True)
    tparams = {"params": jax.tree_util.tree_map(jnp.asarray, tparams)}
    tokenizer = SimpleBPETokenizer(bpe_path)
    ids = jnp.asarray(tokenizer.tokenize(
        list(positive_prompts) + list(negative_prompts), text.context))
    feats = np.asarray(jax.jit(text.apply)(tparams, ids))
    return (feats[: len(positive_prompts)], feats[len(positive_prompts):])
