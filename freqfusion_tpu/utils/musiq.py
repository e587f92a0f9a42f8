"""Native MUSIQ — multi-scale image quality transformer, TPU-native.

Re-design of the pyiqa `musiq` metric the reference's evaluator creates
(/root/reference/eval.py:48-58). MUSIQ (Ke et al., ICCV 2021) scores an
image with a small transformer over 32x32 patches drawn from a multi-scale
composition — the native-resolution image plus aspect-ratio-preserving
resizes — with three inductive-bias embeddings: a hash-based 2D spatial
embedding (a GxG learnable grid indexed by each patch's normalized
position), a per-scale embedding, and a CLS token whose final state feeds
the score head. The published koniq-trained model emits MOS in ~[0,100];
`perceptual_score` divides by 100 (eval.py:245-268 formula).

Weight gating follows the clipiqa pattern: the `musiq` column goes live
when FREQFUSION_MUSIQ_WEIGHTS points at a torch state dict in the layout
documented below (timm-style ViT naming). Configuration (hidden size,
depth, grid, scales) is inferred from the checkpoint's own shapes.

Documented deviations from the official release (same spirit as
clipiqa.py's ViT-for-RN50 swap, each visible in the state-dict contract):
- patch encoder: a linear projection of the flattened 32x32x3 patch
  (`patch_embed.*`), where the official model uses a 5-layer ResNet root;
  a checkpoint carrying conv-root keys fails loudly in `fill_params`
  rather than silently mis-loading.
- transformer blocks are standard pre-norm ViT blocks (the official
  model's layout), named `blocks.{i}.*` as in timm.

State-dict contract (torch layouts; D=hidden, G=grid, S=#scales):
  patch_embed.weight [D, 3*P*P]   patch_embed.bias [D]
  cls_token [1, 1, D]
  scale_embedding [S, D]          spatial_embedding [G*G, D]
  blocks.{i}.norm1.{weight,bias}
  blocks.{i}.attn.qkv.{weight [3D,D], bias}
  blocks.{i}.attn.proj.{weight [D,D], bias}
  blocks.{i}.norm2.{weight,bias}
  blocks.{i}.mlp.fc1.{weight [M,D], bias}   blocks.{i}.mlp.fc2.{weight [D,M], bias}
  norm.{weight,bias}              head.{weight [1,D], bias [1]}
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize

PATCH = 32
GRID = 10
# official multi-scale composition: native resolution + ARP resizes with
# these longer-side targets
LONGER_SIDES = (224, 384)
# sequence cap (bucketed): DIV2K-scale native grids reach ~3000 patches;
# padding to the next bucket keeps the jit program count small
SEQ_BUCKET = 512


class ViTBlock(nn.Module):
    """Pre-norm ViT block, timm layout (qkv packed), exact GELU."""

    dim: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        b, n, d = h.shape
        qkv = nn.Dense(3 * self.dim, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, -1), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        att = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(d // self.heads)
        if mask is not None:  # [B, N] True = real token
            att = jnp.where(mask[:, None, None, :], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(self.dim, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(h)


class MUSIQTransformer(nn.Module):
    """`__call__(patches [B,N,3*P*P], spatial_idx [B,N], scale_idx [B,N],
    mask [B,N]) -> [B]` quality scores.

    Tokens = linear patch embedding + spatial-hash embedding + scale
    embedding; CLS prepended; masked attention over padded positions;
    score = head(norm(cls))."""

    hidden: int = 384
    layers: int = 14
    heads: int = 6
    mlp_dim: int = 1152
    grid: int = GRID
    num_scales: int = 1 + len(LONGER_SIDES)

    @nn.compact
    def __call__(self, patches, spatial_idx, scale_idx, mask):
        b, n, _ = patches.shape
        x = nn.Dense(self.hidden, name="patch_embed")(patches)
        spatial = self.param("spatial_embedding",
                             nn.initializers.normal(0.02),
                             (self.grid * self.grid, self.hidden))
        scale = self.param("scale_embedding", nn.initializers.normal(0.02),
                           (self.num_scales, self.hidden))
        x = x + spatial[spatial_idx] + scale[scale_idx]
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.hidden))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.hidden)), x],
                            axis=1)
        x = jnp.where(  # zero padded tokens so they can't leak via residuals
            jnp.concatenate([jnp.ones((b, 1), bool), mask], 1)[..., None],
            x, 0.0)
        full_mask = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)
        for i in range(self.layers):
            x = ViTBlock(self.hidden, self.heads, self.mlp_dim,
                         name=f"blocks_{i}")(x, full_mask)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(1, name="head")(x[:, 0])[:, 0]


def musiq_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → documented torch key (see module docstring)."""
    parts = [p for p in path if p != "params"]
    leaf = parts[-1]
    lmap = {"kernel": "weight", "scale": "weight", "bias": "bias"}
    if parts[0] in ("cls_token", "spatial_embedding", "scale_embedding"):
        return parts[0]
    if parts[0] == "patch_embed":
        return f"patch_embed.{lmap[leaf]}"
    if parts[0] == "norm":
        return f"norm.{lmap[leaf]}"
    if parts[0] == "head":
        return f"head.{lmap[leaf]}"
    if parts[0].startswith("blocks_"):
        i = parts[0].split("_")[1]
        sub = parts[1]
        if sub in ("norm1", "norm2"):
            return f"blocks.{i}.{sub}.{lmap[leaf]}"
        if sub in ("qkv", "proj"):
            return f"blocks.{i}.attn.{sub}.{lmap[leaf]}"
        if sub in ("fc1", "fc2"):
            return f"blocks.{i}.mlp.{sub}.{lmap[leaf]}"
    raise KeyError(path)


def infer_musiq_config(sd) -> MUSIQTransformer:
    """Build the module from the checkpoint's own shapes (clipiqa's
    `infer_clip_config` pattern). Heads follow the width//64 rule."""
    hidden = sd["cls_token"].shape[-1]
    layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    grid2, _ = sd["spatial_embedding"].shape
    grid = int(round(np.sqrt(grid2)))
    return MUSIQTransformer(
        hidden=hidden, layers=layers, heads=max(1, hidden // 64),
        mlp_dim=sd["blocks.0.mlp.fc1.weight"].shape[0], grid=grid,
        num_scales=sd["scale_embedding"].shape[0])


# ---------------------------------------------------------------------------
# multi-scale patch composition (host-side numpy)
# ---------------------------------------------------------------------------

def _arp_size(h: int, w: int, longer: int) -> Tuple[int, int]:
    """Aspect-ratio-preserving target with the longer side == `longer`."""
    if h >= w:
        return longer, max(1, round(w * longer / h))
    return max(1, round(h * longer / w)), longer


def _patchify(img: np.ndarray, grid: int):
    """float img [H,W,3] → (patches [n,3PP], spatial hash [n]) with the
    image zero-padded up to PATCH multiples (official behavior: partial
    border patches participate, zero-filled)."""
    h, w, _ = img.shape
    hp, wp = -(-h // PATCH) * PATCH, -(-w // PATCH) * PATCH
    img = np.pad(img, [(0, hp - h), (0, wp - w), (0, 0)])
    gh, gw = hp // PATCH, wp // PATCH
    p = img.reshape(gh, PATCH, gw, PATCH, 3).transpose(0, 2, 1, 3, 4)
    patches = p.reshape(gh * gw, 3 * PATCH * PATCH)
    # hash: patch-center position normalized by the ORIGINAL extent,
    # quantized onto the GxG grid
    ys = (np.arange(gh) + 0.5) * PATCH / max(h, 1)
    xs = (np.arange(gw) + 0.5) * PATCH / max(w, 1)
    ti = np.clip((ys * grid).astype(np.int32), 0, grid - 1)
    tj = np.clip((xs * grid).astype(np.int32), 0, grid - 1)
    hash_ = (ti[:, None] * grid + tj[None, :]).reshape(-1)
    return patches.astype(np.float32), hash_.astype(np.int32)


def compose_multiscale(img: np.ndarray, grid: int = GRID,
                       longer_sides: Sequence[int] = LONGER_SIDES,
                       max_seq: Optional[int] = None):
    """uint8/float HWC RGB → (patches [N,3PP], spatial_idx [N],
    scale_idx [N]) over the native image (scale 0) + ARP resizes.

    `max_seq` drops native-scale patches beyond the budget by uniform
    striding (scoring stays deterministic); the resized scales always fit.
    """
    x = np.asarray(img, np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    h, w, _ = x.shape
    per_scale: List[Tuple[np.ndarray, np.ndarray, int]] = []
    for s, longer in enumerate(longer_sides, start=1):
        rh, rw = _arp_size(h, w, longer)
        r = np.asarray(resize(jnp.asarray(x[None]), rh, rw, "bicubic"))[0]
        p, hsh = _patchify(np.clip(r, 0.0, 1.0), grid)
        per_scale.append((p, hsh, s))
    p0, h0 = _patchify(x, grid)
    if max_seq is not None:
        budget = max_seq - sum(p.shape[0] for p, _, _ in per_scale)
        if budget > 0 and p0.shape[0] > budget:
            sel = np.linspace(0, p0.shape[0] - 1, budget).astype(np.int64)
            p0, h0 = p0[sel], h0[sel]
    per_scale.insert(0, (p0, h0, 0))
    patches = np.concatenate([p for p, _, _ in per_scale])
    spatial = np.concatenate([hh for _, hh, _ in per_scale])
    scales = np.concatenate([np.full(p.shape[0], s, np.int32)
                             for p, _, s in per_scale])
    return patches, spatial, scales


class NativeMUSIQ:
    """MUSIQ score on uint8 HWC RGB images (koniq scale, ~[0,100]).

    Weights resolve from `weights_path` or FREQFUSION_MUSIQ_WEIGHTS;
    without them, raises and the musiq column stays NaN. The patch
    sequence pads to SEQ_BUCKET multiples with masked attention so a
    ragged directory compiles a handful of programs, not one per image."""

    def __init__(self, weights_path: Optional[str] = None,
                 model: Optional[MUSIQTransformer] = None,
                 max_seq: int = 4 * SEQ_BUCKET):
        from . import convert as cv

        weights_path = weights_path or os.environ.get(
            "FREQFUSION_MUSIQ_WEIGHTS")
        if not (weights_path and os.path.exists(weights_path)):
            raise RuntimeError(
                "MUSIQ needs FREQFUSION_MUSIQ_WEIGHTS (state dict in the "
                "layout documented in utils/musiq.py)")
        sd = cv.load_torch_checkpoint(weights_path)
        self.model = model if model is not None else infer_musiq_config(sd)
        shapes = jax.eval_shape(
            lambda: self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 4, 3 * PATCH * PATCH), jnp.float32),
                jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), bool)))
        params, _ = cv.fill_params(shapes["params"], sd, musiq_key_fn,
                                   strict=True)
        self.variables = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                           params)}
        self.max_seq = max_seq
        self._fn = jax.jit(self.model.apply)

    def __call__(self, output: np.ndarray, target=None) -> float:
        p, sp, sc = compose_multiscale(output, grid=self.model.grid,
                                       max_seq=self.max_seq)
        n = p.shape[0]
        npad = -(-n // SEQ_BUCKET) * SEQ_BUCKET
        pad = npad - n
        p = np.pad(p, [(0, pad), (0, 0)])
        sp, sc = np.pad(sp, (0, pad)), np.pad(sc, (0, pad))
        mask = np.arange(npad) < n
        return float(self._fn(self.variables, jnp.asarray(p[None]),
                              jnp.asarray(sp[None]), jnp.asarray(sc[None]),
                              jnp.asarray(mask[None]))[0])
