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

Patch encoder: the official 5-layer ResNet root (MUSIQ paper §3.1; the
ViT-hybrid/BiT recipe the official implementation builds on) —
weight-standardized 7×7/2 root conv + GroupNorm(32) + ReLU + 3×3/2
max-pool + one pre-activation bottleneck unit (gn1→conv1x1→gn2→conv3x3→
gn3→conv1x1 with a 1×1 downsample projection), flattened and projected to
the hidden size by the `embedding` Dense. A checkpoint with conv-root keys
converts and runs (tested against a torch mirror of the same semantics in
tests/test_musiq.py); `_normalize_musiq_sd` folds known naming variants
(unit1/unit01, conv_proj/downsample) onto the canonical keys below.
Checkpoints in the r4 linear layout (`patch_embed.*`) still load — the
linear encoder remains as a documented lightweight fallback, selected by
the checkpoint's own keys.

Remaining (non-load-blocking) deviation: transformer blocks are standard
pre-norm ViT blocks named `blocks.{i}.*` as in timm.

State-dict contract (torch layouts; D=hidden, G=grid, S=#scales,
W=root width, C=bottleneck out):
  conv_root.weight [W, 3, 7, 7]   gn_root.{weight,bias} [W]
  block1.unit01.gn1.{weight,bias} [W]
  block1.unit01.conv1.weight [C/4, W, 1, 1]
  block1.unit01.gn2.{weight,bias} [C/4]
  block1.unit01.conv2.weight [C/4, C/4, 3, 3]
  block1.unit01.gn3.{weight,bias} [C/4]
  block1.unit01.conv3.weight [C, C/4, 1, 1]
  block1.unit01.downsample.weight [C, W, 1, 1]
  embedding.weight [D, (P/4)²·C]  embedding.bias [D]
  (or, linear fallback: patch_embed.weight [D, 3*P*P], patch_embed.bias)
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


class WSConv(nn.Module):
    """Weight-standardized conv (BiT StdConv): kernel standardized over
    (H,W,in) per output channel, eps 1e-10, no bias."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features))
        m = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        v = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - m) * jax.lax.rsqrt(v + 1e-10)
        # torch-style symmetric (k-1)//2 padding, NOT XLA "SAME": for even
        # inputs at stride 2 SAME pads (2,3) while torch pads (3,3) — the
        # checkpoints being served are torch (pyiqa) exports
        pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), self.strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _gn(width: int, name: str) -> nn.GroupNorm:
    """GroupNorm(32) with torch eps; group count divides small test widths."""
    import math
    return nn.GroupNorm(num_groups=math.gcd(32, width), epsilon=1e-5,
                        name=name)


class PreActBottleneck(nn.Module):
    """BiT pre-activation bottleneck (gn→relu before each conv), with a
    1×1 `downsample` projection when shape changes."""

    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out = jax.nn.relu(_gn(cin, "gn1")(x))
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = WSConv(self.cout, (1, 1), (self.stride, self.stride),
                              name="downsample")(out)
        out = WSConv(self.cmid, (1, 1), name="conv1")(out)
        out = WSConv(self.cmid, (3, 3), (self.stride, self.stride),
                     name="conv2")(jax.nn.relu(_gn(self.cmid, "gn2")(out)))
        out = WSConv(self.cout, (1, 1),
                     name="conv3")(jax.nn.relu(_gn(self.cmid, "gn3")(out)))
        return out + residual


class PatchResNetRoot(nn.Module):
    """The official 5-layer patch encoder: WS 7×7/2 root conv + GN + ReLU +
    3×3/2 max-pool + one pre-act bottleneck, flatten, Dense to hidden."""

    width: int = 64
    cout: int = 256
    hidden: int = 384

    @nn.compact
    def __call__(self, patches):     # [B, N, 3·P·P], flattened (P,P,3)
        b, n, _ = patches.shape
        x = patches.reshape(b * n, PATCH, PATCH, 3)
        x = WSConv(self.width, (7, 7), (2, 2), name="conv_root")(x)
        x = jax.nn.relu(_gn(self.width, "gn_root")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        x = PreActBottleneck(self.cout, max(1, self.cout // 4),
                             name="block1_unit01")(x)
        # flatten in torch's (C,H,W) order — the embedding Dense of a torch
        # (pyiqa) checkpoint expects torch .flatten(1) element order
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, n, -1)
        return nn.Dense(self.hidden, name="embedding")(x)


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
    conv_root: bool = True           # official 5-layer ResNet patch root
    root_width: int = 64
    root_cout: int = 256

    @nn.compact
    def __call__(self, patches, spatial_idx, scale_idx, mask):
        b, n, _ = patches.shape
        if self.conv_root:
            x = PatchResNetRoot(self.root_width, self.root_cout,
                                self.hidden, name="patch_root")(patches)
        else:
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
    if parts[0] == "patch_root":
        sub = parts[1]
        if sub == "conv_root":
            return "conv_root.weight"
        if sub == "gn_root":
            return f"gn_root.{lmap[leaf]}"
        if sub == "embedding":
            return f"embedding.{lmap[leaf]}"
        if sub == "block1_unit01":
            inner = parts[2]
            return f"block1.unit01.{inner}.{lmap[leaf]}"
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


def _normalize_musiq_sd(sd):
    """Fold known naming variants onto the canonical conv-root keys:
    `block1.unit1.` → `block1.unit01.`, `conv_proj`/`proj` inside the unit
    → `downsample`, a `patch_embedding.`/`resnet_emb.` prefix on the root
    keys → stripped."""
    out = {}
    for k, v in sd.items():
        for pref in ("patch_embedding.", "resnet_emb."):
            if k.startswith(pref):
                k = k[len(pref):]
        k = k.replace("block1.unit1.", "block1.unit01.")
        if k.startswith("block1.unit01."):
            k = k.replace(".conv_proj.", ".downsample.")
            k = k.replace(".proj.", ".downsample.")
        out[k] = v
    return out


def infer_musiq_config(sd) -> MUSIQTransformer:
    """Build the module from the checkpoint's own shapes (clipiqa's
    `infer_clip_config` pattern). Heads follow the width//64 rule; the
    patch encoder (official conv root vs linear fallback) is selected by
    the checkpoint's own keys."""
    hidden = sd["cls_token"].shape[-1]
    layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    grid2, _ = sd["spatial_embedding"].shape
    grid = int(round(np.sqrt(grid2)))
    conv_root = "conv_root.weight" in sd
    kw = {}
    if conv_root:
        kw = dict(root_width=sd["conv_root.weight"].shape[0],
                  root_cout=sd["block1.unit01.conv3.weight"].shape[0])
    return MUSIQTransformer(
        hidden=hidden, layers=layers, heads=max(1, hidden // 64),
        mlp_dim=sd["blocks.0.mlp.fc1.weight"].shape[0], grid=grid,
        num_scales=sd["scale_embedding"].shape[0], conv_root=conv_root,
        **kw)


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
        sd = _normalize_musiq_sd(cv.load_torch_checkpoint(weights_path))
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
