"""PyTorch → JAX checkpoint conversion.

The reference ships three expert checkpoints (HAT-L / DAT / NAFNet `.pth`)
plus the trained fusion-head checkpoint. This module converts them into the
framework's NHWC flax param pytrees, reproducing the reference's tolerant
loading semantics (`expert_loader.load_checkpoint_flexible`, lines 99-169:
unwrap `params_ema`/`params`/`state_dict`/`model`, strip `module.`/`model.`
prefixes, shape-checked partial load).

Machinery: a flax param tree is flattened to path tuples; a per-model
`key_fn(path) -> torch_key` translates each path to the torch state-dict key;
tensors are transposed by rank (conv OIHW→HWIO, linear OI→IO) or reshaped.
This direction (walk *our* tree, pull from torch) guarantees every parameter
of the new model is either filled or explicitly reported.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Tuple

import numpy as np

from flax import traverse_util


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into {key: np.ndarray}, with flexible unwrapping."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("params_ema", "params", "state_dict", "model", "model_state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "detach"):
            for pref in ("module.", "model."):
                if k.startswith(pref):
                    k = k[len(pref):]
            out[k] = v.detach().cpu().numpy()
    return out


def _adapt(torch_arr: np.ndarray, flax_shape: Tuple[int, ...],
           leaf: str = "kernel") -> np.ndarray:
    """Convert a torch tensor to the flax leaf layout.

    2-D transposition applies only to weight kernels (Dense OI→IO, packed
    MHA in_proj) — plain square parameter matrices (e.g. the fusion head's
    expert_weights [E,bands]) must pass through untouched.
    """
    a = np.asarray(torch_arr)
    # "*_kernel" covers raw-param attention weights (hat.WindowAttention)
    transposable = (leaf in ("kernel", "in_proj_weight")
                    or leaf.endswith("_kernel"))
    if a.ndim == 4 and len(flax_shape) == 4 and transposable:
        a = np.transpose(a, (2, 3, 1, 0))  # OIHW → HWIO
    elif (a.ndim == 4 and a.shape[2:] == (1, 1) and len(flax_shape) == 2
          and transposable and a.shape[:2] == flax_shape[::-1]):
        a = a[:, :, 0, 0].T  # 1x1 conv OI11 → Dense IO
    elif (a.ndim == 2 and len(flax_shape) == 2 and transposable
          and a.shape == flax_shape[::-1]):
        a = a.T  # linear OI → IO
    if a.shape != tuple(flax_shape):
        a = a.reshape(flax_shape)
    return a


class Stacked:
    """Key spec for a scan-stacked flax leaf (lax.scan over identical
    blocks stacks their params along leading axes).

    `naxes` leading axes of the leaf are stack dims; `fmt(*idx)` yields the
    torch key of each slice. fill_params gathers every slice (row-major over
    the leading dims) and stacks.
    """

    def __init__(self, naxes: int, fmt: Callable[..., str]):
        self.naxes = naxes
        self.fmt = fmt

    def keys(self, leaf_shape: Tuple[int, ...]):
        dims = tuple(leaf_shape[: self.naxes])
        return [self.fmt(*idx) for idx in np.ndindex(dims)]


def fill_params(flax_params, torch_sd: Dict[str, np.ndarray],
                key_fn: Callable[[Tuple[str, ...]], str],
                strict: bool = True):
    """Fill a flax param tree from a torch state dict.

    Returns (new_params, report) where report lists missing/unused keys.
    With strict=True a missing torch key raises; strict=False keeps the
    existing (random-init) leaf like the reference's strict=False load.
    `key_fn` may return a `Stacked` spec for scan-stacked leaves, whose
    slices are gathered and stacked along the leading axes.
    """
    flat = traverse_util.flatten_dict(flax_params)
    used, missing = set(), []
    out = {}
    for path, leaf in flat.items():
        tkey = key_fn(path)
        shape = tuple(np.asarray(leaf).shape) if not hasattr(leaf, "shape") \
            else tuple(leaf.shape)
        # eval_shape trees carry ShapeDtypeStruct leaves — np.asarray on
        # those yields dtype=object; prefer the leaf's own dtype.
        dtype = leaf.dtype if hasattr(leaf, "dtype") \
            else np.asarray(leaf).dtype
        if isinstance(tkey, Stacked):
            keys = tkey.keys(shape)
            slice_shape = shape[tkey.naxes:]
            absent = [k for k in keys if k not in torch_sd]
            if absent:
                if strict:
                    raise KeyError(
                        f"torch key {absent[0]!r} (slice of flax path {path})"
                        " not found")
                missing.append((path, absent[0]))
                out[path] = leaf
                continue
            stacked = np.stack([_adapt(torch_sd[k], slice_shape, path[-1])
                                for k in keys])
            out[path] = stacked.reshape(shape).astype(dtype)
            used.update(keys)
        elif tkey in torch_sd:
            out[path] = _adapt(torch_sd[tkey], shape,
                               path[-1]).astype(dtype)
            used.add(tkey)
        else:
            if strict:
                raise KeyError(f"torch key {tkey!r} (for flax path {path}) not found")
            missing.append((path, tkey))
            out[path] = leaf
    unused = [k for k in torch_sd if k not in used]
    report = {"missing": missing, "unused": unused,
              "loaded": len(used), "total": len(flat)}
    return traverse_util.unflatten_dict(out), report


_IDX = re.compile(r"^(.*)_(\d+)$")


def _split_idx(name: str):
    m = _IDX.match(name)
    return (m.group(1), int(m.group(2))) if m else (name, None)


_LEAF = {"kernel": "weight", "bias": "bias", "weight": "weight",
         "scale": "weight", "beta": "beta", "gamma": "gamma",
         "running_mean": "running_mean", "running_var": "running_var",
         "temperature": "temperature",
         "relative_position_bias_table": "relative_position_bias_table"}

#: torch buffer keys that have no parameter equivalent in the new framework
#: (precomputed tables we rebuild in numpy, BN bookkeeping counters).
EXPECTED_UNUSED = (
    "num_batches_tracked", "rpe_biases", "relative_position_index",
    "attn_mask", "relative_position_index_SA", "relative_position_index_OCA",
    # frequency-stack buffers rebuilt in numpy
    "dct_basis", "low_mask", "mid_mask", "high_mask",
    "lo_row", "hi_row", "lo_col", "hi_col", "gaussian.kernel",
    # fusion-head params the shipped forward path never uses
    # (constructed-but-unused in the reference: enhanced_fusion.py:258-261 +
    # the FrequencyRouter, used only in the non-hierarchical branch)
    "expert_weights", "band_importance", "freq_router.",
)


def filter_unused(keys):
    return [k for k in keys if not any(t in k for t in EXPECTED_UNUSED)]


def nafnet_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torch key for the NAFNet backbone state dict.

    ('nafnet','encoders_0','blocks_1','conv1','kernel') → 'encoders.0.1.conv1.weight'
    ('nafnet','downs_0','kernel')                       → 'downs.0.weight'
    ('nafnet','ups_0','kernel')                         → 'ups.0.0.weight'
    ('nafnet','...','sca','kernel')                     → '...sca.1.weight'
    """
    parts = [p for p in path if p != "params"]
    if parts and parts[0] == "nafnet":
        parts = parts[1:]
    toks = []
    for i, p in enumerate(parts[:-1]):
        base, idx = _split_idx(p)
        if base == "blocks":
            toks.append(str(idx))  # torch Sequential flattens stage blocks
        elif idx is not None:
            toks.extend([base, str(idx)])
            if base == "ups":
                toks.append("0")  # Sequential(conv, PixelShuffle)
        else:
            toks.append(p)
    leaf = _LEAF[parts[-1]]
    if toks and toks[-1] == "sca":
        toks.append("1")  # Sequential(AdaptiveAvgPool2d, Conv2d)
    return ".".join(toks + [leaf]) if toks else leaf


# Renames of our structured module paths back to the reference DAT layout.
_DAT_SEQ = {
    "before_rg_norm": "before_RG.1",
    "conv_before_upsample": "conv_before_upsample.0",
    "dwconv": "dwconv.0",
    "dwconv_bn": "dwconv.1",
    "sg_norm": "sg.norm",
    "sg_conv": "sg.conv",
    "pos1_norm": "pos1.0",
    "pos1_fc": "pos1.2",
    "pos2_norm": "pos2.0",
    "pos2_fc": "pos2.2",
    "pos3_norm": "pos3.0",
    "pos3_fc": "pos3.2",
}
_DAT_CI = {"fc1": "1", "bn": "2", "fc2": "4"}   # Sequential(GAP,Conv,BN,GELU,Conv)
_DAT_SI = {"fc1": "0", "bn": "1", "fc2": "3"}   # Sequential(Conv,BN,GELU,Conv)


def dat_key_fn(path: Tuple[str, ...]):
    """Flax path → torch key (or Stacked spec) for the DAT state dict.

    ('layers_0','blocks_1','attn','attns_0','pos','pos1_fc','kernel')
      → 'layers.0.blocks.1.attn.attns.0.pos.pos1.2.weight'

    Scanned layout (models/dat.py _RGPair scan): subtree 'layers'/'g{0,1}'
    stacks the (even-rg, odd-rg) group pairs → Stacked spec over torch
    'layers.{2*gi+g}' keys.
    """
    parts = [p for p in path if p != "params"]
    if parts and parts[0] == "layers":
        g = int(parts[1][1:])          # 'g0' / 'g1'
        rest = list(parts[2:])
        return Stacked(1, lambda gi: _dat_parts_key(
            [f"layers_{2 * gi + g}"] + rest))
    return _dat_parts_key(parts)


def _dat_parts_key(parts) -> str:
    toks = []
    for i, p in enumerate(parts[:-1]):
        base, idx = _split_idx(p)
        if p == "conv_branch":
            continue  # our AIM conv-branch wrapper is flat in torch
        if base == "upsample":
            toks.extend(["upsample", str(2 * idx)])  # Sequential(conv,PS,conv,PS)
        elif p in _DAT_SEQ:
            toks.append(_DAT_SEQ[p])
        elif p in ("fc1", "bn", "fc2") and i and parts[i - 1] in (
                "channel_interaction", "spatial_interaction"):
            table = _DAT_CI if parts[i - 1] == "channel_interaction" else _DAT_SI
            toks.append(table[p])
        elif idx is not None:
            toks.extend([base, str(idx)])
        else:
            toks.append(p)
    return ".".join(toks + [_LEAF[parts[-1]]])


# Renames of our HAT module paths back to the reference layout
# (Sequential indices for CAB / ChannelAttention / upsample head).
_HAT_SEQ = {
    "patch_norm": "patch_embed.norm",
    "conv_before_upsample": "conv_before_upsample.0",
    "conv_block": "conv_block.cab",
    "conv1": "0",      # inside CAB Sequential(conv,GELU,conv,CA)
    "conv2": "2",
    "ca": "3.attention",  # ChannelAttention.attention Sequential(GAP,c,ReLU,c,σ)
}
_HAT_CA = {"fc1": "1", "fc2": "3"}


_FREQ_SEQ = {
    "transform_fc1": "fusion_transform.0",
    "transform_fc2": "fusion_transform.2",
    "gate_fc1": "fusion_gate.0",
    "gate_fc2": "fusion_gate.2",
}


def freq_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torch key for MultiDomainFrequencyDecomposition /
    FrequencyDecomposition state dicts.

    ('band_fusion','band_attention_0','conv','kernel')
      → 'band_fusion.band_attention.0.conv.0.weight'
    """
    parts = [p for p in path if p != "params"]
    toks = []
    for i, p in enumerate(parts[:-1]):
        base, idx = _split_idx(p)
        if base == "band_attention":
            toks.extend(["band_attention", str(idx), "conv", "0"])
        elif p in _FREQ_SEQ:
            toks.append(_FREQ_SEQ[p])
        elif p == "conv" and toks and toks[-1] == "0":
            continue  # already emitted by band_attention
        elif idx is not None:
            toks.extend([base, str(idx)])
        else:
            toks.append(p)
    leaf = parts[-1]
    return ".".join(toks + [_LEAF.get(leaf, leaf)])


# Fusion-head (CompleteEnhancedFusionSR) sequential-index renames.
_FUSION_SEQ = {
    # LKA blocks
    "ffn_fc1": "ffn.0", "ffn_fc2": "ffn.2",
    # hierarchical stages (relative, resolved with stage prefix below)
    "to_rgb_conv1": "to_rgb.0", "to_rgb_conv2": "to_rgb.2",
    # dynamic selector
    "diff_conv1": "difficulty_estimator.0", "diff_conv2": "difficulty_estimator.2",
    "diff_conv3": "difficulty_estimator.4",
    # edge refinement
    "fusion_conv1": "fusion.0", "fusion_conv2": "fusion.2",
    # adaptive band predictor
    "predictor_fc1": "predictor.0", "predictor_fc2": "predictor.2",
    # FrequencyAwareFusion baseline refinement conv
    "refine_conv1": "refine_conv.0", "refine_conv2": "refine_conv.2",
}


def fusion_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torch key for the fusion-head checkpoint
    (CompleteEnhancedFusionSR with the shipped io.py MODEL_CONFIG)."""
    parts = [p for p in path if p not in ("params", "batch_stats")]
    leaf = parts[-1]
    body = parts[:-1]
    toks = []
    for i, p in enumerate(body):
        base, idx = _split_idx(p)
        prev = body[i - 1] if i else ""
        if p in _FREQ_SEQ:                       # band-fusion convs
            toks.append(_FREQ_SEQ[p])
        elif base == "band_attention" and idx is not None:
            toks.extend(["band_attention", str(idx), "conv", "0"])
        elif p == "conv" and prev.startswith("band_attention_"):
            continue  # already emitted above
        elif p.startswith("align_"):
            toks.extend(["align_layers", p[len("align_"):]])
        elif p.endswith("_fc1") and p.startswith("mod_"):
            toks.extend(["modulation", p.split("_")[1], "0"])
        elif p.endswith("_fc2") and p.startswith("mod_"):
            toks.extend(["modulation", p.split("_")[1], "3"])
        elif base == "mod" and idx is not None:  # standard collaborative
            toks.extend(["modulation", str(idx), "1"])
        elif prev in ("stage1", "stage2", "stage3"):
            st = toks.pop()  # replace 'stageN' + child with flat torch names
            sub = {"conv1": f"{st}_conv.0", "conv2": f"{st}_conv.2"}.get(p)
            if sub is None:
                sub = {"gate": f"{st}_gate", "res": f"{st}_res"}[p]
            toks.append(sub)
        elif prev == "gate" and p in ("fc1", "fc2"):
            toks.append({"fc1": "gate.0", "fc2": "gate.2"}[p])
        elif prev == "res" and p in ("conv1", "conv2"):
            toks.append({"conv1": "block.0", "conv2": "block.2"}[p])
        elif p.endswith("_conv") and prev == "multiscale":
            toks.append(p[:-5] + ".0")
        elif p.endswith("_bn") and prev == "multiscale":
            toks.append(p[:-3] + ".2")
        elif p == "channel_attention" and i + 1 < len(body):
            toks.append("channel_attention")
        elif p in ("fc1", "fc2") and prev == "channel_attention":
            toks.append({"fc1": "mlp.0", "fc2": "mlp.2"}[p])
        elif p in ("fc1", "fc2") and prev == "attn":
            toks.append({"fc1": "attn.0", "fc2": "attn.2"}[p])
        elif p in ("fc1", "fc2") and prev == "adaptive_band_predictor":
            toks.append({"fc1": "predictor.0", "fc2": "predictor.2"}[p])
        elif p in ("gate_conv1", "gate_conv2"):
            scope = "edge_gate" if "edge_refine" in body else "expert_gate"
            toks.append({"gate_conv1": f"{scope}.0",
                         "gate_conv2": f"{scope}.2"}[p])
        elif p in _FUSION_SEQ:
            toks.append(_FUSION_SEQ[p])
        elif base == "refine" and idx is not None and prev == "refine_net":
            toks.pop()  # torch refine_net is a flat Sequential at the top
            toks.extend(["refine_net", str(2 * idx)])
        elif p.startswith("layer") and (p.endswith("_conv") or p.endswith("_bn")):
            lnum = p.split("_")[0]  # router layers: layer1..layer4
            block = "conv_block1" if lnum in ("layer1", "layer2") else "conv_block2"
            local = 0 if lnum in ("layer1", "layer3") else 3
            local += 2 if p.endswith("_bn") else 0
            toks.extend([block, str(local)])
        elif idx is not None:
            toks.extend([base, str(idx)])
        else:
            toks.append(p)

    if toks and toks[0] == "refine_net" and leaf == "residual_scale":
        toks = []  # top-level torch param
    lf = {"scale": "weight", "mean": "running_mean", "var": "running_var"}
    if leaf == "scale" and body and not ("norm" in body[-1] or "bn" in body[-1]):
        out_leaf = "scale"  # ResBlock's learnable residual scale
    else:
        out_leaf = lf.get(leaf, _LEAF.get(leaf, leaf))
    return ".".join(toks + [out_leaf])


def v2_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torch key for enhanced_fusion_v2 modules
    (FusionHeadV2 and its private variant blocks)."""
    parts = [p for p in path if p != "params"]
    body, leaf = parts[:-1], parts[-1]
    toks = []
    for p in body:
        base, idx = _split_idx(p)
        if p == "thresh_fc1":
            toks.append("threshold_predictor.2")
        elif p == "thresh_fc2":
            toks.append("threshold_predictor.4")
        elif base == "band_proj":
            toks.extend(["band_projectors", str(idx)])
        elif base == "out_proj" and idx is not None:
            toks.extend(["output_projectors", str(idx)])
        elif p.startswith("proj_") and p[5:] in ("hat", "dat", "nafnet"):
            toks.extend(["feature_projectors", p[5:]])
        elif base == "feat_refine":
            toks.extend(["feature_refine", str(idx)])
        elif base == "mod":
            toks.extend(["modulation_head", str(idx)])
        elif base == "diff":
            toks.extend(["difficulty_net", str(idx)])
        elif base == "gate":
            toks.extend(["gate_net", str(idx)])
        elif p.startswith("router_"):
            m, i2 = p.rsplit("_", 1)
            toks.extend([m, i2])
        elif idx is not None:
            toks.extend([base, str(idx)])
        else:
            toks.append(p)
    if leaf.startswith("res_weight") or leaf == "band_gates":
        return ".".join(toks + [leaf])
    return ".".join(toks + [_LEAF.get(leaf, leaf)])


def mambair_key_fn(path: Tuple[str, ...]) -> str:
    """Flax path → torch key for the MambaIR state dict (closes the last
    expert converter hole, VERDICT r3 #8; reference layout verified at
    mambair_arch.py:238-279 (SS2D), :404-410 (VSSBlock), :737-766
    (ResidualGroup), :25-58 (CAB/ChannelAttention), :875 (Upsample)).

    ('layers_0','blocks_1','self_attention','in_proj','kernel')
      → 'layers.0.residual_group.blocks.1.self_attention.in_proj.weight'
    ('layers_0','blocks_1','conv_blk','ca_fc1','kernel')
      → '...conv_blk.cab.3.attention.1.weight'
    ('patch_norm','scale') → 'patch_embed.norm.weight'
    ('upsample_1','kernel') → 'upsample.2.weight'
    """
    _cab = {"conv1": "cab.0", "conv2": "cab.2",
            "ca_fc1": "cab.3.attention.1", "ca_fc2": "cab.3.attention.3"}
    parts = [p for p in path if p != "params"]
    leaf = parts[-1]
    toks = []
    for i, p in enumerate(parts[:-1]):
        base, idx = _split_idx(p)
        nxt = parts[i + 1] if i + 1 < len(parts) - 1 else ""
        if base == "layers":
            toks.extend(["layers", str(idx)])
            if nxt.startswith("blocks"):
                toks.append("residual_group")
        elif base == "blocks":
            toks.extend(["blocks", str(idx)])
        elif base == "upsample":
            toks.extend(["upsample", str(2 * idx)])
        elif p == "patch_norm":
            toks.extend(["patch_embed", "norm"])
        elif p == "conv_before_upsample":
            toks.extend(["conv_before_upsample", "0"])
        elif p in _cab:
            toks.append(_cab[p])
        else:
            toks.append(p)
    # SS2D merged parameters and VSSBlock skip scales keep their torch
    # names verbatim
    if leaf in ("x_proj_weight", "dt_projs_weight", "dt_projs_bias",
                "A_logs", "Ds", "skip_scale", "skip_scale2"):
        return ".".join(toks + [leaf])
    return ".".join(toks + [_LEAF[leaf]])


def hat_key_fn(path: Tuple[str, ...]):
    """Flax path → torch key (or Stacked spec) for the HAT state dict.

    ('layers_0','blocks_1','conv_block','ca','fc1','kernel')
      → 'layers.0.residual_group.blocks.1.conv_block.cab.3.attention.1.weight'

    Scanned layouts (models/hat.py scan_blocks_enabled): subtree 'layers'
    (no index) stacks all groups; subtree 'pairs'/'blk{0,1}' stacks the
    (shift-0, shifted) HAB pairs within a group — both map to Stacked specs
    over the corresponding torch 'layers.{i}...blocks.{2p+b}' keys.
    """
    parts = [p for p in path if p != "params"]
    group_scan = bool(parts) and parts[0] == "layers"
    pair_pos = next((j for j, p in enumerate(parts) if p == "pairs"), None)
    if group_scan or pair_pos is not None:
        def vparts(gi=None, pi=None):
            vp = list(parts)
            if pair_pos is not None:
                b = int(vp[pair_pos + 1][3:])      # 'blk0' / 'blk1'
                vp[pair_pos:pair_pos + 2] = [f"blocks_{2 * pi + b}"]
            if group_scan:
                vp[0] = f"layers_{gi}"
            return tuple(vp)
        if group_scan and pair_pos is not None:
            return Stacked(2, lambda gi, pi: _hat_parts_key(vparts(gi, pi)))
        if group_scan:
            return Stacked(1, lambda gi: _hat_parts_key(vparts(gi=gi)))
        return Stacked(1, lambda pi: _hat_parts_key(vparts(pi=pi)))
    return _hat_parts_key(tuple(parts))


def _hat_parts_key(parts: Tuple[str, ...]) -> str:
    toks = []
    for i, p in enumerate(parts[:-1]):
        base, idx = _split_idx(p)
        nxt = parts[i + 1] if i + 1 < len(parts) - 1 else ""
        if base == "layers":
            toks.extend(["layers", str(idx)])
            if nxt.startswith("blocks") or nxt == "overlap_attn":
                toks.append("residual_group")
        elif base == "upsample":
            toks.extend(["upsample", str(2 * idx)])
        elif p in ("fc1", "fc2") and i and parts[i - 1] == "ca":
            toks.append(_HAT_CA[p])
        elif p in _HAT_SEQ:
            toks.append(_HAT_SEQ[p])
        elif idx is not None:
            toks.extend([base, str(idx)])
        else:
            toks.append(p)
    leaf = parts[-1]
    if leaf in ("qkv_kernel", "qkv_bias", "proj_kernel", "proj_bias"):
        mod, kind = leaf.rsplit("_", 1)
        return ".".join(toks + [mod, {"kernel": "weight", "bias": "bias"}[kind]])
    return ".".join(toks + [_LEAF[leaf]])
