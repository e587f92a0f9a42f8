"""Challenge interface: the public `model_func` contract.

Mirrors the reference wrapper (/root/reference/models/team29_FreqFusion/io.py):
`main(model_dir, input_path, output_path, device)` builds the ensemble +
fusion head, loads checkpoints tolerantly, loops over PNGs and writes ×4 SR
PNGs. TPU-first differences: tiled inference is the primary (and only)
device path — one compiled program at a fixed tile shape — and checkpoints
are converted from the reference's torch format on first use.

Checkpoint layout searched under `model_dir` (reference io.py:127-160):
  pretrained/hat/*.pth       HAT-L weights
  pretrained/dat/*.pth       DAT weights
  pretrained/nafnet/*.pth    NAFNet-SIDD-width64 weights
  *.pth / checkpoints/**.pth fusion-head checkpoint (best_epoch*.pth)
Missing files fall back to random init with a warning, like the reference
(expert_loader.py:367-368).
"""

from __future__ import annotations

import glob
import os
import time
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.experts import FreqFusionSR
from ..models.fusion import FusionConfig
from ..utils import convert as cv
from ..utils.runtime import enable_compilation_cache, host_device
from ..utils.imageio import list_images, load_image, save_image
from .tiling import tiled_sr

# the hardcoded inference config (reference io.py:40-58)
MODEL_CONFIG = FusionConfig()

# tile 192 minimizes overlap recompute on DIV2K-sized images (PERF.md);
# the reference's fallback tiling used 128/32 (io.py:226)
TILE = 192
OVERLAP = 32
TILE_BATCH = 2


def _find(model_dir: str, patterns) -> Optional[str]:
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(model_dir, pat), recursive=True))
        if hits:
            return hits[0]
    return None


def _load_expert_params(variables, model_dir: str, root: Optional[str] = "experts"):
    """Fill expert params from reference-format torch checkpoints.

    `root` names the subtree holding the per-expert params: "experts" for
    the full FreqFusionSR tree, None for a bare ExpertEnsemble whose
    {hat,dat,nafnet} live at the top of `params` (the cached-feature
    extractor's layout). Dict-ifies the touched levels so frozen trees
    from `model.init` are safe to pass.
    """
    variables = dict(variables)
    params = dict(variables["params"])
    variables["params"] = params
    if root is None:
        container = params
    else:
        container = dict(params[root])
        params[root] = container
    specs = {
        "hat": (["pretrained/hat/*.pth", "pretrained/hat/**/*.pth"], cv.hat_key_fn, None),
        "dat": (["pretrained/dat/*.pth", "pretrained/dat/**/*.pth"], cv.dat_key_fn, None),
        "nafnet": (["pretrained/nafnet/*.pth", "pretrained/nafnet/**/*.pth"],
                   cv.nafnet_key_fn, "nafnet."),
    }
    for name, (patterns, key_fn, strip) in specs.items():
        path = _find(model_dir, patterns)
        if path is None:
            warnings.warn(f"{name} checkpoint not found under {model_dir}; "
                          "using random weights")
            continue
        sd = cv.load_torch_checkpoint(path)
        if strip:
            sd = {k[len(strip):]: v for k, v in sd.items() if k.startswith(strip)}
        sub = container[name]
        filled, report = cv.fill_params(sub, sd, key_fn, strict=False)
        container[name] = filled
        if report["missing"]:
            warnings.warn(f"{name}: {len(report['missing'])} params not in "
                          f"checkpoint (first: {report['missing'][0][1]})")
    return variables


def _load_native_fusion_ckpt(variables, path: str):
    """Load a framework-native msgpack checkpoint (CheckpointManager schema)
    into the fusion subtree — closes the train→serve loop without a torch
    round-trip."""
    from flax import serialization

    with open(path, "rb") as f:
        record = serialization.msgpack_restore(f.read())
    params = record.get("params", {})
    if "fusion" in params:  # live-mode payloads nest under 'fusion'
        params = params["fusion"]
    variables["params"]["fusion"] = jax.tree_util.tree_map(
        np.asarray, params)
    stats = record.get("batch_stats", {})
    if "fusion" in stats:
        stats = stats["fusion"]
    if stats and "batch_stats" in variables:
        variables["batch_stats"] = dict(variables["batch_stats"])
        variables["batch_stats"]["fusion"] = jax.tree_util.tree_map(
            np.asarray, stats)
    return variables


def _load_fusion_params(variables, model_dir: str):
    native = _find(model_dir, ["best_*.ckpt", "checkpoints/**/best_*.ckpt",
                               "latest.ckpt", "checkpoints/**/latest.ckpt",
                               "*.ckpt", "checkpoints/**/*.ckpt"])
    if native:
        return _load_native_fusion_ckpt(variables, native)
    path = _find(model_dir, ["*.pth", "checkpoints/**/*.pth", "checkpoints/*.pth"])
    # skip expert checkpoints that the glob may also match
    if path and "pretrained" in path:
        path = None
    if path is None:
        warnings.warn(f"fusion checkpoint not found under {model_dir}; "
                      "using random weights")
        return variables
    sd = cv.load_torch_checkpoint(path)
    filled_p, _ = cv.fill_params(variables["params"]["fusion"], sd,
                                 cv.fusion_key_fn, strict=False)
    variables["params"]["fusion"] = filled_p
    if "batch_stats" in variables and "fusion" in variables["batch_stats"]:
        filled_s, _ = cv.fill_params(variables["batch_stats"]["fusion"], sd,
                                     cv.fusion_key_fn, strict=False)
        variables["batch_stats"]["fusion"] = filled_s
    return variables


class InferencePipeline:
    """Builds the model once, compiles the tile forward once, runs PNGs."""

    def __init__(self, model_dir: str, tile: int = TILE, overlap: int = OVERLAP,
                 tile_batch: int = TILE_BATCH, precision: str = "default",
                 seed: int = 0, n_devices: Optional[int] = None,
                 fusion_config: Optional[FusionConfig] = None,
                 expert_kwargs: Optional[dict] = None,
                 dtype: Optional[str] = None):
        enable_compilation_cache()
        # bf16 params+activations: ~1.5× on the attention experts at a
        # measured 58 dB PSNR vs the f32 pipeline (PARITY.md §quantified) —
        # <0.01 dB against ground truth. FREQFUSION_DTYPE=bfloat16 enables.
        self.dtype = dtype or os.environ.get("FREQFUSION_DTYPE", "float32")
        # matmul precision for the XLA glue: "default" (no context) lets
        # f32 matmuls run XLA's DEFAULT single-bf16-pass truncation — the
        # same precision class as the Pallas kernels' MXU-operand mode
        # (ops/pallas/wattn._mxu_dtype) and ~3x faster on TPU than
        # "highest" (true-f32 multi-pass), at a quantified <0.01 dB PSNR
        # cost (PARITY.md). Pass precision="highest" to force f32 passes.
        self.precision = os.environ.get("FREQFUSION_PRECISION", precision)
        self.tile, self.overlap = tile, overlap
        # multi-chip: shard the tile batch over a ('data',) mesh (the
        # TPU-native replacement for the reference's per-GPU expert placement,
        # SURVEY.md §2.8); single chip keeps plain jit.
        self.mesh = None
        if n_devices is None:
            n_devices = len(jax.devices()) if len(jax.devices()) > 1 else 1
        if n_devices > 1:
            from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
            self.mesh = make_mesh(n_devices)
            self._data_sh = batch_sharding(self.mesh)
            self._repl_sh = replicated_sharding(self.mesh)
            tile_batch = max(tile_batch, n_devices)
            tile_batch += (-tile_batch) % n_devices
        self.tile_batch = tile_batch
        expert_kwargs = dict(expert_kwargs or {})
        # fused Pallas window/OCAB attention kernels by default on TPU
        # (exact-math replacements, tests/test_pallas_wattn.py; 1.5x on the
        # full HAT-L forward). FREQFUSION_USE_PALLAS=0 disables.
        if os.environ.get("FREQFUSION_USE_PALLAS", "1") == "1" \
                and jax.default_backend() == "tpu":
            for k in ("hat_kwargs", "dat_kwargs", "nafnet_kwargs"):
                sub = dict(expert_kwargs.get(k) or {})
                sub.setdefault("use_pallas", True)
                expert_kwargs[k] = sub
        self.model = FreqFusionSR(fusion_config or MODEL_CONFIG,
                                  **expert_kwargs)
        dummy = jnp.zeros((tile_batch, tile, tile, 3), jnp.float32)
        if os.environ.get("FREQFUSION_REAL_INIT", "0") == "1":
            # true flax init (minutes of host CPU on the full ensemble)
            with jax.default_device(host_device()):
                variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        else:
            # shape-only init (~20 s): checkpoint loading below overwrites
            # every loaded leaf, and the no-checkpoint path is the
            # random+warn degraded mode either way (reference parity)
            from ..utils.runtime import fast_random_variables
            variables = fast_random_variables(self.model, dummy, seed=seed)
        variables = jax.tree_util.tree_map(np.asarray, variables)
        variables = {k: dict(v) for k, v in variables.items()}
        variables["params"] = dict(variables["params"])
        if model_dir:
            variables = _load_expert_params(variables, model_dir)
            variables = _load_fusion_params(variables, model_dir)
        if self.dtype == "bfloat16":
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == np.float32 else a,
                variables)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        if self.mesh is not None:
            self.variables = jax.device_put(variables, self._repl_sh)
        else:
            self.variables = jax.device_put(variables)

        bf16 = self.dtype == "bfloat16"

        def fwd(variables, tiles):
            if bf16:
                tiles = tiles.astype(jnp.bfloat16)
            with self._precision_ctx():
                out = self.model.apply(variables, tiles)
            return out.astype(jnp.float32)

        if self.mesh is not None:
            self._fwd = jax.jit(fwd, in_shardings=(self._repl_sh, self._data_sh),
                                out_shardings=self._data_sh)
        else:
            self._fwd = jax.jit(fwd)

    def _precision_ctx(self):
        """Matmul-precision context for the jitted forwards: "default" → no
        context (XLA DEFAULT = single bf16 pass for f32 matmuls, matching
        the kernels' MXU mode); anything else → that explicit precision."""
        import contextlib
        if self.precision == "default":
            return contextlib.nullcontext()
        return jax.default_matmul_precision(self.precision)

    def forward_batch(self, tiles: np.ndarray):
        """Returns the (asynchronously dispatched) device array — the tiling
        driver materializes it after submitting the next chunk."""
        tiles = jnp.asarray(tiles)
        if self.mesh is not None:
            tiles = jax.device_put(tiles, self._data_sh)
        return self._fwd(self.variables, tiles)

    # Whole-image mode: the reference's own default forward (io.py:214-231,
    # tiles only on OOM). One dispatch skips the ~1.28× tile-overlap
    # recompute; shapes are bucketed to 32-px multiples so a homogeneous
    # test set (e.g. DIV2K) compiles a handful of programs, and images
    # beyond the pixel budget or the shape-cache cap fall back to tiles
    # (logged — the fallback changes throughput ~25%, never output pixels).
    # 280000 px covers every DIV2K ×4 LR frame after 32-px padding
    # (≤512×544); FREQFUSION_WHOLE_IMAGE_PX=0 disables whole-image mode.
    WHOLE_IMAGE_MAX_PX = int(os.environ.get(
        "FREQFUSION_WHOLE_IMAGE_PX", "280000"))
    WHOLE_IMAGE_MAX_SHAPES = int(os.environ.get(
        "FREQFUSION_WHOLE_IMAGE_SHAPES", "6"))

    def _cliff_warn(self, key, msg):
        seen = getattr(self, "_cliff_seen", None)
        if seen is None:
            seen = self._cliff_seen = set()
        if key not in seen:
            seen.add(key)
            warnings.warn(msg)

    def _whole_image_plan(self, h: int, w: int):
        """(padded_h, padded_w) bucket for a whole-image dispatch (commits
        a shape-cache entry), or None when the image must take the tiled
        path (pixel budget, reflect-pad limit, or shape-cache cap)."""
        if self.WHOLE_IMAGE_MAX_PX <= 0:
            return None
        hp = -(-max(h, 64) // 32) * 32
        wp = -(-max(w, 64) // 32) * 32
        if hp * wp > self.WHOLE_IMAGE_MAX_PX:
            self._cliff_warn(
                ("px", hp, wp),
                f"whole-image fallback → tiled: {w}x{h} pads to {wp}x{hp} "
                f"({hp * wp} px > FREQFUSION_WHOLE_IMAGE_PX="
                f"{self.WHOLE_IMAGE_MAX_PX})")
            return None
        if hp - h >= h or wp - w >= w:   # reflect pad needs pad < size
            self._cliff_warn(
                ("pad", hp, wp),
                f"whole-image fallback → tiled: {w}x{h} is smaller than its "
                f"reflect padding to the {wp}x{hp} bucket")
            return None
        cache = getattr(self, "_whole_shapes", None)
        if cache is None:
            cache = self._whole_shapes = set()
        if (hp, wp) not in cache and \
                len(cache) >= self.WHOLE_IMAGE_MAX_SHAPES:
            # cache full: pad UP to an already-compiled dominating bucket
            # when the overhead stays small — a few % of wasted compute
            # beats the ~25% tiled-fallback cliff (VERDICT r5 #5; on real
            # DIV2K-like shape spreads the cap otherwise bites: 510-wide
            # frames bucket to 512xH for ~8 distinct H)
            cand = [(ch * cw, ch, cw) for ch, cw in cache
                    if ch >= hp and cw >= wp
                    and ch - h < h and cw - w < w          # reflect limit
                    and ch * cw <= hp * wp * 1.3]          # ≤30% overhead
            if cand:
                _, ch, cw = min(cand)
                self._cliff_warn(
                    ("padup", hp, wp, ch, cw),
                    f"whole-image shape cache full: {w}x{h} (bucket "
                    f"{wp}x{hp}) pads up to the compiled {cw}x{ch} bucket "
                    f"(+{(ch * cw) / (hp * wp) - 1:.0%} compute)")
                return ch, cw
            self._cliff_warn(
                ("cap", hp, wp),
                f"whole-image fallback → tiled: shape cache full "
                f"({len(cache)} shapes, FREQFUSION_WHOLE_IMAGE_SHAPES="
                f"{self.WHOLE_IMAGE_MAX_SHAPES}); new bucket {wp}x{hp} "
                "takes the tiled path")
            return None
        cache.add((hp, wp))
        return hp, wp

    def run_image(self, lr: np.ndarray) -> np.ndarray:
        # A SINGLE image on a >1-device mesh takes the tiled path: its tile
        # batches shard real work across devices, while a whole-image
        # dispatch would have to replicate the one image mesh-wide and
        # throw away all but result [0]. Mesh-wide whole-image serving is
        # the BATCH protocol (dispatch_batch_u8), where every device gets
        # its own image.
        on_mesh = self.mesh is not None and self.mesh.devices.size > 1
        plan = None if on_mesh else \
            self._whole_image_plan(lr.shape[0], lr.shape[1])
        if plan is not None:
            hp, wp = plan
            h, w, _ = lr.shape
            lrp = np.pad(lr, [(0, hp - h), (0, wp - w), (0, 0)],
                         mode="reflect")
            sr = np.asarray(self.forward_batch(lrp[None]))[0]
            s = self.model.cfg.upscale
            return sr[: h * s, : w * s]
        return tiled_sr(lr, self.forward_batch, self.tile, self.overlap,
                        self.tile_batch, self.model.cfg.upscale)

    # ---- pipelined uint8 serving ---------------------------------------
    # The TPU tunnel moves ~20-30 MB/s: fetching a f32 HR frame costs ~1.6 s
    # against ~0.5 s as uint8 (clip+*255+round on device — byte-identical
    # PNGs to the host conversion in utils/imageio.save_image). dispatch/
    # materialize are split so a directory loop overlaps image i+1's compute
    # with image i's transfer + PNG encode.
    def _fwd_u8(self):
        fn = getattr(self, "_fwd_u8_fn", None)
        if fn is None:
            bf16 = self.dtype == "bfloat16"

            def fwd(variables, tiles):
                if bf16:
                    tiles = tiles.astype(jnp.bfloat16)
                # same matmul-precision contract as the f32 fwd above — the
                # primary serving path must match the parity-validated one
                with self._precision_ctx():
                    out = self.model.apply(variables, tiles)
                out = out.astype(jnp.float32)
                return jnp.round(
                    jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

            if self.mesh is not None:
                fn = jax.jit(fwd, in_shardings=(self._repl_sh, self._data_sh),
                             out_shardings=self._data_sh)
            else:
                fn = jax.jit(fwd)
            self._fwd_u8_fn = fn
        return fn

    @property
    def u8_group_max(self) -> int:
        """Images per whole-image dispatch: the mesh size (batch sharded
        over ('data',)), or FREQFUSION_U8_BATCH (default 1) on one chip —
        batching same-bucket images trades latency for occupancy."""
        if self.mesh is not None:
            return self.mesh.devices.size
        return max(1, int(os.environ.get("FREQFUSION_U8_BATCH", "1")))

    def dispatch_batch_u8(self, lrs, plan=None):
        """Async whole-image dispatch of a same-bucket image batch →
        (device_u8_array, [(h, w), ...]) or None when the images must take
        the tiled path. On a mesh the batch is sharded over ('data',) —
        ragged tails are padded by repeating the last image."""
        if plan is None:
            plan = self._whole_image_plan(lrs[0].shape[0], lrs[0].shape[1])
            if plan is None:
                return None
        hp, wp = plan
        lrp = np.stack([
            np.pad(a, [(0, hp - a.shape[0]), (0, wp - a.shape[1]), (0, 0)],
                   mode="reflect") for a in lrs])
        q = self.u8_group_max
        pad_b = (-len(lrs)) % q if q > 1 else 0
        if pad_b:  # one program per bucket: ragged tails pad by repeat
            if self.mesh is None:
                # on a mesh the pad rides on otherwise-idle devices; on one
                # chip it is pure discarded compute — up to (q-1)/q of the
                # dispatch (VERDICT r3 #6)
                self._cliff_warn(
                    ("u8pad", hp, wp),
                    f"single-chip ragged u8 batch: padding {len(lrs)} images "
                    f"to FREQFUSION_U8_BATCH={q} repeats the last image "
                    f"{pad_b}x — that compute is discarded; feed group "
                    "multiples or lower FREQFUSION_U8_BATCH")
            lrp = np.concatenate([lrp, np.repeat(lrp[-1:], pad_b, axis=0)])
        if self.mesh is not None:
            arr = jax.device_put(jnp.asarray(lrp), self._data_sh)
        else:
            arr = jnp.asarray(lrp)
        metas = [(a.shape[0], a.shape[1]) for a in lrs]
        return self._fwd_u8()(self.variables, arr), metas

    def dispatch_image_u8(self, lr: np.ndarray):
        """Single-image convenience wrapper over dispatch_batch_u8."""
        return self.dispatch_batch_u8([lr])

    def materialize_u8(self, handle):
        """Device handle → list of HWC uint8 arrays (one per real image)."""
        dev, metas = handle
        s = self.model.cfg.upscale
        host = np.asarray(dev)
        return [host[i, : h * s, : w * s] for i, (h, w) in enumerate(metas)]


def main(model_dir: str, input_path: str, output_path: str, device=None):
    """The challenge `model_func(model_dir, input_path, output_path, device)`
    contract (reference io.py:189-234). `device` is accepted for signature
    parity; placement is governed by JAX. A FREQFUSION_CONFIG yaml (see
    utils.runtime.runtime_overrides) shrinks/overrides the model — the
    debug-mode analog of the reference's --debug (train.py:1219-1224)."""
    from ..utils.runtime import runtime_overrides

    os.makedirs(output_path, exist_ok=True)
    ov = runtime_overrides()
    kwargs = {}
    if "model" in ov:
        m = dict(ov["model"])
        kwargs["expert_kwargs"] = m.pop("expert_kwargs", None)
        if m:
            kwargs["fusion_config"] = FusionConfig(**m)
    for k in ("tile", "overlap", "tile_batch"):
        if k in ov.get("infer", {}):
            kwargs[k] = ov["infer"][k]
    pipe = InferencePipeline(model_dir, **kwargs)
    files = list_images(input_path)

    # pipelined directory loop: batch i+1's compute overlaps batch i's
    # device→host transfer + PNG encode. Consecutive same-bucket images
    # group into one whole-image dispatch (mesh: sharded over ('data',),
    # single chip: batches of 1 — see dispatch_batch_u8).
    from PIL import Image

    pending = None   # (handle, [(out_path, name, lr_wh, t0), ...])
    group = []       # [(lr, out_path, name, t0), ...] awaiting dispatch
    group_plan = None

    def flush(p):
        handle, items = p
        for arr, (out, name, (lw, lh), t0) in zip(
                pipe.materialize_u8(handle), items):
            os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
            Image.fromarray(arr).save(out)
            print(f"  {name}: {lw}x{lh} → {arr.shape[1]}x{arr.shape[0]} "
                  f"in {time.time() - t0:.2f}s")

    def dispatch_group():
        nonlocal pending, group, group_plan
        if not group:
            return
        handle = pipe.dispatch_batch_u8([g[0] for g in group], group_plan)
        if pending is not None:
            flush(pending)
        pending = (handle, [(out, name, (lr.shape[1], lr.shape[0]), t0)
                            for lr, out, name, t0 in group])
        group, group_plan = [], None

    for f in files:
        t0 = time.time()
        lr = load_image(f)
        out = os.path.join(output_path, os.path.basename(f))
        plan = pipe._whole_image_plan(lr.shape[0], lr.shape[1])
        if plan is None:  # oversized → synchronous tiled fallback
            dispatch_group()
            if pending is not None:
                flush(pending)
                pending = None
            sr = pipe.run_image(lr)
            save_image(sr, out)
            print(f"  {os.path.basename(f)}: {lr.shape[1]}x{lr.shape[0]} → "
                  f"{sr.shape[1]}x{sr.shape[0]} in {time.time() - t0:.2f}s")
            continue
        if group and plan != group_plan:
            dispatch_group()
        group.append((lr, out, os.path.basename(f), t0))
        group_plan = plan
        if len(group) >= pipe.u8_group_max:
            dispatch_group()
    dispatch_group()
    if pending is not None:
        flush(pending)
    return len(files)


model_func = main
