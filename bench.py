#!/usr/bin/env python
"""Headline benchmark: ×4 SR throughput of the full FreqFusion pipeline.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol: a DIV2K-sized LR image (510×339, the ×4 LR of a 2040×1356 HR)
streams through the production tiled pipeline (tile 128, overlap 32) on one
chip, with randomly initialized weights (identical FLOPs to trained ones).
Metric = OUTPUT megapixels/second/chip (HR pixels produced per second),
steady-state (compile + warmup excluded).

vs_baseline: the reference publishes no throughput figure (BASELINE.md), so
the baseline is an analytic A100 estimate for the same 3-expert ensemble:
~90 MMAC/LR-pixel ⇒ ~0.33 LR MP/s ≈ 5.3 HR MP/s on A100 TF32 at 60 TFLOP/s
sustained. BASELINE.json's target is ≥5× A100 on v5e-8 (8 chips), so
vs_baseline = (8 × per-chip MP/s) / (5 × 5.3 HR MP/s); ≥1.0 meets target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-registers the TPU platform even under
    # JAX_PLATFORMS=cpu; the config override must land before first jax use
    # (CLAUDE.md) — without it a CPU-intended bench grabs the TPU tunnel
    import jax
    jax.config.update("jax_platforms", "cpu")

A100_EST_HR_MPS = 5.3   # analytic estimate, see module docstring
TARGET_MULT = 5.0
N_CHIPS_TARGET = 8

# tile 192 / batch 2 measured best on v5e (PERF.md): the 128-tile grid
# recomputes 1.89× the image's pixels in overlaps, 192 only 1.28×
TILE = int(os.environ.get("FREQFUSION_TILE", "192"))
OVERLAP = int(os.environ.get("FREQFUSION_OVERLAP", "32"))
TILE_BATCH = int(os.environ.get("FREQFUSION_TILE_BATCH", "2"))
# bf16 params+activations is the shipped default: measured 1.139 vs 1.073
# MP/s/chip f32 at the bench shape (PERF.md r3 experiments), with PSNR-vs-f32
# 58.2 dB / max |err| 0.017 (PARITY.md) — far beyond perceptual relevance.
DTYPE = os.environ.get("FREQFUSION_BENCH_DTYPE", "bfloat16")  # or "float32"
# fused Pallas window/OCAB attention: default ON (1.5x full-HAT measured);
# set FREQFUSION_USE_PALLAS=0 to compare against the pure-XLA chain
USE_PALLAS = os.environ.get("FREQFUSION_USE_PALLAS", "1") == "1"
# single-dispatch full-image forward (the reference's own default path,
# io.py:214-231) with the uint8 + stream-pipelined serving protocol:
# 1.10 MP/s/chip vs 0.851 tiled f32 (the ~20-30 MB/s tunnel makes f32 HR
# payloads cost ~1.6 s/frame; uint8 + dispatch-ahead hides the transfer).
# FREQFUSION_WHOLE_IMAGE=0 benches the tiled fallback pipeline.
WHOLE_IMAGE = os.environ.get("FREQFUSION_WHOLE_IMAGE", "1") == "1"
# DIV2K ×4 LR size for a 2040×1356 HR image; overridable so the full
# pipeline can be driven at toy size on CPU (verification, not measurement)
LR_H = int(os.environ.get("FREQFUSION_BENCH_LR_H", "339"))
LR_W = int(os.environ.get("FREQFUSION_BENCH_LR_W", "510"))
# Heterogeneous stream is the DEFAULT (VERDICT r3 #6): 3 distinct shape
# buckets model a real ragged directory — per-bucket programs, bucket
# switching, pipelining across shape changes — and measured HIGHER than
# the single-frame stream (1.329 vs 1.249 MP/s, PERF.md): smaller buckets
# lift the average and pipelining holds across shape changes. Cost is
# compile-side only (3x the programs on a fresh process).
# FREQFUSION_BENCH_HETERO=0 restores the homogeneous single-image stream.
# Sizes scale with the LR override so the path is CPU-drivable at toy dims
# (defaults reproduce the DIV2K-class triple 339×510 / 300×450 / 270×400).
HETERO = os.environ.get("FREQFUSION_BENCH_HETERO", "1") == "1"
HETERO_SIZES = ((LR_H, LR_W),
                (round(LR_H * 0.885), round(LR_W * 0.882)),
                (round(LR_H * 0.797), round(LR_W * 0.784)))
# images per whole-image dispatch (the serving loop batches same-bucket
# images; >1 trades latency for occupancy/dispatch amortization)
WHOLE_BATCH = int(os.environ.get("FREQFUSION_WHOLE_BATCH", "1"))


def main():
    t_start = time.time()

    def stage(name):
        print(f"# [{time.time() - t_start:7.1f}s] {name}", file=sys.stderr,
              flush=True)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    stage("imports + cache setup")

    from freqfusion_tpu.models.experts import FreqFusionSR
    from freqfusion_tpu.models.fusion import FusionConfig
    from freqfusion_tpu.infer.tiling import tiled_sr, num_tiles

    kernels = dict(use_pallas=True) if USE_PALLAS else {}
    model = FreqFusionSR(FusionConfig(use_pallas=USE_PALLAS),
                         hat_kwargs=kernels, dat_kwargs=kernels,
                         nafnet_kwargs=kernels)
    from freqfusion_tpu.utils.runtime import (fast_random_variables,
                                              wait_for_backend)

    # the remote TPU tunnel has transient outages; wait (bounded) instead of
    # dying so a driver-time blip can't zero the measurement
    wait_for_backend()
    dummy = jnp.zeros((TILE_BATCH, TILE, TILE, 3), jnp.float32)
    stage("backends up")
    # eval_shape + host-side random fill: weight values don't affect
    # throughput, and the real model.init forward costs minutes of host CPU
    variables = fast_random_variables(model, dummy)
    stage("host-side init (shape-only)")
    if DTYPE == "bfloat16":
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    stage("params on device")

    def _fwd(v, t):
        if DTYPE == "bfloat16":
            t = t.astype(jnp.bfloat16)
        return model.apply(v, t).astype(jnp.float32)

    fwd = jax.jit(_fwd)

    def forward_batch(tiles):
        # async dispatch — the tiling driver materializes after pipelining
        return fwd(variables, jnp.asarray(tiles))

    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(LR_H, LR_W, 3)).astype(np.float32)

    if WHOLE_IMAGE:
        # serving protocol: device-side uint8 PNG payload (the tunnel moves
        # ~20-30 MB/s — a f32 HR frame costs ~1.6 s to fetch, uint8 ~0.5 s;
        # clip+*255+round on device produces byte-identical PNGs), and
        # image-stream pipelining (dispatch image i+1 before materializing
        # image i, exactly like test.py's directory loop).
        def _fwd_u8(v, t):
            if DTYPE == "bfloat16":
                t = t.astype(jnp.bfloat16)
            out = model.apply(v, t).astype(jnp.float32)
            return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        fwd_u8 = jax.jit(_fwd_u8)
        sizes = HETERO_SIZES if HETERO else ((LR_H, LR_W),)
        lrps = []
        for h_, w_ in sizes:
            im = rng.uniform(size=(h_, w_, 3)).astype(np.float32)
            p = np.pad(im, [(0, (-h_) % 16), (0, (-w_) % 16), (0, 0)],
                       mode="reflect")[None]
            lrps.append(np.repeat(p, WHOLE_BATCH, axis=0))

        def run_once():  # compiles every bucket's program
            outs = []
            for i, p in enumerate(lrps):
                tb = time.time()
                outs.append(np.asarray(fwd_u8(variables, p)))
                stage(f"bucket {i} ({p.shape[2]}x{p.shape[1]}) first pass "
                      f"{time.time() - tb:.1f}s")
            return outs

        def run_stream(n):
            # n cycles over the bucket list, pipelined across shape changes
            seq = [lrps[i % len(lrps)] for i in range(n * len(lrps))]
            pending = fwd_u8(variables, seq[0])
            outs = []
            for p in seq[1:]:
                nxt = fwd_u8(variables, p)
                outs.append(np.asarray(pending))
                pending = nxt
            outs.append(np.asarray(pending))
            return outs

        cycle_mp = WHOLE_BATCH * sum(16 * h_ * w_ for h_, w_ in sizes) / 1e6
        desc = ("whole-image dispatch, uint8 payload, pipelined" +
                (f", batch {WHOLE_BATCH}" if WHOLE_BATCH > 1 else "") +
                (f", {len(sizes)} shape buckets" if HETERO else ""))
    else:
        # compile + warmup of the tiled path
        _ = forward_batch(np.zeros((TILE_BATCH, TILE, TILE, 3), np.float32))

        def run_once():
            return tiled_sr(lr, forward_batch, TILE, OVERLAP, TILE_BATCH)

        def run_stream(n):
            return [run_once() for _ in range(n)]

        desc = f"{num_tiles(LR_H, LR_W, TILE, OVERLAP)} tiles"

    t0 = time.time()
    _ = run_once()
    warm_s = time.time() - t0
    stage(f"first pass done ({warm_s:.1f}s incl. trace+compile)")

    if os.environ.get("FREQFUSION_BENCH_COMPILE_ONLY") == "1":
        # prewarm mode (scripts/prewarm.py): every serving program is now in
        # the persistent cache (.jax_cache); a subsequent fresh process
        # skips XLA compilation for these buckets
        print(json.dumps({
            "metric": "prewarm_first_pass_s", "value": round(warm_s, 1),
            "unit": "s", "buckets": len(lrps) if WHOLE_IMAGE else 1,
            "total_s": round(time.time() - t_start, 1)}))
        return

    # timed runs (steady-state over an image stream)
    runs = 4
    t0 = time.time()
    outs = run_stream(runs)
    cycle_s = (time.time() - t0) / runs
    sr = outs[-1]

    if WHOLE_IMAGE:
        out_mp = cycle_mp
        elapsed = cycle_s / (len(lrps) * WHOLE_BATCH)  # per-image avg
    else:
        out_mp, elapsed = (LR_H * 4) * (LR_W * 4) / 1e6, cycle_s
    mps = out_mp / cycle_s
    vs = (mps * N_CHIPS_TARGET) / (TARGET_MULT * A100_EST_HR_MPS)

    print(json.dumps({
        "metric": "x4_sr_output_megapixels_per_sec_per_chip",
        "value": round(mps, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(vs, 4),
    }))
    print(f"# image {LR_W}x{LR_H} LR → {LR_W*4}x{LR_H*4} HR: "
          f"{elapsed:.2f}s/image ({desc}, "
          f"first pass {warm_s:.1f}s incl. compile)", file=sys.stderr)


if __name__ == "__main__":
    main()
