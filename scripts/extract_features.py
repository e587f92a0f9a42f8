#!/usr/bin/env python
"""Cached-feature extractor — the producer missing from the reference.

The reference's training requires `cached_features_{train,val}/` produced by
a `scripts/extract_features_balanced.py` that is absent from its repo
(SURVEY.md §3.5); this script implements that contract TPU-natively: for
each image it samples fixed-size LR crops, runs the frozen expert ensemble
ONCE (one jitted program for all three experts), and writes one .npz per
crop with lr/hr/out_*/feat_* arrays (see data/cached.py for the schema).

Usage:
  python scripts/extract_features.py --data-root DATA --split train \
      --out cached_features_train --model-dir model_zoo/team29 \
      [--patch 64] [--crops-per-image 4] [--batch 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--model-dir", default="model_zoo/team29")
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--crops-per-image", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.data.dataset import find_split_dirs, list_image_paths, match_pairs
    from freqfusion_tpu.models.experts import ExpertEnsemble
    from freqfusion_tpu.infer.io import _load_expert_params
    from freqfusion_tpu.utils.imageio import load_image
    from freqfusion_tpu.utils.runtime import (enable_compilation_cache,
                                              fast_random_variables,
                                              runtime_overrides,
                                              wait_for_backend)

    enable_compilation_cache()
    os.makedirs(args.out, exist_ok=True)

    lr_dir, hr_dir = find_split_dirs(args.data_root, args.split, args.scale)
    pairs = match_pairs(list_image_paths(lr_dir), list_image_paths(hr_dir))
    print(f"{len(pairs)} LR/HR pairs in {lr_dir}")

    expert_kwargs = runtime_overrides().get("model", {}).get("expert_kwargs") or {}
    model = ExpertEnsemble(**expert_kwargs)
    dummy = jnp.zeros((args.batch, args.patch, args.patch, 3))
    wait_for_backend()
    # shape-only init (~20 s vs 15-39 min of real host init — every loaded
    # leaf is overwritten by the checkpoints below anyway)
    variables = fast_random_variables(model, dummy)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # bare-ensemble tree: {hat,dat,nafnet} at the top of params (root=None)
    variables = _load_expert_params(variables, args.model_dir, root=None)
    variables = jax.device_put(jax.tree_util.tree_map(jnp.asarray, variables))
    fwd = jax.jit(lambda v, x: model.apply(v, x))

    from freqfusion_tpu.data.extract import extract_cached_features

    def forward(batch):
        return jax.device_get(fwd(variables, jnp.asarray(batch)))

    n = extract_cached_features(
        pairs, lambda lp, hp: (load_image(str(lp)), load_image(str(hp))),
        forward, args.out, args.patch, args.crops_per_image, args.batch,
        args.scale, args.seed)
    print(f"wrote {n} cached samples to {args.out}")


if __name__ == "__main__":
    main()
