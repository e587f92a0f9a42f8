#!/usr/bin/env python
"""NTIRE-style submission runner (reference test.py equivalent).

Selects the team model, times the whole `model_func` run, and writes SR PNGs
to `<save_dir>/<model_name>/<split>`. Timing uses host wall-clock around the
full call with device sync — the TPU equivalent of the reference's CUDA-event
timing (test.py:46-53).
"""

import argparse
import json
import os
import time


def select_model(model_id: int):
    if model_id == 29:
        from freqfusion_tpu.infer.io import main as model_func
        name = "29_FreqFusion_tpu"
        model_dir = os.environ.get("FREQFUSION_MODEL_DIR", "model_zoo/team29")
        return model_func, model_dir, name
    raise ValueError(f"unknown model id {model_id}")


def run(model_func, model_dir, input_path, output_path):
    # apply the JAX_PLATFORMS override BEFORE jax.devices() initializes
    # backends (the axon sitecustomize force-registers the TPU platform;
    # config updates are silently ignored once backends exist)
    from freqfusion_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    dev = jax.devices()[0]
    t0 = time.time()
    n = model_func(model_dir, input_path, output_path, dev)
    jax.effects_barrier()
    elapsed = (time.time() - t0) * 1000.0
    print(f"------> Runtime (including IO) of {n} images: {elapsed:.1f} ms "
          f"({elapsed / max(n, 1):.1f} ms/image)")
    return elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", type=int, default=29)
    ap.add_argument("--input", type=str, required=True, help="LR PNG directory")
    ap.add_argument("--save_dir", type=str, default="results")
    ap.add_argument("--split", type=str, default="valid", choices=["valid", "test"])
    args = ap.parse_args()

    model_func, model_dir, name = select_model(args.model_id)
    out_dir = os.path.join(args.save_dir, name, args.split)
    elapsed = run(model_func, model_dir, args.input, out_dir)

    results_path = os.path.join(args.save_dir, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    results[name] = {"runtime_ms": elapsed, "split": args.split}
    with open(results_path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
