"""One-command smoke pipeline (VERDICT round-1 next #10): the four CLIs
compose — extract_features → train (cached) → test.py → eval.py — on
synthetic data with tiny experts, proving the full loop including
native-checkpoint serving (train.py writes .ckpt, io.main loads it)."""

import pytest
import json
import os
import subprocess
import sys

import numpy as np
import yaml

from freqfusion_tpu.utils.imageio import save_image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL = {
    "fusion_dim": 16, "num_heads": 2, "refine_depth": 2, "refine_channels": 8,
    "enable_hierarchical": True, "enable_lka": True,
    "enable_edge_enhance": True, "enable_multi_domain_freq": True,
    "enable_dynamic_selection": True, "enable_cross_band_attn": True,
    "enable_adaptive_bands": True, "enable_multi_resolution": True,
    "enable_collaborative": True,
    "expert_kwargs": {
        "hat_kwargs": {"embed_dim": 24, "depths": [1], "num_heads": [2],
                       "window": 4, "squeeze": 6},
        "dat_kwargs": {"embed_dim": 32, "depths": [1], "num_heads": [2],
                       "split_size": [2, 4], "expansion": 2.0},
        "nafnet_kwargs": {"width": 8, "middle_blk_num": 1,
                          "enc_blk_nums": [1, 1], "dec_blk_nums": [1, 1]}},
}


def _run(cmd, env_extra, cwd=REPO, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    env.pop("XLA_FLAGS", None)  # single virtual device is enough & faster
    r = subprocess.run([sys.executable] + cmd, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.mark.slow
def test_extract_train_test_eval_compose(tmp_path):
    # synthetic dataset
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    for split, n, seed in (("train", 3, 0), ("val", 2, 1)):
        r = np.random.default_rng(seed)
        for i in range(n):
            hr = r.uniform(size=(64, 64, 3)).astype(np.float32)
            save_image(hr[::4, ::4], str(data / f"{split}_LR" / f"i{i}x4.png"))
            save_image(hr, str(data / f"{split}_HR" / f"i{i}.png"))

    # runtime shrink config shared by the CLIs
    rc = tmp_path / "tiny.yaml"
    rc.write_text(yaml.safe_dump({
        "model": TINY_MODEL,
        "infer": {"tile": 16, "overlap": 4, "tile_batch": 2}}))
    env = {"FREQFUSION_CONFIG": str(rc),
           "FREQFUSION_MODEL_DIR": str(tmp_path / "serve")}

    # 1) extract cached features (the producer missing from the reference)
    for split in ("train", "val"):
        _run(["scripts/extract_features.py", "--data-root", str(data),
              "--split", split, "--out", str(tmp_path / f"cache_{split}"),
              "--model-dir", str(tmp_path / "nozoo"), "--patch", "8",
              "--crops-per-image", "2", "--batch", "2"], env)
    assert len(list((tmp_path / "cache_train").glob("*.npz"))) == 6

    # 2) cached-mode training, 2 epochs
    tc = yaml.safe_load(open(os.path.join(REPO, "configs/train_config.yaml")))
    tc["seed"] = 0
    tc["data"].update({"cached": True, "batch_size": 2,
                       "cached_train_dir": str(tmp_path / "cache_train"),
                       "cached_val_dir": str(tmp_path / "cache_val")})
    tc["model"].update({k: v for k, v in TINY_MODEL.items()
                        if k != "expert_kwargs"})
    tc["optim"].update({"warmup_epochs": 0, "accumulation_steps": 1})
    tc["train"].update({"epochs": 2, "validate_start": 0, "validate_every": 1,
                        "save_every": 1, "max_best": 2,
                        "checkpoint_dir": str(tmp_path / "serve"),
                        "log_dir": str(tmp_path / "logs"), "print_freq": 1})
    tc["parallel"]["n_devices"] = 1
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(tc))
    _run(["train.py", "--config", str(cfg_path)], env)
    assert (tmp_path / "serve" / "latest.ckpt").exists()

    # 3) NTIRE runner: writes SR PNGs using the freshly-trained native ckpt
    _run(["test.py", "--input", str(data / "val_LR"),
          "--save_dir", str(tmp_path / "results")], env)
    out_dir = tmp_path / "results" / "29_FreqFusion_tpu" / "valid"
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2
    results = json.loads((tmp_path / "results" / "results.json").read_text())
    assert "29_FreqFusion_tpu" in results

    # 4) IQA evaluator over outputs vs HR targets
    _run(["eval.py", "--output", str(out_dir), "--target",
          str(data / "val_HR"), "--workers", "1"], env)
    csvs = list(out_dir.parent.glob("*.csv")) + list(tmp_path.glob("**/*.csv"))
    assert csvs, "eval.py wrote no csv"
