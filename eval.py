#!/usr/bin/env python
"""IQA evaluator (reference eval.py equivalent).

Computes full-reference metrics over an output/target PNG directory pair and
writes `{parent}--{folder}.csv` + `.txt` in the reference's format
(eval.py:273-284). PSNR/SSIM follow the official protocol (Y channel, border
4, utils_image.py:287-312).

The reference's no-reference perceptual suite (LPIPS, DISTS, NIQE, MUSIQ,
MANIQA, CLIP-IQA via pyiqa) requires pretrained backbones that cannot be
fetched in this zero-egress environment; those columns are emitted as NaN
and excluded from the Total Score, whose formula is kept
((1−LPIPS)+(1−DISTS)+CLIPIQA+MANIQA+MUSIQ/100+max(0,(10−NIQE)/10),
eval.py:245-268).

Parallelism: the reference shards images over GPUs with multiprocessing
(eval.py:162-221); here a process pool shards over host CPUs — metric math
is host-side numpy either way.
"""

import argparse
import csv
import math
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PERCEPTUAL_COLUMNS = ("lpips", "dists", "niqe", "musiq", "maniqa", "clipiqa")


def _one_pair(args):
    out_path, tgt_path, border, pristine = args
    from PIL import Image
    from freqfusion_tpu.utils.metrics import psnr_ssim_files

    out = np.asarray(Image.open(out_path).convert("RGB"))
    tgt = np.asarray(Image.open(tgt_path).convert("RGB"))
    if out.shape != tgt.shape:  # resize-to-common like eval.py:100-106
        tgt = np.asarray(Image.open(tgt_path).convert("RGB").resize(
            (out.shape[1], out.shape[0])))
    p, s = psnr_ssim_files(out, tgt, border)
    nq = float("nan")
    if pristine is not None:
        from freqfusion_tpu.utils.niqe import niqe
        nq = niqe(out, pristine)
    return os.path.basename(out_path), p, s, nq


def total_score(means: dict) -> float:
    """Weighted perception score with available components only."""
    score = 0.0
    if not math.isnan(means.get("lpips", float("nan"))):
        score += 1.0 - means["lpips"]
    if not math.isnan(means.get("dists", float("nan"))):
        score += 1.0 - means["dists"]
    for k in ("clipiqa", "maniqa"):
        if not math.isnan(means.get(k, float("nan"))):
            score += means[k]
    if not math.isnan(means.get("musiq", float("nan"))):
        score += means["musiq"] / 100.0
    if not math.isnan(means.get("niqe", float("nan"))):
        score += max(0.0, (10.0 - means["niqe"]) / 10.0)
    return score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True, help="SR output PNG dir")
    ap.add_argument("--target", required=True, help="ground-truth PNG dir")
    ap.add_argument("--border", type=int, default=4)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--csv-dir", default=None,
                    help="where to write the csv/txt (default: next to the "
                         "output dir, keeping the reference's naming)")
    ap.add_argument("--no-niqe", action="store_true",
                    help="skip the native NIQE column")
    ap.add_argument("--niqe-corpus", type=int, default=20,
                    help="max ground-truth images used to fit the pristine "
                         "NIQE model when model_zoo/niqe_pristine.npz is "
                         "absent")
    args = ap.parse_args()

    outs = sorted(f for f in os.listdir(args.output) if f.lower().endswith(".png"))
    tgts = sorted(f for f in os.listdir(args.target) if f.lower().endswith(".png"))
    assert len(outs) == len(tgts), \
        f"count mismatch: {len(outs)} outputs vs {len(tgts)} targets"

    # NIQE pristine model: user-provided npz, else fit from the ground-truth
    # corpus (clean images by definition of the protocol) — utils/niqe.py
    pristine = None
    if not args.no_niqe:
        from PIL import Image
        from freqfusion_tpu.utils.niqe import fit_pristine, load_pristine
        pristine = load_pristine()
        if pristine is None:
            corpus = [np.asarray(Image.open(
                os.path.join(args.target, t)).convert("RGB"))
                for t in tgts[:args.niqe_corpus]]
            try:
                pristine = fit_pristine(corpus)
            except ValueError:
                pristine = None  # images too small — column stays NaN

    jobs = [(os.path.join(args.output, o), os.path.join(args.target, t),
             args.border, pristine) for o, t in zip(outs, tgts)]
    if args.workers > 1 and len(jobs) > 1:
        with ProcessPoolExecutor(args.workers) as pool:
            rows = list(pool.map(_one_pair, jobs))
    else:
        rows = [_one_pair(j) for j in jobs]

    psnr_mean = float(np.mean([r[1] for r in rows if math.isfinite(r[1])]))
    ssim_mean = float(np.mean([r[2] for r in rows]))
    niqe_vals = [r[3] for r in rows if math.isfinite(r[3])]
    means = {"psnr": psnr_mean, "ssim": ssim_mean,
             **{k: float("nan") for k in PERCEPTUAL_COLUMNS}}
    if niqe_vals:
        means["niqe"] = float(np.mean(niqe_vals))
    means["total_score"] = total_score(means)

    parent = os.path.basename(os.path.dirname(os.path.abspath(args.output)))
    folder = os.path.basename(os.path.abspath(args.output))
    csv_dir = args.csv_dir or os.path.dirname(os.path.abspath(args.output))
    stem = os.path.join(csv_dir, f"{parent}--{folder}")
    with open(stem + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image", "psnr", "ssim", "niqe"])
        for name, p, s, nq in rows:
            w.writerow([name, f"{p:.4f}", f"{s:.5f}", f"{nq:.4f}"])
        w.writerow(["MEAN", f"{psnr_mean:.4f}", f"{ssim_mean:.5f}",
                    f"{means['niqe']:.4f}"])
    with open(stem + ".txt", "w") as f:
        for k, v in means.items():
            f.write(f"{k}: {v}\n")
    print(f"PSNR {psnr_mean:.4f} dB  SSIM {ssim_mean:.5f}  "
          f"(n={len(rows)}) → {stem}.csv")


if __name__ == "__main__":
    main()
