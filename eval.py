#!/usr/bin/env python
"""IQA evaluator (reference eval.py equivalent).

Computes full-reference metrics over an output/target PNG directory pair and
writes `{parent}--{folder}.csv` + `.txt` in the reference's format
(eval.py:273-284). PSNR/SSIM follow the official protocol (Y channel, border
4, utils_image.py:287-312).

The reference's perceptual suite (LPIPS, DISTS, NIQE, MUSIQ, MANIQA,
CLIP-IQA via pyiqa, eval.py:48-133): NIQE is native (utils/niqe.py, fit
from the target corpus); every other column has a native flax tower —
LPIPS (utils/lpips.py), DISTS (utils/dists.py), CLIP-IQA
(utils/clipiqa.py), MUSIQ (utils/musiq.py), MANIQA (utils/maniqa.py) —
that goes live when its FREQFUSION_*_WEIGHTS env var points at a
checkpoint (weights can't be fetched in this zero-egress environment;
unconfigured columns are emitted as NaN and excluded from the Total
Score, whose formula is kept:
(1−LPIPS)+(1−DISTS)+CLIPIQA+MANIQA+MUSIQ/100+max(0,(10−NIQE)/10),
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


def _decode_pair(out_path, tgt_path):
    from PIL import Image

    out = np.asarray(Image.open(out_path).convert("RGB"))
    tgt = np.asarray(Image.open(tgt_path).convert("RGB"))
    if out.shape != tgt.shape:  # resize-to-common like eval.py:100-106
        tgt = np.asarray(Image.open(tgt_path).convert("RGB").resize(
            (out.shape[1], out.shape[0])))
    return out, tgt


def _pair_row(out_path, out, tgt, border, pristine):
    from freqfusion_tpu.utils.metrics import psnr_ssim_files

    p, s = psnr_ssim_files(out, tgt, border)
    nq = float("nan")
    if pristine is not None:
        from freqfusion_tpu.utils.niqe import niqe
        nq = niqe(out, pristine)
    return os.path.basename(out_path), p, s, nq


_WORKER_TOWERS = None  # per-process lazy tower cache (forked workers)


def _limit_worker_threads():
    """Pool initializer: pin each worker's XLA/BLAS pools to one thread.

    Runs in the child before its first jax backend init (XLA_FLAGS is
    read then, not at import). Without this, N workers × an XLA CPU
    client that spawns a host-wide thread pool each oversubscribe the
    machine — measured 2.5x SLOWER than one serial worker at 512² n=24."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1")
    os.environ["OMP_NUM_THREADS"] = "1"


def _one_pair(args):
    """One decode per pair: numpy metrics AND live towers computed in the
    same worker (VERDICT r3 #7 — the old shape re-decoded every pair in
    the main process and ran towers serially after the pooled pass).
    Towers build lazily once per worker process and their jits amortize
    across that worker's share of the directory."""
    out_path, tgt_path, border, pristine, with_towers = args
    global _WORKER_TOWERS
    out, tgt = _decode_pair(out_path, tgt_path)
    row = _pair_row(out_path, out, tgt, border, pristine)
    tower_vals = {}
    if with_towers:
        if _WORKER_TOWERS is None:
            _WORKER_TOWERS = _live_tower_metrics()
        for k, fn in _WORKER_TOWERS.items():
            tower_vals[k] = fn(out, tgt)
    return row + (tower_vals,)


def _force_platform(platform: str) -> None:
    """Pin the jax platform. The TPU harness's sitecustomize reads
    JAX_PLATFORMS at interpreter startup and force-registers the TPU
    plugin otherwise — and a second TPU process blocks on the tunnel
    while serving/bench runs, hanging eval. Eval's metric towers are
    small, so default CPU. Measured: the env var must be set at process
    start (setting it in main() is too late), so re-exec once."""
    if os.environ.get("JAX_PLATFORMS") != platform:
        env = dict(os.environ, JAX_PLATFORMS=platform)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    import jax
    jax.config.update("jax_platforms", platform)


def _live_tower_metrics() -> dict:
    """Native flax tower metrics whose weight env vars are set (reference
    eval.py:51-56 pyiqa metrics) — the shared load policy lives in
    perceptual_metrics.load_native_towers (CONFIGURED-but-broken weights
    warn loudly instead of silently dropping the column)."""
    from freqfusion_tpu.utils.perceptual_metrics import load_native_towers

    return load_native_towers()


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
    ap.add_argument("--platform", default="cpu",
        help="jax platform for the metric towers (default cpu — eval "
             "usually runs beside a TPU serving/bench process, and the "
             "harness exports JAX_PLATFORMS=axon globally, so the env "
             "var is deliberately NOT honored as a default)")
    ap.add_argument("--niqe-corpus", type=int, default=20,
                    help="max ground-truth images used to fit the pristine "
                         "NIQE model when model_zoo/niqe_pristine.npz is "
                         "absent")
    args = ap.parse_args()
    _force_platform(args.platform)

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

    # which tower columns are live: a jax-free env probe — the parent must
    # NOT build towers (= initialize XLA) before forking the pool, or the
    # children inherit a live XLA runtime and deadlock. Loads (and any
    # broken-checkpoint warnings) happen inside workers; a broken config
    # surfaces as a warned NaN column either way.
    from freqfusion_tpu.utils.perceptual_metrics import (
        configured_tower_columns)
    tower_cols = configured_tower_columns()
    jobs = [(os.path.join(args.output, o), os.path.join(args.target, t),
             args.border, pristine, bool(tower_cols))
            for o, t in zip(outs, tgts)]
    if args.workers > 1 and len(jobs) > 1:
        # everything — numpy metrics AND towers — shards over the pool,
        # one decode per pair (reference eval.py:162-221 shards all
        # metrics across workers the same way)
        with ProcessPoolExecutor(
                args.workers,
                initializer=_limit_worker_threads if tower_cols else None
                ) as pool:
            rows = list(pool.map(_one_pair, jobs))
    else:
        rows = [_one_pair(j) for j in jobs]
    fr_cols = {k: [r[4].get(k, float("nan")) for r in rows]
               for k in tower_cols}

    psnr_mean = float(np.mean([r[1] for r in rows if math.isfinite(r[1])]))
    ssim_mean = float(np.mean([r[2] for r in rows]))
    niqe_vals = [r[3] for r in rows if math.isfinite(r[3])]
    means = {"psnr": psnr_mean, "ssim": ssim_mean,
             **{k: float("nan") for k in PERCEPTUAL_COLUMNS}}
    if niqe_vals:
        means["niqe"] = float(np.mean(niqe_vals))
    for k, vals in fr_cols.items():
        means[k] = float(np.mean(vals))
    means["total_score"] = total_score(means)

    parent = os.path.basename(os.path.dirname(os.path.abspath(args.output)))
    folder = os.path.basename(os.path.abspath(args.output))
    csv_dir = args.csv_dir or os.path.dirname(os.path.abspath(args.output))
    stem = os.path.join(csv_dir, f"{parent}--{folder}")
    live = sorted(fr_cols)
    with open(stem + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image", "psnr", "ssim", "niqe"] + live)
        for i, (name, p, s, nq, _tv) in enumerate(rows):
            w.writerow([name, f"{p:.4f}", f"{s:.5f}", f"{nq:.4f}"]
                       + [f"{fr_cols[k][i]:.5f}" for k in live])
        w.writerow(["MEAN", f"{psnr_mean:.4f}", f"{ssim_mean:.5f}",
                    f"{means['niqe']:.4f}"]
                   + [f"{means[k]:.5f}" for k in live])
    with open(stem + ".txt", "w") as f:
        for k, v in means.items():
            f.write(f"{k}: {v}\n")
    print(f"PSNR {psnr_mean:.4f} dB  SSIM {ssim_mean:.5f}  "
          f"(n={len(rows)}) → {stem}.csv")


if __name__ == "__main__":
    main()
