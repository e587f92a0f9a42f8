"""Perceptual quality evaluation (reference src/utils/perceptual_metrics.py).

The reference wraps LPIPS + pyiqa metric networks behind availability flags
and aggregates a perceptual score. Those metric networks require pretrained
backbones that cannot be fetched in this zero-egress environment, so this
module keeps the same interface and flag behavior — each metric reports
availability, unavailable metrics return NaN, and `perceptual_score` uses
whatever is available (same formula as eval.py:245-268).

Always-available metrics implemented natively: PSNR, SSIM (Y, border 4), a
gradient-magnitude sharpness proxy, and NIQE (utils/niqe.py — native
feature pipeline; call `fit_pristine(corpus)` first, e.g. with the
ground-truth images, to activate the column). Native flax towers whose
columns go live the moment public weights land (zero-egress here):
LPIPS (utils/lpips.py, FREQFUSION_LPIPS_WEIGHTS), DISTS (utils/dists.py,
FREQFUSION_DISTS_WEIGHTS), CLIP-IQA (utils/clipiqa.py,
FREQFUSION_CLIPIQA_WEIGHTS + FREQFUSION_CLIP_BPE), MUSIQ (utils/musiq.py,
FREQFUSION_MUSIQ_WEIGHTS) and MANIQA (utils/maniqa.py,
FREQFUSION_MANIQA_WEIGHTS) — all six reference columns have native
towers; each module docstring documents its rebuilt-from-publication
layout and deviations.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from .metrics import psnr_ssim_files


def _try_import(name):
    try:
        __import__(name)
        return True
    except ImportError:
        return False


# tower column → env vars that gate it (all must resolve to existing files)
TOWER_ENV = {"lpips": ("FREQFUSION_LPIPS_WEIGHTS",),
             "dists": ("FREQFUSION_DISTS_WEIGHTS",),
             "clipiqa": ("FREQFUSION_CLIPIQA_WEIGHTS", "FREQFUSION_CLIP_BPE"),
             "musiq": ("FREQFUSION_MUSIQ_WEIGHTS",),
             "maniqa": ("FREQFUSION_MANIQA_WEIGHTS",)}


def configured_tower_columns():
    """Columns whose weight env vars resolve to existing files — a cheap
    jax-free probe. eval.py uses this BEFORE forking its worker pool so
    the parent never initializes XLA (forked children inheriting a live
    XLA runtime deadlock); the actual loads (and any broken-checkpoint
    warnings) happen inside the workers via load_native_towers."""
    import os
    return sorted(k for k, envs in TOWER_ENV.items()
                  if all(os.environ.get(e) and os.path.exists(os.environ[e])
                         for e in envs))


def load_native_towers() -> Dict[str, object]:
    """The native flax metric towers whose weight env vars resolve, as
    {column: callable(output, target=None) -> float}. Missing weights →
    absent silently; CONFIGURED but broken weights → absent with a loud
    warning (a silent NaN column hides the misconfiguration). Shared by
    eval.py and PerceptualEvaluator so the CLI and the library evaluator
    cannot drift on load policy."""
    import os
    import warnings

    from .clipiqa import NativeCLIPIQA
    from .dists import NativeDISTS
    from .lpips import NativeLPIPS
    from .maniqa import NativeMANIQA
    from .musiq import NativeMUSIQ

    makers = {"lpips": NativeLPIPS, "dists": NativeDISTS,
              "clipiqa": NativeCLIPIQA, "musiq": NativeMUSIQ,
              "maniqa": NativeMANIQA}
    towers = {}
    for name, maker in makers.items():
        env = TOWER_ENV[name][0]
        try:
            towers[name] = maker()
        except Exception as e:
            if os.environ.get(env):
                warnings.warn(f"{name} weights configured via {env} but "
                              f"failed to load ({e}); column stays NaN")
    return towers


class PerceptualEvaluator:
    def __init__(self):
        self.lpips_available = _try_import("lpips")
        self.pyiqa_available = _try_import("pyiqa")
        from .niqe import load_pristine
        self._niqe_pristine = load_pristine()
        self._lpips = None
        self._native_lpips = None
        if self.lpips_available:
            try:
                import lpips
                self._lpips = lpips.LPIPS(net="alex")
            except Exception:
                self.lpips_available = False
        # native flax towers (LPIPS / DISTS / CLIP-IQA), live when their
        # FREQFUSION_*_WEIGHTS env vars point at the official checkpoints —
        # shared load policy with eval.py (load_native_towers)
        towers = load_native_towers()
        if self._lpips is None:
            self._native_lpips = towers.get("lpips")
            self.lpips_available = self._native_lpips is not None
        self._native_dists = towers.get("dists")
        self._native_clipiqa = towers.get("clipiqa")
        self._native_musiq = towers.get("musiq")
        self._native_maniqa = towers.get("maniqa")

    @property
    def available_metrics(self):
        out = ["psnr", "ssim", "sharpness"]
        if self._niqe_pristine is not None:
            out.append("niqe")
        if self.lpips_available:
            out.append("lpips")
        if self._native_dists is not None:
            out.append("dists")
        if self._native_clipiqa is not None:
            out.append("clipiqa")
        if self._native_musiq is not None:
            out.append("musiq")
        if self._native_maniqa is not None:
            out.append("maniqa")
        if self.pyiqa_available:
            out += [m for m in ("dists", "musiq", "maniqa", "clipiqa", "niqe")
                    if m not in out]
        return out

    def fit_pristine(self, images) -> None:
        """Fit the NIQE pristine model from a corpus of clean images
        (typically the ground-truth set) — activates the niqe column."""
        from .niqe import fit_pristine
        self._niqe_pristine = fit_pristine(images)

    @staticmethod
    def sharpness(img: np.ndarray) -> float:
        """Mean gradient magnitude — a no-reference sharpness proxy."""
        g = img.astype(np.float64)
        gy = np.diff(g, axis=0)
        gx = np.diff(g, axis=1)
        return float(np.mean(np.abs(gy)) + np.mean(np.abs(gx)))

    def evaluate_pair(self, output: np.ndarray, target: np.ndarray,
                      border: int = 4) -> Dict[str, float]:
        """uint8 HWC RGB pair → metric dict (NaN for unavailable metrics)."""
        p, s = psnr_ssim_files(output, target, border)
        res = {
            "psnr": p, "ssim": s, "sharpness": self.sharpness(output),
            "lpips": float("nan"), "dists": float("nan"),
            "niqe": float("nan"), "musiq": float("nan"),
            "maniqa": float("nan"), "clipiqa": float("nan"),
        }
        if self._niqe_pristine is not None:
            from .niqe import niqe
            res["niqe"] = niqe(output, self._niqe_pristine)
        if self._lpips is not None:
            import torch
            to_t = lambda a: torch.from_numpy(
                a.astype(np.float32) / 127.5 - 1.0).permute(2, 0, 1)[None]
            with torch.no_grad():
                res["lpips"] = float(self._lpips(to_t(output), to_t(target)))
        elif self._native_lpips is not None:
            res["lpips"] = self._native_lpips(output, target)
        if self._native_dists is not None:
            res["dists"] = self._native_dists(output, target)
        if self._native_clipiqa is not None:
            res["clipiqa"] = self._native_clipiqa(output)
        if self._native_musiq is not None:
            res["musiq"] = self._native_musiq(output)
        if self._native_maniqa is not None:
            res["maniqa"] = self._native_maniqa(output)
        return res

    @staticmethod
    def perceptual_score(means: Dict[str, float]) -> float:
        """(1−LPIPS)+(1−DISTS)+CLIPIQA+MANIQA+MUSIQ/100+max(0,(10−NIQE)/10),
        summing only the available (non-NaN) terms."""
        score = 0.0
        for k, term in (("lpips", lambda v: 1.0 - v),
                        ("dists", lambda v: 1.0 - v),
                        ("clipiqa", lambda v: v),
                        ("maniqa", lambda v: v),
                        ("musiq", lambda v: v / 100.0),
                        ("niqe", lambda v: max(0.0, (10.0 - v) / 10.0))):
            v = means.get(k, float("nan"))
            if not math.isnan(v):
                score += term(v)
        return score
