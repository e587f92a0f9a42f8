"""Cached expert-feature dataset — the 10–20× training speedup path.

Re-design of /root/reference/src/data/cached_dataset.py. Two storage formats
are supported:

1. **Native .npz** (produced by scripts/extract_features.py — the framework's
   implementation of the producer missing from the reference, SURVEY.md
   §3.5): one file per crop with keys
   lr [h,w,3] · hr [4h,4w,3] · out_{hat,dat,nafnet} [4h,4w,3] ·
   feat_{hat,dat} [h,w,180] · feat_nafnet [h,w,64].
2. **Reference .pt pairs** ({stem}_hat_part.pt + {stem}_rest_part.pt,
   cached_dataset.py:39-200), loaded via torch when present, including the
   drct→hat / grl→dat key remaps (cached_dataset.py:62-67).

Augmentation is geometric-only and applied consistently to every tensor of a
sample (cached_dataset.py:214-268).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .augment import geometric_augment_group

_KEY_REMAP = {"drct": "hat", "grl": "dat"}


def _remap(name: str) -> str:
    return _KEY_REMAP.get(name, name)


def _chw_to_hwc(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.float32)
    if a.ndim == 4:
        a = a[0]
    return np.transpose(a, (1, 2, 0))


class CachedFeatureDataset:
    def __init__(self, cache_dir, augment: bool = True, seed: int = 0):
        self.dir = Path(cache_dir)
        self.augment = augment
        self.rng = np.random.default_rng(seed)
        self.samples = self._index()
        if not self.samples:
            raise FileNotFoundError(f"no cached samples under {cache_dir}")

    def _index(self) -> List[Dict]:
        npz = sorted(self.dir.glob("*.npz"))
        if npz:
            return [{"fmt": "npz", "path": p} for p in npz]
        hat_parts = sorted(self.dir.glob("*_hat_part.pt")) + \
            sorted(self.dir.glob("*_drct_part.pt"))
        out = []
        for hp in hat_parts:
            stem = hp.name.replace("_hat_part.pt", "").replace("_drct_part.pt", "")
            for rest_name in (f"{stem}_rest_part.pt",):
                rp = self.dir / rest_name
                if rp.exists():
                    out.append({"fmt": "pt", "hat": hp, "rest": rp})
        return out

    def __len__(self):
        return len(self.samples)

    def _load_npz(self, path) -> Dict[str, np.ndarray]:
        with np.load(path) as z:
            return {k: np.asarray(z[k], np.float32) for k in z.files}

    def _load_pt(self, rec) -> Dict[str, np.ndarray]:
        import torch

        hat = torch.load(rec["hat"], map_location="cpu", weights_only=False)
        rest = torch.load(rec["rest"], map_location="cpu", weights_only=False)
        sample = {
            "lr": np.transpose(np.asarray(hat["lr"], np.float32), (1, 2, 0)),
            "hr": np.transpose(np.asarray(hat["hr"], np.float32), (1, 2, 0)),
        }
        for part in (hat, rest):
            for name, t in part.get("outputs", {}).items():
                sample[f"out_{_remap(name)}"] = _chw_to_hwc(t)
            for name, t in part.get("features", {}).items():
                sample[f"feat_{_remap(name)}"] = _chw_to_hwc(t)
        return sample

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.samples[idx % len(self.samples)]
        sample = (self._load_npz(rec["path"]) if rec["fmt"] == "npz"
                  else self._load_pt(rec))
        if self.augment:
            keys = [k for k in sample if k != "name"]
            arrays = geometric_augment_group([sample[k] for k in keys], self.rng)
            sample = dict(zip(keys, arrays))
        return sample


def prefetch(iterator, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue — overlaps
    host-side batch assembly (decode/stack) with device compute, the
    TPU-host analog of the reference's pinned-memory prefetching DataLoader
    workers (SURVEY.md §2.8-3)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True):
    """Simple epoch iterator yielding stacked numpy batches in the train-step
    layout {lr, hr, expert_outputs{...}, expert_features{...}}."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    end = len(order) - (len(order) % batch_size if drop_last else 0)
    for i in range(0, end, batch_size):
        items = [dataset[int(j)] for j in order[i:i + batch_size]]
        if not items:
            continue
        batch = {
            "lr": np.stack([it["lr"] for it in items]),
            "hr": np.stack([it["hr"] for it in items]),
        }
        if "out_hat" in items[0]:
            batch["expert_outputs"] = {
                n: np.stack([it[f"out_{n}"] for it in items])
                for n in ("hat", "dat", "nafnet")}
        if "feat_hat" in items[0]:
            batch["expert_features"] = {
                n: np.stack([it[f"feat_{n}"] for it in items])
                for n in ("hat", "dat", "nafnet")}
        yield batch
