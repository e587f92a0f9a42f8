"""Checkpoint management (reference CheckpointManager,
src/utils/checkpoint_manager.py:25-427).

Re-designed around flax msgpack serialization instead of torch.save, keeping
the reference's operational behavior:
- atomic writes (tmp + rename, :137-140)
- `latest.ckpt` copy (:159-163)
- best-K retention with eviction of the worst (:167-183)
- best-file naming `best_epoch{E:04d}_psnr{V:.2f}.ckpt` (:129-133)
- JSON `training_history.json` + restoration of best-K state on resume
  (the "amnesia-bug" fix, :279-305)

Checkpoint payload: epoch, params, batch_stats, opt_state, metrics,
ema_state, extra — the reference's schema (:108-126) with torch-specific
fields mapped to their jax equivalents.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class CheckpointManager:
    def __init__(self, checkpoint_dir: str, max_best: int = 3,
                 save_every: int = 10, metric_name: str = "psnr",
                 higher_is_better: bool = True):
        self.dir = checkpoint_dir
        self.max_best = max_best
        self.save_every = save_every
        self.metric_name = metric_name
        self.higher = higher_is_better
        os.makedirs(self.dir, exist_ok=True)
        self.best: List[Dict[str, Any]] = []  # [{epoch, value, path}]
        self.history: List[Dict[str, Any]] = []
        self._load_history()

    # -- history ----------------------------------------------------------
    @property
    def _history_path(self):
        return os.path.join(self.dir, "training_history.json")

    def _load_history(self):
        if not os.path.exists(self._history_path):
            return
        with open(self._history_path) as f:
            data = json.load(f)
        self.history = data.get("history", [])
        # restore best-K tracking from history ("amnesia-bug" fix)
        self.best = [b for b in data.get("best", [])
                     if os.path.exists(b.get("path", ""))]

    def _save_history(self):
        _atomic_write(self._history_path, json.dumps(
            {"history": self.history, "best": self.best}, indent=2).encode())

    # -- queries ----------------------------------------------------------
    def best_value(self) -> Optional[float]:
        if not self.best:
            return None
        return max(b["value"] for b in self.best) if self.higher else \
            min(b["value"] for b in self.best)

    def is_best(self, value: float) -> bool:
        bv = self.best_value()
        if bv is None:
            return True
        return value > bv if self.higher else value < bv

    def should_save(self, epoch: int) -> bool:
        return (epoch + 1) % self.save_every == 0

    def get_best_checkpoint(self) -> Optional[str]:
        if not self.best:
            return None
        key = (lambda b: -b["value"]) if self.higher else (lambda b: b["value"])
        return sorted(self.best, key=key)[0]["path"]

    def latest_path(self) -> str:
        return os.path.join(self.dir, "latest.ckpt")

    # -- save / load ------------------------------------------------------
    def save_checkpoint(self, epoch: int, payload: Dict[str, Any],
                        metrics: Dict[str, float], is_best: bool = False):
        """payload: {params, batch_stats, opt_state, ema_state, extra...}."""
        record = {"epoch": epoch, "metrics": dict(metrics), **payload}
        record = serialization.to_state_dict(jax.device_get(record))
        blob = serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, record))

        latest = self.latest_path()
        _atomic_write(latest, blob)

        if is_best:
            value = float(metrics.get(self.metric_name, 0.0))
            name = f"best_epoch{epoch:04d}_{self.metric_name}{value:.2f}.ckpt"
            path = os.path.join(self.dir, name)
            shutil.copyfile(latest, path)
            self.best.append({"epoch": epoch, "value": value, "path": path})
            key = (lambda b: -b["value"]) if self.higher else (lambda b: b["value"])
            self.best.sort(key=key)
            while len(self.best) > self.max_best:
                evicted = self.best.pop()
                if os.path.exists(evicted["path"]):
                    os.remove(evicted["path"])

        self.history.append({"epoch": epoch, "metrics": dict(metrics)})
        self._save_history()

    def load(self, path: Optional[str] = None,
             target: Optional[Dict[str, Any]] = None) -> Optional[Dict[str, Any]]:
        """Load a checkpoint. With `target` (a matching pytree of the live
        structures, e.g. a fresh TrainState payload), structured leaves like
        optax states are rebuilt via from_state_dict."""
        path = path or self.latest_path()
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        if target is not None:
            state = serialization.from_state_dict(target, state)
        return state
