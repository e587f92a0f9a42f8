"""Tracing / profiling helpers (SURVEY.md §5 "tracing" subsystem).

The reference times submissions with CUDA events and prints per-epoch
imgs/sec + peak GPU memory (test.py:46-53, train.py:1008-1058, 1160-1181).
TPU-native equivalents: `jax.profiler` traces viewable in XProf/TensorBoard,
a device-synchronized step timer, and device memory stats from the runtime.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer with device synchronization (the CUDA-event analog)."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {"mean_s": sum(ts) / len(ts), "p50_s": ts[len(ts) // 2],
                "min_s": ts[0], "max_s": ts[-1], "n": len(ts)}


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory stats (bytes), when the backend reports them."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
