"""Native (C++) host-side runtime components, loaded via ctypes.

Builds lazily with g++ on first use and caches the shared object next to
the source; every consumer has a pure-numpy fallback, so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_stitch_lib():
    """Return the stitch ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        so = os.path.join(here, "libstitch.so")
        src = os.path.join(here, "stitch.cc")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
            fp = ctypes.POINTER(ctypes.c_float)
            lib.stitch_accumulate.argtypes = [fp, fp, fp, fp, fp] + \
                [ctypes.c_int64] * 6
            lib.stitch_accumulate.restype = None
            lib.stitch_normalize.argtypes = [fp, fp, ctypes.c_int64,
                                             ctypes.c_int64, ctypes.c_float]
            lib.stitch_normalize.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB
