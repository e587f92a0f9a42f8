"""Host-side PNG IO.

PNG-in/PNG-out behavior mirrors the reference challenge wrapper
(models/team29_FreqFusion/io.py:64-76): load → RGB float32 [0,1] HWC;
save → clip → round → uint8 PNG.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image


def load_image(path: str) -> np.ndarray:
    """PNG/JPG → float32 HWC RGB in [0,1]."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(arr: np.ndarray, path: str) -> None:
    """float HWC RGB in [0,1] → uint8 PNG (clip + round, like io.py:71-76)."""
    arr = np.clip(arr, 0.0, 1.0)
    arr = np.round(arr * 255.0).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)


def list_images(directory: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(exts)
    )
