"""Shared numerical ops for FreqFusion-TPU."""

from .resize import resize, upsample, downsample  # noqa: F401
from .common import (  # noqa: F401
    channel_layernorm,
    pixel_shuffle,
    pixel_unshuffle,
    pad_to_multiple,
    same_pad,
)
