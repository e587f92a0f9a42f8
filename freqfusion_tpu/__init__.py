"""FreqFusion-TPU — a TPU-native ×4 super-resolution framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Nikhil-AI-Labs/image-super-resolution-2 ("FreqFusion", NTIRE 2026 Team 29):
three frozen expert SR models (HAT-L, DAT, NAFNet-64), multi-domain
frequency decomposition (DCT/DWT/FFT), and a ~1.2M-param trainable fusion
head — plus training, eval and tiled full-resolution inference pipelines,
all built TPU-first (NHWC layouts, static shapes, pjit/shard_map over a
device mesh, Pallas kernels for the hot ops).

This package is the `image-super-resolution-2_tpu` framework; the import
name uses the project codename because hyphens are not valid in Python
package names.

Layout
------
- ``freqfusion_tpu.ops``      — shared numerical ops (torch-parity resize,
  pixel-shuffle, window partitioning, DCT/DWT/FFT) + Pallas kernels.
- ``freqfusion_tpu.models``   — the three experts and the fusion head.
- ``freqfusion_tpu.data``     — datasets, augmentation, cached features.
- ``freqfusion_tpu.losses``   — the weight-driven combined training loss.
- ``freqfusion_tpu.training`` — train loop, EMA, checkpoints, schedules.
- ``freqfusion_tpu.parallel`` — mesh construction and sharding rules.
- ``freqfusion_tpu.infer``    — the challenge `model_func` contract and the
  tiled full-resolution inference pipeline.
- ``freqfusion_tpu.utils``    — metrics, PNG IO, logging, torch→jax
  checkpoint conversion.
"""

__version__ = "0.1.0"
