"""Pallas TPU kernels for the hot ops (XLA fallbacks always available)."""
