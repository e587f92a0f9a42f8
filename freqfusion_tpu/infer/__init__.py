"""Inference: challenge `model_func` contract + tiled full-res pipeline."""
