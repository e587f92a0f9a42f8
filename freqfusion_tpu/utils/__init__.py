"""Utilities: metrics, PNG IO, logging, checkpoint conversion."""
