"""Mesh construction and sharding rules (data-parallel over ICI)."""

from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
