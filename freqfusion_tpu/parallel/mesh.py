"""Device mesh + sharding layout.

TPU-native replacement for the reference's parallelism (SURVEY.md §2.8): the
reference places experts on different GPUs with CUDA streams + threads
(expert_loader.py:709-766) and shards eval over processes (eval.py:162-221).
Here ONE jitted program runs on a 1-D `('data',)` mesh: the batch (training
patches or inference tiles) is sharded over ICI, params are replicated, and
XLA inserts the psum for gradient reduction. v5e-8 → Mesh(8, ('data',)).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} present")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate params/opt state on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
