"""Device mesh and sharding helpers.

The reference's only intra-training parallelism is N rollout worker processes
with a pickled copy of everything (``rllab/sampler/stateful_pool.py``) — the
optimizer itself is single-device. Here training is data-parallel over a
``jax.sharding.Mesh``: parameters are replicated, batches are sharded on the
``data`` axis, and XLA inserts the gradient all-reduce over ICI. The same
helpers serve the multi-chip dry-run (virtual CPU devices) and real slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host batch with dim 0 sharded over the mesh.

    Pads nothing: callers must make batch divisible by mesh size (the trainer
    rounds its batch size up at construction).
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
