"""Device mesh + sharding helpers (the distributed layer).

The reference has no live multi-device path (its DataParallel/SyncBN
machinery is vendored but dormant — SURVEY.md §2.3); here data parallelism
is first-class: a 1-D ``('data',)`` mesh over all local devices, batches
sharded batch-first, params replicated. XLA inserts the gradient psum over
ICI when the jitted train step runs under these shardings.

The mesh generalizes to multi-axis ((data, model)) for future tensor-
parallel heads; for this model family DP is the right (and sufficient)
strategy: the hot compute is convolutional with batch as the only large
independent axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the mesh; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with batch-dim sharding."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
