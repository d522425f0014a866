"""Multi-host (multi-process) data parallelism.

One JAX process per host, each owning its local TPU chips; together they
form one global ``('data',)`` mesh. Three pieces make the training loop
multi-host ready:

1. ``initialize()`` — bring up the JAX distributed runtime (call before any
   device query; one coordinator, N processes).
2. ``partition_ids()`` — give each process a disjoint, equally-sized slice
   of the dataset. Semantics match the reference's vendored-but-dormant
   ``DistributedSampler`` (``modal/lib/utils/data/distributed.py:34-50``):
   wrap-around pad to ``ceil(N/P)*P``, then contiguous rank slices — this
   framework makes that dormant capability live.
3. ``global_batch()`` — assemble each process's local host batch into one
   global, batch-sharded ``jax.Array`` via
   ``jax.make_array_from_process_local_data`` (SURVEY.md §5's named
   mechanism), so the same jitted train step runs unchanged: XLA places the
   gradient psum over ICI within a slice and DCN across slices.

Single-process (the common case) degrades exactly: ``initialize`` is a
no-op, ``partition_ids`` returns everything, and ``global_batch`` equals
``mesh.shard_batch`` bit-for-bit (``tests/test_multihost.py``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import numpy as np

from .mesh import batch_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Start the JAX distributed runtime (no-op for a single process).

    Must run before anything initializes the backends (``jax.devices()``
    etc.). ``coordinator_address`` is ``host:port`` of process 0.
    """
    if num_processes is None or num_processes <= 1:
        return
    if coordinator_address is None:
        raise ValueError("multi-process run needs --coordinator host:port")
    if process_id is None:
        raise ValueError("multi-process run needs --process_id")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def partition_ids(ids: Sequence[int],
                  index: Optional[int] = None,
                  count: Optional[int] = None) -> np.ndarray:
    """This process's slice of ``ids``: every process gets exactly
    ``ceil(N/count)`` ids; when ``count`` does not divide N the tail is
    padded by wrapping to the front (the DistributedSampler convention —
    equal lengths keep every host on the same step count, which lock-step
    collectives require)."""
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    if not 0 <= index < count:
        raise ValueError(f"process index {index} not in [0, {count})")
    ids = np.asarray(ids)
    if count == 1:
        return ids
    per = math.ceil(len(ids) / count)
    total = per * count
    padded = np.concatenate([ids, ids[: total - len(ids)]])
    return padded[index * per : (index + 1) * per]


def global_batch(batch: Any, mesh: jax.sharding.Mesh,
                 axis_name: str = "data") -> Any:
    """Assemble per-process host batches into global batch-sharded arrays.

    Each process passes its LOCAL batch (global batch // process_count
    rows); the returned pytree holds global ``jax.Array``s addressable by
    the jitted step's ``in_shardings`` with no further transfer.
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )
