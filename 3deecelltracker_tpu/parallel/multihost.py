"""Multi-host (pod-slice) scaffolding.

The reference has no distributed story (SURVEY §2.3); this module defines
the TPU one:

- compute collectives ride ICI within the pod slice (the mesh built by
  ``make_mesh`` spans all devices across hosts once ``initialize`` has
  run),
- host-side data loading rides DCN: each host loads ITS shard of the
  volume/time range (codecs never cross hosts), then device arrays are
  formed with ``jax.make_array_from_process_local_data``.

Single-process environments degrade gracefully (everything becomes a
no-op / identity split), so the same driver code runs from a laptop to a
multi-host slice.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-process; no-op when
    single-process (or already initialized)."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_shard(items: Sequence, pid: Optional[int] = None,
                n: Optional[int] = None) -> List:
    """This host's contiguous shard of a work list (volumes, time points).

    Used to split the segmentation pass across hosts: each host runs
    ``predict_and_save`` over its own time range — the seg/ artifact tree
    is the synchronization point (same checkpoint/resume contract as the
    single-host pipeline)."""
    pid = jax.process_index() if pid is None else pid
    n = jax.process_count() if n is None else n
    items = list(items)
    per = -(-len(items) // n)
    return items[pid * per:(pid + 1) * per]


def global_batch_from_local(mesh, local_batch: np.ndarray, pspec):
    """Assemble a globally-sharded array from per-host local data
    (training input pipeline over DCN)."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_batch)
