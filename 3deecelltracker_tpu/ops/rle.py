"""Run-length encoding of label volumes for the device->host link.

The tracked label volume (the per-volume ``track_results`` TIFF artifact,
reference coord_image_transformer.py:561-583) is >95% background at worm
scale, yet it dominates the pipeline's device->host bytes (~1.6 MB/vol of
a ~2.4 MB/vol total at (32,224,224) uint8).  Through a remote-link TPU
(~20-40 MB/s measured, BASELINE.md) that is ~50-80 ms/vol of pure
transfer — comparable to the entire device compute.  Encoding the flat
volume as (run start, run value) pairs ON DEVICE before the fetch cuts
the label bytes ~10-25x; the host decode is a single ``np.repeat``.

Design constraints (all static-shape, jit-once):

- The run budget ``max_runs`` is static; ``n_runs`` rides down with the
  payload so the caller can detect overflow and fall back to fetching the
  dense array (the dense device buffer is still alive — it is the encode's
  input), so correctness never depends on the budget.
- ``jnp.nonzero(size=...)`` provides the padded compaction (one cumsum +
  scatter); at 1.6M elements this is ~10-20 ms of device time
  (CLAUDE.md scatter note) — far cheaper than the ~50-80 ms of link time
  it removes, and it overlaps the link anyway (the pipeline's device
  stream runs ahead of the saver threads).
- Encoded payload is ``starts`` int32 (4 B) + ``vals`` label dtype
  (1-2 B): 5-6 B/run vs 1 B/voxel dense.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rle_encode", "rle_decode", "runs_budget", "worth_encoding"]


@functools.partial(jax.jit, static_argnames=("max_runs",))
def rle_encode(flat: jax.Array, max_runs: int
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Encode a flat 1-D array as up to ``max_runs`` (start, value) runs.

    Returns ``(starts, vals, n_runs)``: ``starts`` (max_runs,) int32 run
    start indices (padded with ``flat.size`` past ``n_runs``), ``vals``
    (max_runs,) the run values, ``n_runs`` () int32 the TRUE number of
    runs in the input.  When ``n_runs > max_runs`` the encoding is
    truncated and the caller must fall back to the dense array.
    """
    n = flat.shape[0]
    if n == 0:      # static shape: an empty array is zero runs
        return (jnp.zeros((max_runs,), jnp.int32),
                jnp.zeros((max_runs,), flat.dtype),
                jnp.zeros((), jnp.int32))
    change = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    n_runs = jnp.sum(change, dtype=jnp.int32)
    starts = jnp.nonzero(change, size=max_runs, fill_value=n)[0]
    starts = starts.astype(jnp.int32)
    vals = flat[jnp.clip(starts, 0, n - 1)]
    return starts, vals, n_runs


def rle_decode(starts: np.ndarray, vals: np.ndarray, n_runs: int,
               n: int) -> np.ndarray:
    """Host-side exact inverse of :func:`rle_encode` (requires
    ``n_runs <= starts.size``).  ~sub-ms at 16M voxels: one diff + one
    ``np.repeat``."""
    k = int(n_runs)
    if k > starts.size:
        raise ValueError(
            f"encoding truncated: {k} runs > budget {starts.size}; "
            "fetch the dense array instead")
    s = np.asarray(starts[:k], np.int64)
    lengths = np.diff(np.append(s, n))
    return np.repeat(np.asarray(vals[:k]), lengths)


def runs_budget(n_voxels: int, max_cells: int) -> int:
    """Static run budget for a tracked label volume.

    Sized from the cell budget: each rendered cell contributes roughly
    (rows it spans) x 2 runs; 128 runs/cell is ~3x the measured worm
    density (~90 runs/cell at (32,224,224)/150 cells) and the overflow
    fallback keeps any underestimate a perf wrinkle, not a bug.  Clamped
    to n/16 so the encoding never budgets more than ~1/3 of the dense
    bytes."""
    r = max(8192, int(max_cells) * 128)
    return int(min(r, max(1, n_voxels // 16)))


def worth_encoding(n_voxels: int, max_runs: int, itemsize: int) -> bool:
    """True when the encoding meaningfully shrinks the payload AND the
    dense array is big enough (>=256 KB) that the saved transfer time
    clearly beats the extra encode dispatch — tiny test volumes fetch
    dense directly."""
    dense = n_voxels * itemsize
    return dense >= 262144 and max_runs * (4 + itemsize) * 2 <= dense
