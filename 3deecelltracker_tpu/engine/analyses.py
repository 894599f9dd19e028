"""Activity extraction from tracked labels (reference ``analyses.py``).

Two readouts exist in the reference and both are preserved:
- ``get_activities`` / ``get_activities_quick`` (analyses.py:15-99): mean of
  each cell's intensities EXCLUDING the bottom ``discard_ratio`` fraction by
  count (top 90% of voxels),
- ``TrackerLite.activities`` (trackerlite.py:152-201): mean of intensities
  strictly ABOVE the (1-discard_ratio) percentile (top ~10%); see
  ``ops.segment_reduce.topq_mean_intensity``.

Both run as one device pass per volume via sorted segment reductions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.imageio import read_image_ts


@functools.partial(jax.jit, static_argnames=("max_labels", "discard_ratio"))
def mean_excluding_bottom(raw: jax.Array, labels: jax.Array,
                          max_labels: int,
                          discard_ratio: float = 0.1) -> jax.Array:
    """Per-label mean of the top (1-discard_ratio) fraction BY COUNT
    (analyses.py:48-52: ``sorted[floor(n*ratio):]``).  NaN for absent
    labels."""
    flat_raw = raw.astype(jnp.float32).reshape(-1)
    flat_lab = jnp.clip(labels.reshape(-1), 0, max_labels)
    counts = jnp.bincount(flat_lab, length=max_labels + 1)
    order = jnp.lexsort((flat_raw, flat_lab))
    sorted_lab = flat_lab[order]
    sorted_raw = flat_raw[order]
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(flat_raw.shape[0]) - starts[sorted_lab]
    thresh = jnp.floor(counts[sorted_lab].astype(jnp.float32)
                       * discard_ratio)
    keep = (rank.astype(jnp.float32) >= thresh) & (sorted_lab > 0)
    sums = jnp.zeros((max_labels + 1,), jnp.float32).at[sorted_lab].add(
        jnp.where(keep, sorted_raw, 0.0))
    nkeep = jnp.zeros((max_labels + 1,), jnp.float32).at[sorted_lab].add(
        keep.astype(jnp.float32))
    return (sums / nkeep)[1:]


def get_activities(raw_path: str, tracked_labels_path: str,
                   volume_num: int, layer_num: int,
                   discard_ratio: float = 0.1) -> np.ndarray:
    """Reference ``analyses.get_activities`` / ``get_activities_quick``
    (:15-99): per-(t,z) TIFF pattern pairs -> (volume, cell) activity
    matrix."""
    labels0 = read_image_ts(1, tracked_labels_path, (1, layer_num + 1))
    cell_num = int(labels0.max())
    activities = np.zeros((volume_num, cell_num))
    for frame in range(1, volume_num + 1):
        raw = read_image_ts(frame, raw_path, (1, layer_num + 1))
        labels = labels0 if frame == 1 else read_image_ts(
            frame, tracked_labels_path, (1, layer_num + 1))
        act = np.asarray(mean_excluding_bottom(
            jnp.asarray(raw.astype(np.float32)),
            jnp.asarray(labels.astype(np.int32)), cell_num,
            discard_ratio=discard_ratio))
        # a label absent from this frame reads 0.0, as in the reference's
        # quick variant (analyses.py:90-92 skips None bboxes, leaving the
        # preallocated zeros) — the raw op returns NaN there
        activities[frame - 1] = np.nan_to_num(act, nan=0.0)
    return activities


# bbox-accelerated variant is the same device pass (the reduction already
# touches each voxel once); kept as an alias for API parity.
get_activities_quick = get_activities
