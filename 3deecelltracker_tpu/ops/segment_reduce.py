"""Per-label reductions: center of mass, bounding boxes, counts.

Replaces ``scipy.ndimage.center_of_mass`` / ``find_objects`` / ``bincount``
per-label loops (reference ``coord_image_transformer.py:259,478,606``,
``tracker.py:646``, ``analyses.py:90``) with scatter-based segment
reductions — one pass over the volume regardless of label count.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _coord_grids(shape) -> Tuple[jax.Array, ...]:
    return tuple(
        jax.lax.broadcasted_iota(jnp.float32, shape, d)
        for d in range(len(shape)))


@functools.partial(jax.jit, static_argnames=("max_labels",))
def center_of_mass(weights: jax.Array, labels: jax.Array,
                   max_labels: int) -> jax.Array:
    """Weighted centroid per label 1..max_labels.

    Equivalent to ``scipy.ndimage.center_of_mass(weights, labels,
    range(1, max_labels+1))``: rows for labels absent from ``labels`` (or
    with zero total weight) are NaN, matching scipy's 0/0.

    TPU note: implemented as a chunked one-hot matmul (the per-label sums
    become (L+1, chunk) @ (chunk, ndim+1) MXU contractions) — an order of
    magnitude faster than scatter-add segment sums for the tracker's
    per-iteration volumes.

    Returns (max_labels, ndim) float32.
    """
    ndim = labels.ndim
    w = weights.astype(jnp.float32).reshape(-1)
    lab = jnp.clip(labels.reshape(-1), 0, max_labels)
    coords = _coord_grids(labels.shape)
    feats = jnp.stack([w] + [w * c.reshape(-1) for c in coords], axis=1)

    chunk = 1 << 16
    v = w.shape[0]
    n_chunks = -(-v // chunk)
    pad = n_chunks * chunk - v
    lab_p = jnp.pad(lab, (0, pad))                  # padded rows -> label 0
    feats_p = jnp.pad(feats, ((0, pad), (0, 0)))
    ids = jnp.arange(max_labels + 1, dtype=lab.dtype)

    def body(acc, args):
        lab_c, feats_c = args
        onehot = (lab_c[None, :] == ids[:, None]).astype(jnp.float32)
        acc = acc + jax.lax.dot(onehot, feats_c,
                                precision=jax.lax.Precision.HIGHEST)
        return acc, None

    acc0 = jnp.zeros((max_labels + 1, ndim + 1), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0, (lab_p.reshape(n_chunks, chunk),
                     feats_p.reshape(n_chunks, chunk, ndim + 1)))
    total = acc[:, 0:1]
    com = acc[:, 1:] / total
    return com[1:]


@functools.partial(jax.jit, static_argnames=("max_labels",))
def label_counts(labels: jax.Array, max_labels: int) -> jax.Array:
    """Voxel count per label 0..max_labels (bincount with static length)."""
    return jnp.bincount(labels.reshape(-1), length=max_labels + 1)


@functools.partial(jax.jit, static_argnames=("max_labels",))
def find_objects_bounds(labels: jax.Array, max_labels: int
                        ) -> Tuple[jax.Array, jax.Array]:
    """Per-label bounding boxes (scipy.ndimage.find_objects equivalent).

    Returns (mins, maxs): two (max_labels, ndim) int32 arrays with inclusive
    bounds; labels absent get mins > maxs (mins = shape, maxs = -1).
    """
    ndim = labels.ndim
    lab = labels.reshape(-1)
    seg = jnp.clip(lab, 0, max_labels)
    shape = labels.shape
    mins = []
    maxs = []
    for d in range(ndim):
        c = jax.lax.broadcasted_iota(jnp.int32, shape, d).reshape(-1)
        big = jnp.int32(shape[d])
        mn = jnp.full((max_labels + 1,), big, jnp.int32).at[seg].min(
            jnp.where(lab > 0, c, big))
        mx = jnp.full((max_labels + 1,), -1, jnp.int32).at[seg].max(
            jnp.where(lab > 0, c, -1))
        mins.append(mn)
        maxs.append(mx)
    mins_a = jnp.stack(mins, axis=1)[1:]
    maxs_a = jnp.stack(maxs, axis=1)[1:]
    return mins_a, maxs_a


@functools.partial(jax.jit, static_argnames=("max_labels", "discard_ratio"))
def topq_mean_intensity(raw: jax.Array, labels: jax.Array, max_labels: int,
                        discard_ratio: float = 0.1) -> jax.Array:
    """Per-label mean of intensities above the per-label
    ``(1-discard_ratio)`` quantile — the reference's activity readout
    (``trackerlite.py:188-197``: mean of voxels above the 90th percentile).

    Implemented with a per-label histogram-free approach: intensities are
    ranked globally by sorting (value, label) pairs so each label's top-q
    subset is found without per-label Python loops.

    Returns (max_labels,) float32; labels with no voxels give NaN.
    """
    flat_raw = raw.astype(jnp.float32).reshape(-1)
    flat_lab = jnp.clip(labels.reshape(-1), 0, max_labels)

    counts = jnp.bincount(flat_lab, length=max_labels + 1)
    # sort voxels by (label, intensity) so each label's voxels are a
    # contiguous run, ascending intensity within the run
    order = jnp.lexsort((flat_raw, flat_lab))
    sorted_lab = flat_lab[order]
    sorted_raw = flat_raw[order]
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])[:-1]
    # The reference keeps values STRICTLY ABOVE the linear-interpolation
    # percentile (np.percentile(v, 90); trackerlite.py:195-197) — compute
    # that threshold VALUE per label from its sorted run and compare.
    # (An earlier rank-based cutoff ceil(count*q) dropped one voxel for
    # many counts and kept NOTHING for e.g. 5-voxel cells -> NaN.)
    q = 1.0 - discard_ratio
    r = (counts.astype(jnp.float32) - 1.0) * q        # (max_labels + 1,)
    lo = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, None)
    hi = jnp.clip(jnp.ceil(r).astype(jnp.int32), 0, None)
    frac = r - lo.astype(jnp.float32)
    last = flat_raw.shape[0] - 1
    v_lo = sorted_raw[jnp.clip(starts + lo, 0, last)]
    v_hi = sorted_raw[jnp.clip(starts + hi, 0, last)]
    pthr = v_lo * (1.0 - frac) + v_hi * frac          # per-label percentile
    keep = (sorted_raw > pthr[sorted_lab]) & (sorted_lab > 0)
    sums = jnp.zeros((max_labels + 1,), jnp.float32).at[sorted_lab].add(
        jnp.where(keep, sorted_raw, 0.0))
    nkeep = jnp.zeros((max_labels + 1,), jnp.float32).at[sorted_lab].add(
        keep.astype(jnp.float32))
    return (sums / nkeep)[1:]
