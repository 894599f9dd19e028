"""Connected-component labeling on device.

Replaces ``skimage.morphology.label`` / ``skimage.measure.label``
(reference ``watershed.py:43,93``, ``coord_image_transformer.py:641``) with a
fixed-point label-propagation + pointer-jumping scheme:

1. every foreground voxel starts with its own flat index,
2. each round takes the neighborhood minimum (hooking), then follows the
   stored index one hop (``labels = labels[labels]``, pointer jumping),
3. repeat until no change — O(log diameter) rounds for compact objects.

Labels after convergence are root flat-indices; ``relabel_sequential``
compacts them to 1..K with a static upper bound (XLA needs static shapes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .neighborhood import neighbor_offsets, shift

_BIG = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_components_raw(mask: jax.Array, connectivity: Optional[int] = None,
                         max_iters: int = 256) -> jax.Array:
    """Label connected components; returns root-index labels (>=1 arbitrary
    ids, 0 = background).  ``connectivity`` follows skimage: 1..ndim
    (default: full = ndim)."""
    ndim = mask.ndim
    conn = ndim if connectivity is None else int(connectivity)
    offsets = neighbor_offsets(ndim, conn)
    fg = mask != 0
    n = int(jnp.size(mask))
    init = jnp.where(
        fg,
        jnp.arange(1, n + 1, dtype=jnp.int32).reshape(mask.shape),
        jnp.int32(_BIG))

    if conn == ndim:
        # full connectivity: the neighborhood min is a box erosion — one
        # fused reduce_window instead of 3^ndim - 1 shifted copies
        window = (3,) * ndim
        strides = (1,) * ndim

        def hook(labels):
            er = jax.lax.reduce_window(labels, jnp.int32(_BIG), jax.lax.min,
                                       window, strides, "SAME")
            return jnp.where(fg, er, _BIG)
    else:
        def hook(labels):
            best = labels
            for off in offsets:
                best = jnp.minimum(best, shift(labels, off, _BIG))
            return jnp.where(fg, jnp.minimum(labels, best), _BIG)

    def jump(labels):
        flat = labels.reshape(-1)
        # labels hold 1-based flat indices of a candidate root
        idx = jnp.clip(flat - 1, 0, n - 1)
        parent = jnp.where(flat == _BIG, _BIG, flat.take(idx))
        return parent.reshape(labels.shape)

    def cond(carry):
        labels, changed, it = carry
        return changed & (it < max_iters)

    def body(carry):
        labels, _, it = carry
        # several cheap hook rounds per convergence check + pointer jump:
        # gathers and full-array compares cost more than the erosion itself
        new = hook(hook(hook(hook(labels))))
        new = jump(new)
        return new, jnp.any(new != labels), it + 4

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(fg, labels, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_labels",))
def relabel_sequential(labels: jax.Array, max_labels: int = 0) -> jax.Array:
    """Compact nonnegative ids to 1..K preserving id order
    (skimage.segmentation.relabel_sequential semantics for the label set).

    Ids must be <= labels.size (true for component root indices and
    watershed marker ids).  Implemented sort-free as a presence bitmap +
    cumsum rank — O(N) instead of an O(N log N) device sort.
    ``max_labels`` is kept for API compatibility (the bitmap replaces the
    pad budget).
    """
    flat = labels.reshape(-1)
    n = flat.shape[0]
    ids = jnp.clip(flat, 0, n)
    presence = jnp.zeros((n + 1,), jnp.int32).at[ids].set(1)
    presence = presence.at[0].set(0)
    ranks = jnp.cumsum(presence)
    new = jnp.where(flat == 0, 0, ranks[ids])
    return new.reshape(labels.shape).astype(jnp.int32)


def label_components(mask: jax.Array, connectivity: Optional[int] = None,
                     max_labels: int = 4096,
                     max_iters: int = 256) -> jax.Array:
    """skimage-style label(): sequential labels 1..K, 0 background."""
    raw = label_components_raw(mask, connectivity, max_iters)
    return relabel_sequential(raw, max_labels)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_components_values_raw(values: jax.Array,
                                connectivity: Optional[int] = None,
                                max_iters: int = 256) -> jax.Array:
    """Connected components of an integer image where two voxels join only
    when nonzero AND equal-valued (skimage.measure.label on a label image —
    reference ``coord_image_transformer.py:641`` relabels touching cells of
    different ids as distinct components)."""
    ndim = values.ndim
    conn = ndim if connectivity is None else int(connectivity)
    offsets = neighbor_offsets(ndim, conn)
    fg = values != 0
    n = int(jnp.size(values))
    init = jnp.where(
        fg,
        jnp.arange(1, n + 1, dtype=jnp.int32).reshape(values.shape),
        jnp.int32(_BIG))

    def hook(labels):
        best = labels
        for off in offsets:
            n_lab = shift(labels, off, _BIG)
            n_val = shift(values, off, 0)
            same = (n_val == values) & fg
            best = jnp.minimum(best, jnp.where(same, n_lab, _BIG))
        return jnp.where(fg, jnp.minimum(labels, best), _BIG)

    def jump(labels):
        flat = labels.reshape(-1)
        idx = jnp.clip(flat - 1, 0, n - 1)
        parent = jnp.where(flat == _BIG, _BIG, flat.take(idx))
        return parent.reshape(labels.shape)

    def cond(carry):
        labels, changed, it = carry
        return changed & (it < max_iters)

    def body(carry):
        labels, _, it = carry
        new = jump(jump(hook(labels)))
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(fg, labels, 0).astype(jnp.int32)


def label_components_values(values: jax.Array,
                            connectivity: Optional[int] = None,
                            max_labels: int = 4096,
                            max_iters: int = 256) -> jax.Array:
    raw = label_components_values_raw(values, connectivity, max_iters)
    return relabel_sequential(raw, max_labels)
