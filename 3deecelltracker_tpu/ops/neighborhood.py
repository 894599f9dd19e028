"""Shift-based neighborhood reductions shared by watershed / connected
components / boundary detection.

All operators work by padding + slicing one shifted copy per neighbor offset
and reducing — static shapes, no gathers, so XLA fuses the whole
neighborhood reduction into a few VPU passes.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def neighbor_offsets(ndim: int, connectivity: int) -> List[Tuple[int, ...]]:
    """Neighbor offsets for scipy/skimage-style connectivity:
    offsets with 1 <= sum(|d|) <= connectivity, |d_i| <= 1."""
    offs = []
    for d in itertools.product((-1, 0, 1), repeat=ndim):
        s = sum(abs(v) for v in d)
        if 1 <= s <= connectivity:
            offs.append(d)
    return offs


def shift(x: jax.Array, offset: Sequence[int], fill) -> jax.Array:
    """Shifted copy: y[v] = x[v + offset], ``fill`` outside the array."""
    out = x
    for axis, d in enumerate(offset):
        if d == 0:
            continue
        pad = [(0, 0)] * x.ndim
        if d > 0:
            pad[axis] = (0, d)
            out = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(out, d, d + x.shape[axis], axis=axis)
        else:
            pad[axis] = (-d, 0)
            out = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(out, 0, x.shape[axis], axis=axis)
    return out


def neighbor_reduce(x: jax.Array, offsets, fill,
                    reduce_fn: Callable[[jax.Array, jax.Array], jax.Array],
                    include_self: bool = False) -> jax.Array:
    """Reduce over shifted copies: out[v] = reduce over d of x[v + d]."""
    acc = x if include_self else None
    for off in offsets:
        shifted = shift(x, off, fill)
        acc = shifted if acc is None else reduce_fn(acc, shifted)
    return acc


def neighbor_max(x, connectivity=None, offsets=None, fill=-jnp.inf,
                 include_self=False):
    if offsets is None:
        offsets = neighbor_offsets(x.ndim, connectivity)
    return neighbor_reduce(x, offsets, fill, jnp.maximum, include_self)


def neighbor_min(x, connectivity=None, offsets=None, fill=jnp.inf,
                 include_self=False):
    if offsets is None:
        offsets = neighbor_offsets(x.ndim, connectivity)
    return neighbor_reduce(x, offsets, fill, jnp.minimum, include_self)
