"""Exact Euclidean distance transform (EDT).

Replaces ``scipy.ndimage.distance_transform_edt``
(reference ``watershed.py:39,90,145``) with a TPU-friendly exact algorithm.

The squared EDT is separable: one pass per axis computes
``D'[i] = min_j (D[j] + w^2 (i-j)^2)``.  Instead of the sequential
lower-envelope scan (Felzenszwalb-Huttenlocher), each pass is evaluated as a
dense min-plus reduction over the whole line — O(L) work per output element,
but fully parallel, branch-free VPU math that XLA tiles well.  For microscopy
volumes (L ≤ ~512) this is far faster on TPU than any scan-based form.

Memory is bounded by chunking lines so the (chunk, L, L) broadcast stays
within a fixed budget.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e20
_CHUNK_ELEMS = 1 << 22  # ~16 MB of f32 broadcast per chunk


def _minplus_pass(fsq: jax.Array, axis: int, w: float) -> jax.Array:
    """One separable pass: fsq'[..., i] = min_j fsq[..., j] + (w(i-j))^2."""
    ndim = fsq.ndim
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    x = jnp.transpose(fsq, perm)
    batch_shape = x.shape[:-1]
    L = x.shape[-1]
    flat = x.reshape(-1, L)
    B = flat.shape[0]

    ii = np.arange(L, dtype=np.float32)
    cost = ((ii[:, None] - ii[None, :]) * np.float32(w)) ** 2  # (i, j)
    cost_j = jnp.asarray(cost)

    chunk = max(1, _CHUNK_ELEMS // max(1, L * L))
    n_chunks = -(-B // chunk)
    pad = n_chunks * chunk - B
    flat_p = jnp.pad(flat, ((0, pad), (0, 0)), constant_values=_INF)

    def one(chunk_rows):
        # (c, 1, j) + (i, j) -> min over j -> (c, i)
        return jnp.min(chunk_rows[:, None, :] + cost_j[None, :, :], axis=-1)

    out = jax.lax.map(one, flat_p.reshape(n_chunks, chunk, L))
    out = out.reshape(-1, L)[:B].reshape(batch_shape + (L,))
    return jnp.transpose(out, inv_perm)


@functools.partial(jax.jit, static_argnames=("sampling",))
def distance_transform_edt(mask: jax.Array,
                           sampling: Union[None, Tuple[float, ...]] = None
                           ) -> jax.Array:
    """Exact EDT: distance from each nonzero voxel to the nearest zero voxel.

    ``sampling`` gives the physical spacing per axis
    (scipy.ndimage.distance_transform_edt semantics).
    """
    if sampling is None:
        sampling = (1.0,) * mask.ndim
    sampling = tuple(float(s) for s in sampling)
    if len(sampling) != mask.ndim:
        raise ValueError("sampling must have one entry per axis")
    fsq = jnp.where(mask != 0, jnp.float32(_INF), jnp.float32(0.0))
    for axis, w in enumerate(sampling):
        fsq = _minplus_pass(fsq, axis, w)
    return jnp.sqrt(fsq)
