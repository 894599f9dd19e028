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
from typing import Optional, Sequence, Tuple, Union

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


def _minplus_pass_windowed(fsq: jax.Array, axis: int, w: float,
                           W: int) -> jax.Array:
    """Windowed pass: fsq'[..., i] = min_{|d| <= W} fsq[..., i+d] + (w d)^2.

    O(L*W) shifted adds instead of the dense O(L^2) broadcast — the
    zebrafish-scale form (xy >= 1024 lines): a scan over the 2W+1 offsets
    keeps peak memory at 2 line-buffers and every step is a full-width VPU
    min, so XLA pipelines it without the (chunk, L, L) cost matrix."""
    ndim = fsq.ndim
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    x = jnp.transpose(fsq, perm)
    batch_shape = x.shape[:-1]
    L = x.shape[-1]
    W = min(int(W), L - 1)
    flat = x.reshape(-1, L)
    xp = jnp.pad(flat, ((0, 0), (W, W)), constant_values=_INF)
    costs = jnp.asarray((np.arange(-W, W + 1, dtype=np.float32)
                         * np.float32(w)) ** 2)

    def step(best, k):
        shifted = jax.lax.dynamic_slice_in_dim(xp, k, L, axis=1)
        return jnp.minimum(best, shifted + costs[k]), None

    init = flat + costs[W]                      # d = 0 term
    out, _ = jax.lax.scan(step, init, jnp.arange(2 * W + 1))
    out = out.reshape(batch_shape + (L,))
    return jnp.transpose(out, inv_perm)


@functools.partial(jax.jit, static_argnames=("sampling", "window"))
def distance_transform_edt(mask: jax.Array,
                           sampling: Union[None, Tuple[float, ...]] = None,
                           window: Optional[int] = None
                           ) -> jax.Array:
    """Exact EDT: distance from each nonzero voxel to the nearest zero voxel.

    ``sampling`` gives the physical spacing per axis
    (scipy.ndimage.distance_transform_edt semantics).

    ``window``: optional per-axis search radius in VOXELS.  With a window,
    each separable pass only inspects j within ``window`` of i — O(L*W)
    work instead of O(L^2), the preferred form for zebrafish-scale lines
    (xy >= 1024).  The result equals the exact EDT wherever the true
    distance is below ``window * min(sampling)`` (e.g. inside cells whose
    radius is bounded — the ``edt_prob`` training-GT case); beyond that
    distances saturate.  ``None`` keeps the exact dense pass.
    """
    if sampling is None:
        sampling = (1.0,) * mask.ndim
    sampling = tuple(float(s) for s in sampling)
    if len(sampling) != mask.ndim:
        raise ValueError("sampling must have one entry per axis")
    fsq = jnp.where(mask != 0, jnp.float32(_INF), jnp.float32(0.0))
    for axis, w in enumerate(sampling):
        if window is not None:
            fsq = _minplus_pass_windowed(fsq, axis, w, window)
        else:
            fsq = _minplus_pass(fsq, axis, w)
    return jnp.sqrt(fsq)
