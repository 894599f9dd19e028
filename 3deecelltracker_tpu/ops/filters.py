"""Separable filters: box sums/means and gaussian blur.

Replaces ``scipy.ndimage.convolve`` with an all-ones kernel
(reference ``preprocess.py:108-112``) and
``scipy.ndimage.gaussian_filter`` / ``skimage.filters.gaussian``
(reference ``watershed.py:40,91``, ``coord_image_transformer.py:614``).

Design notes (TPU):
- Box filters are computed with cumulative sums per axis — O(N) independent
  of window size, pure VPU work that XLA fuses; no conv needed for the
  (27, 27, 1) LCN window.
- Gaussian blur is a separable 1-D convolution per axis, expressed as
  ``lax.conv_general_dilated`` over a flattened batch so XLA maps it onto
  well-tiled fused multiply-adds.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _pad_1d(x: jax.Array, axis: int, lo: int, hi: int, mode: str) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    if mode == "zero":
        return jnp.pad(x, pad)
    elif mode == "reflect":
        # scipy's 'reflect' == numpy's 'symmetric' (edge value repeated).
        return jnp.pad(x, pad, mode="symmetric")
    elif mode == "mirror":
        return jnp.pad(x, pad, mode="reflect")
    raise ValueError(f"unknown padding mode {mode!r}")


def box_sum(x: jax.Array, size: Sequence[int], mode: str = "zero") -> jax.Array:
    """Sliding-window sum with a centered ``size`` window per axis.

    Matches scipy.ndimage.convolve with an all-ones kernel (origin at window
    center; even sizes take the extra element on the right, like scipy).
    """
    out = x
    for axis, k in enumerate(size):
        k = int(k)
        if k <= 1:
            continue
        lo = (k - 1) // 2
        hi = k // 2
        padded = _pad_1d(out, axis, lo, hi, mode)
        csum = jnp.cumsum(padded.astype(jnp.float32), axis=axis)
        # window sum at i = csum[i + k - 1] - csum[i - 1]
        n = out.shape[axis]
        upper = lax.slice_in_dim(csum, k - 1, k - 1 + n, axis=axis)
        lower = lax.slice_in_dim(
            jnp.pad(csum, [(1, 0) if a == axis else (0, 0)
                           for a in range(csum.ndim)]),
            0, n, axis=axis)
        out = upper - lower
    return out


def box_mean(x: jax.Array, size: Sequence[int], mode: str = "zero") -> jax.Array:
    vol = float(np.prod([int(k) for k in size]))
    return box_sum(x, size, mode) / vol


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """The same discrete gaussian kernel scipy.ndimage uses."""
    radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv_1d_along_axis(x: jax.Array, kernel: np.ndarray, axis: int,
                        mode: str) -> jax.Array:
    """Correlate ``x`` with a symmetric 1-D ``kernel`` along ``axis``."""
    k = kernel.shape[0]
    radius = k // 2
    padded = _pad_1d(x, axis, radius, radius, mode)
    # Move target axis last, flatten the rest into batch for a 1-D conv.
    perm = [a for a in range(x.ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    moved = jnp.transpose(padded, perm)
    batch_shape = moved.shape[:-1]
    length = moved.shape[-1]
    flat = moved.reshape((-1, 1, length))  # NCW
    filt = jnp.asarray(kernel, x.dtype).reshape((1, 1, k))  # OIW
    out = lax.conv_general_dilated(
        flat.astype(jnp.float32), filt.astype(jnp.float32),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"))
    out = out.reshape(batch_shape + (out.shape[-1],))
    return jnp.transpose(out, inv_perm)


def gaussian_filter(x: jax.Array,
                    sigma: Union[float, Sequence[float]],
                    mode: str = "reflect",
                    truncate: float = 4.0) -> jax.Array:
    """Separable gaussian blur matching ``scipy.ndimage.gaussian_filter``.

    ``mode``: 'reflect' (scipy default), 'zero' (scipy 'constant'), or
    'mirror'.
    """
    if np.isscalar(sigma):
        sigmas: Tuple[float, ...] = (float(sigma),) * x.ndim
    else:
        sigmas = tuple(float(s) for s in sigma)
        if len(sigmas) != x.ndim:
            raise ValueError("sigma must be scalar or one per axis")
    out = x.astype(jnp.float32)
    for axis, s in enumerate(sigmas):
        if s <= 0:
            continue
        kern = gaussian_kernel_1d(s, truncate)
        if kern.shape[0] <= 1:
            continue
        out = _conv_1d_along_axis(out, kern, axis, mode)
    return out


@functools.partial(jax.jit, static_argnames=("size", "mode"))
def uniform_filter(x: jax.Array, size: Tuple[int, ...],
                   mode: str = "reflect") -> jax.Array:
    """Mean filter (scipy.ndimage.uniform_filter semantics)."""
    return box_mean(x, size, mode)
