"""Local maxima detection (skimage ``peak_local_max`` semantics).

Replaces the Cython ``peak_local_max`` used for watershed markers
(reference ``watershed.py:42,92``): a voxel is a peak when it equals the
maximum over a (2*min_distance+1)^ndim window and exceeds the image minimum.
``exclude_border`` zeroes peaks within ``min_distance`` of the array edge
(the default in ``watershed_2d``; ``watershed_3d`` passes 0 — reference
watershed.py:85-92 notes why).

Implemented as one ``reduce_window`` max + compare — a single fused pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("min_distance", "exclude_border"))
def peak_local_max_mask(image: jax.Array, min_distance: int = 1,
                        exclude_border: Optional[int] = None,
                        threshold_abs: Optional[float] = None) -> jax.Array:
    """Boolean mask of local maxima (skimage ``indices=False`` behavior;
    plateau points are all marked, callers label them into single markers)."""
    if exclude_border is None:
        exclude_border = min_distance
    k = 2 * int(min_distance) + 1
    window = (k,) * image.ndim
    img = image.astype(jnp.float32)
    maxf = lax.reduce_window(img, -jnp.inf, lax.max, window,
                             (1,) * image.ndim, "SAME")
    if threshold_abs is None:
        thresh = jnp.min(img)
    else:
        thresh = jnp.float32(threshold_abs)
    mask = (img == maxf) & (img > thresh)
    if exclude_border:
        b = int(exclude_border)
        interior = jnp.zeros(image.shape, bool)
        idx = tuple(slice(b, s - b) for s in image.shape)
        interior = interior.at[idx].set(True)
        mask = mask & interior
    return mask
