"""Point-set normalization (reference ``ffn.py:330-374``).

Centers points at their mean and scales by 3x the standard deviation of the
projection on the first principal component.  Replaces sklearn PCA with a
closed-form 3x3 covariance eigendecomposition — exact and device-resident.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def normalize_points(points: jax.Array, mask: jax.Array = None
                     ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Returns (normalized_points, (mean, scale)) with
    scale = 3 * std(first-PC projection), matching sklearn's
    PCA(n_components=1).transform followed by np.std (biased, ddof=0).
    """
    if mask is None:
        mask = jnp.ones(points.shape[0], bool)
    w = mask.astype(jnp.float32)
    n = jnp.sum(w)
    mean = jnp.sum(points * w[:, None], axis=0) / n
    centered = (points - mean) * w[:, None]
    cov = (centered.T @ centered) / n       # biased covariance == np.std^2
    eigvals = jnp.linalg.eigvalsh(cov)      # ascending
    std = jnp.sqrt(jnp.maximum(eigvals[-1], 0.0))
    scale = 3.0 * std
    return (points - mean) / scale, (mean, scale)


def apply_normalization(points: jax.Array, mean: jax.Array,
                        scale: jax.Array) -> jax.Array:
    return (points - mean) / scale


def invert_normalization(points: jax.Array, mean: jax.Array,
                         scale: jax.Array) -> jax.Array:
    return points * scale + mean
