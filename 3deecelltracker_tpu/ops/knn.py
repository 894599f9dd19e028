"""Brute-force k-nearest-neighbor queries and FFN feature building.

Replaces ``sklearn.neighbors.NearestNeighbors`` kd-trees
(reference ``ffn.py:288-321``, ``track.py:137-173``).  Cell point sets are
10^2-10^3 points, so the all-pairs distance matrix is tiny — a single
matmul-shaped reduction plus ``lax.top_k`` beats any tree on TPU, and the
whole feature build is one fused vmapped gather instead of the reference's
per-point Python loop.

All functions take a validity mask so padded (fixed-shape) point sets jit
once for the whole recording (SURVEY §7 design stance).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """(n, m) squared euclidean distances."""
    d = a[:, None, :] - b[None, :, :]
    return jnp.sum(d * d, axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(points: jax.Array, mask: jax.Array, k: int
        ) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each point within the same (masked) set,
    including the point itself as neighbor 0.

    Returns (distances, indices) of shape (n, min(k, n)) sorted
    ascending — when the STATIC set size n is smaller than k the result
    has n columns, not k (callers pad, see ``knn_feature_vectors``).
    When fewer than k points are VALID, the remaining columns hold
    masked points (distance sqrt(1e10)) — filter with ``mask[idx]``.
    Rows for invalid query points contain garbage (mask downstream).
    """
    d2 = pairwise_sq_dists(points, points)
    d2 = jnp.where(mask[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, min(k, points.shape[0]))
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


@functools.partial(jax.jit, static_argnames=("k",))
def knn_feature_vectors_cross(base: jax.Array, query: jax.Array, k: int = 20
                              ) -> jax.Array:
    """Training-path feature build (``features_of_points_ffn_quick``
    ffn.py:57-88): (k+1)-NN of each QUERY point within ``base``; offsets of
    neighbors 1..k from the query point itself, divided by the mean (k+1)-NN
    distance; last feature = that mean distance."""
    kk = min(k + 1, base.shape[0])   # clamp for tiny point sets
    d2 = pairwise_sq_dists(query, base)
    neg, idx = jax.lax.top_k(-d2, kk)
    dists = jnp.sqrt(jnp.maximum(-neg, 0.0))
    mean_dist = jnp.mean(dists, axis=1)
    neighbors = base[idx[:, 1:]]                              # (nq, kk-1, 3)
    rel = (neighbors - query[:, None, :]) / mean_dist[:, None, None]
    rel_flat = rel.reshape(query.shape[0], 3 * (kk - 1))
    if kk - 1 < k:
        rel_flat = jnp.pad(rel_flat, ((0, 0), (0, 3 * (k - kk + 1))))
    return jnp.concatenate([rel_flat, mean_dist[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_feature_vectors(points: jax.Array, mask: jax.Array, k: int = 20
                        ) -> jax.Array:
    """61-dim FFN features per point (reference ``ffn.py:294-318``):
    the k nearest neighbors' offsets from the point, divided by the mean
    distance over the (k+1)-NN (self included, contributing 0), plus that
    mean distance.

    points: (n, 3) (normalized frame), mask: (n,).  Returns (n, 3k+1).
    Point sets with fewer than k+1 VALID points use all available valid
    neighbors; missing neighbor slots are zero and excluded from the mean
    distance.  (The reference errors outright below k+1 points — sklearn
    refuses n_neighbors > n_samples — so this graceful tail has no
    reference counterpart; the masked handling matters because padded
    fixed-shape sets would otherwise pick the 1e6-coordinate parked
    padding points as neighbors and corrupt EVERY point's features.)
    """
    kk = min(k + 1, points.shape[0])
    dists, idx = knn(points, mask, kk)
    nb_valid = mask[idx]                                     # (n, kk)
    dists = jnp.where(nb_valid, dists, 0.0)
    n_nb = jnp.maximum(jnp.sum(nb_valid, axis=1), 1)
    mean_dist = jnp.sum(dists, axis=1) / n_nb                # (n,)
    self_pt = points[idx[:, 0]]                              # == points row
    neighbors = points[idx[:, 1:]]                           # (n, kk-1, 3)
    rel = (neighbors - self_pt[:, None, :]) * nb_valid[:, 1:, None] \
        / jnp.maximum(mean_dist, 1e-12)[:, None, None]
    rel_flat = rel.reshape(points.shape[0], 3 * (kk - 1))
    if kk - 1 < k:
        rel_flat = jnp.pad(rel_flat, ((0, 0), (0, 3 * (k - kk + 1))))
    feats = jnp.concatenate([rel_flat, mean_dist[:, None]], axis=1)
    return jnp.where(mask[:, None], feats, 0.0)
