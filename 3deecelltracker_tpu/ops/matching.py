"""Match-matrix post-processing: greedy argmax peeling and normalizations.

Replaces the reference's Python peel loops — ``simple_match``
(``trackerlite.py:242-259``), the legacy 0.5-threshold peel inside
``pr_gls_quick`` (``track.py:58-70``), and ``non_max_suppression_normalize``
(``trackerlite.py:393-406``) — with jittable ``lax.while_loop`` peels over
the score matrix.  Padded rows/columns score 0 and can never be matched.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _peel_loop(match_matrix: jax.Array, threshold: float
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy peel: repeatedly take the global max >= threshold, zero its
    row/col.  Returns (pair mask (m, n) bool, n_pairs, consumed matrix).

    TPU implementation: mutual-max rounds instead of one-at-a-time argmax.
    Each round accepts every entry that is simultaneously the max of its
    row AND of its column among remaining entries, then zeroes those
    rows/cols.  For distinct scores this yields exactly the sequential
    greedy matching (the global max is always mutual-max; any mutual-max
    entry cannot be blocked by a larger conflicting entry), in O(log n)
    vectorized rounds instead of O(n) sequential argmax peels.
    """
    m, n = match_matrix.shape
    mat0 = match_matrix.astype(jnp.float32)

    def cond(carry):
        mat, pairs, count = carry
        mx = jnp.max(mat)
        # acceptance below additionally requires mat > 0, so a
        # threshold <= 0 with an all-non-positive remainder must also
        # stop — otherwise the device-side loop never terminates
        return (mx >= threshold) & (mx > 0)

    def body(carry):
        mat, pairs, count = carry
        row_max = jnp.max(mat, axis=1, keepdims=True)
        col_max = jnp.max(mat, axis=0, keepdims=True)
        mutual = (mat >= threshold) & (mat == row_max) & (mat == col_max) \
            & (mat > 0)
        # guard pathological ties: keep only the first mutual entry per
        # row and per column (argmax-consistent tie-break)
        first_in_row = jnp.cumsum(mutual, axis=1) == 1
        mutual = mutual & first_in_row
        first_in_col = jnp.cumsum(mutual, axis=0) == 1
        mutual = mutual & first_in_col
        pairs = pairs | mutual
        used_row = jnp.any(mutual, axis=1, keepdims=True)
        used_col = jnp.any(mutual, axis=0, keepdims=True)
        mat = jnp.where(used_row | used_col, 0.0, mat)
        return mat, pairs, count + jnp.sum(mutual.astype(jnp.int32))

    pairs0 = jnp.zeros((m, n), bool)
    mat, pairs, count = jax.lax.while_loop(
        cond, body, (mat0, pairs0, jnp.int32(0)))
    return pairs, count, mat


@functools.partial(jax.jit, static_argnames=("threshold",))
def simple_match(initial_match_matrix: jax.Array, threshold: float = 0.1,
                 ref_mask=None, tgt_mask=None
                 ) -> Tuple[jax.Array, jax.Array]:
    """``trackerlite.simple_match``: every entry gets prior 0.1/(n-1);
    matched (tgt, ref) pairs get 0.9.

    With padded point sets, pass ``ref_mask``/``tgt_mask``: the prior base
    uses the VALID ref count (the reference's n is the true segmented
    count), and padded pairs get zero prior.

    Note the reference peels while ``max >= threshold``; replicated.

    Returns (normalized_prob (m, n), pair mask (m, n) bool).
    """
    m, n = initial_match_matrix.shape
    if ref_mask is None:
        ref_mask = jnp.ones((n,), bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((m,), bool)
    mat = jnp.where(tgt_mask[:, None] & ref_mask[None, :],
                    initial_match_matrix, 0.0)
    pairs, _, _ = _peel_loop(mat, threshold)
    n_valid = jnp.sum(ref_mask.astype(jnp.float32))
    base = 0.1 / (n_valid - 1.0)
    prob = jnp.where(tgt_mask[:, None] & ref_mask[None, :], base, 0.0)
    return jnp.where(pairs, 0.9, prob).astype(jnp.float32), pairs


@functools.partial(jax.jit, static_argnames=("threshold",))
def legacy_init_match(corr: jax.Array, threshold: float = 0.5,
                      ref_mask=None, tgt_mask=None) -> jax.Array:
    """The peel embedded in ``pr_gls_quick`` (track.py:58-70): unmatched
    rows stay uniform 1/n; matched rows become 0.1/(n-1) except 0.9 at the
    matched column.

    With padded point sets, pass ``ref_mask``/``tgt_mask``: n is the VALID
    ref count, padded pairs get zero prior and can never be matched."""
    m, n_static = corr.shape
    if ref_mask is None:
        ref_mask = jnp.ones((n_static,), bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((m,), bool)
    valid = tgt_mask[:, None] & ref_mask[None, :]
    pairs, _, _ = _peel_loop(jnp.where(valid, corr, 0.0), threshold)
    n = jnp.sum(ref_mask.astype(jnp.float32))
    matched_row = jnp.any(pairs, axis=1, keepdims=True)
    base = jnp.where(matched_row, 0.1 / (n - 1.0), 1.0 / n)
    out = jnp.where(pairs, 0.9, jnp.broadcast_to(base, corr.shape))
    return jnp.where(valid, out, 0.0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("threshold",))
def non_max_suppression_normalize(similarity: jax.Array,
                                  threshold: float = 0.5) -> jax.Array:
    """``trackerlite.non_max_suppression_normalize`` (:393-406)."""
    pairs, _, _ = _peel_loop(similarity, threshold)
    n = similarity.shape[1]
    matched_row = jnp.any(pairs, axis=1, keepdims=True)
    base = jnp.where(matched_row, 0.1 / (n - 1), 1.0 / n)
    return jnp.where(pairs, 0.9, jnp.broadcast_to(base, similarity.shape)
                     ).astype(jnp.float32)


@jax.jit
def softmax_normalize(similarity: jax.Array) -> jax.Array:
    """``trackerlite.softmax_normalize`` (:385-386)."""
    return jax.nn.softmax(similarity, axis=1)


@jax.jit
def row_wise_normalize(similarity: jax.Array) -> jax.Array:
    """``trackerlite.row_wise_normalize`` (:389-390)."""
    return similarity / jnp.sum(similarity, axis=1, keepdims=True)
