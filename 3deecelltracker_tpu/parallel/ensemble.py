"""Device-parallel ensemble tracking fan-out.

The reference's ensemble mode predicts t2 from up to 20 reference volumes
in a serial Python loop (``trackerlite.py:111-125``, ``tracker.py:1502-1507``)
and trim-means the results.  Here the members are one vmapped batch —
PR-GLS EM for all members advances in lockstep on device — optionally
sharded over the mesh's data axis so members run on different chips and the
trimmed mean happens after an XLA all-gather (SURVEY §2.3 mapping).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.tracker import track_step
from ..ops.trim import trim_mean


def _member_predictions(ffn_params, ffn_state,
                        confirmed_stack: jax.Array,     # (E, L, 3)
                        seg_t1_stack: jax.Array,        # (E, M, 3)
                        seg_t1_masks: jax.Array,        # (E, M)
                        seg_t2: jax.Array,              # (M, 3)
                        seg_t2_mask: jax.Array,         # (M,)
                        beta: float = 3.0, lambda_: float = 3.0,
                        k_points: int = 20, max_iteration: int = 2000,
                        m_step_refine: int = 0) -> jax.Array:
    """Per-member tracked predictions (E, L, 3), vmapped fan-out."""
    def member(confirmed, seg1, mask1):
        return track_step(ffn_params, ffn_state, confirmed, seg1, mask1,
                          seg_t2, seg_t2_mask, beta=beta, lambda_=lambda_,
                          k_points=k_points, max_iteration=max_iteration,
                          m_step_refine=m_step_refine)

    return jax.vmap(member)(confirmed_stack, seg_t1_stack, seg_t1_masks)


# the padded-members form: callers pad E to a CONSTANT (pad_members) so
# the program compiles once, then trim-mean over the REAL members only —
# the combined-step jit below recompiles for every distinct member count
# (the reference's ensemble ramps 1..sampling_number over the first
# volumes; at 10-30 s per remote compile that is minutes of stall, the
# same measured pathology legacy_fit_members documents)
ensemble_member_predictions = functools.partial(
    jax.jit, static_argnames=("k_points", "max_iteration",
                              "m_step_refine"))(_member_predictions)


@functools.partial(jax.jit, static_argnames=("k_points", "max_iteration",
                                             "trim_proportion",
                                             "m_step_refine"))
def ensemble_track_step(ffn_params, ffn_state,
                        confirmed_stack: jax.Array,     # (E, L, 3)
                        seg_t1_stack: jax.Array,        # (E, M, 3)
                        seg_t1_masks: jax.Array,        # (E, M)
                        seg_t2: jax.Array,              # (M, 3)
                        seg_t2_mask: jax.Array,         # (M,)
                        beta: float = 3.0, lambda_: float = 3.0,
                        k_points: int = 20, max_iteration: int = 2000,
                        trim_proportion: float = 0.1,
                        m_step_refine: int = 0) -> jax.Array:
    """All ensemble members at once; returns trim-mean combined (L, 3)."""
    preds = _member_predictions(
        ffn_params, ffn_state, confirmed_stack, seg_t1_stack, seg_t1_masks,
        seg_t2, seg_t2_mask, beta=beta, lambda_=lambda_, k_points=k_points,
        max_iteration=max_iteration, m_step_refine=m_step_refine)
    return trim_mean(preds, trim_proportion, axis=0)


def make_sharded_ensemble_step(mesh: Mesh, data_axis: str = "data",
                               **static_kwargs):
    """Jit the ensemble fan-out with the member axis sharded over the mesh
    data axis; the trimmed-mean reduction runs after the all-gather XLA
    inserts.  Member count must already be a multiple of the axis size —
    and NOTE the trim runs over ALL rows, so repeated padding members
    bias the combine (they get double weight and can survive a trim that
    should cut them).  With padded members use
    :func:`make_sharded_ensemble_members` and trim over the real rows
    (what ``engine.pipeline.track_timelapse`` does)."""
    member_sharded = NamedSharding(mesh, P(data_axis))
    replicated = NamedSharding(mesh, P())

    fn = functools.partial(ensemble_track_step, **static_kwargs)
    return jax.jit(
        fn,
        in_shardings=(replicated, replicated, member_sharded,
                      member_sharded, member_sharded, replicated,
                      replicated),
        out_shardings=replicated)


def make_sharded_ensemble_members(mesh: Mesh, data_axis: str = "data",
                                  **static_kwargs):
    """Like :func:`make_sharded_ensemble_step` but returns the raw
    (E, L, 3) member predictions (replicated) instead of the trimmed
    mean — so a caller that padded E up to a mesh-axis multiple (see
    :func:`pad_members`) can drop the padding rows and apply the EXACT
    trimmed mean over the real members (a trim over repeated padding
    members would bias the combine).  This is the form
    ``engine.pipeline.track_timelapse(mesh=...)`` uses."""
    member_sharded = NamedSharding(mesh, P(data_axis))
    replicated = NamedSharding(mesh, P())

    fn = functools.partial(_member_predictions, **static_kwargs)
    return jax.jit(
        fn,
        in_shardings=(replicated, replicated, member_sharded,
                      member_sharded, member_sharded, replicated,
                      replicated),
        out_shardings=replicated)


def pad_members(arrays: List[np.ndarray], multiple: int
                ) -> Tuple[np.ndarray, int]:
    """Stack member arrays, repeating the last to a multiple of the mesh
    axis; returns (stack, n_real)."""
    n = len(arrays)
    stack = list(arrays)
    while len(stack) % multiple:
        stack.append(stack[-1])
    return np.stack(stack), n
