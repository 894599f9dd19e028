"""Spatially / tile-parallel segmentation inference.

The reference's only big-volume mechanism is a SERIAL tile loop
(``unet3_prediction`` unet3d.py:246-254).  On a mesh there are two
complementary parallelizations (SURVEY §2.3 mapping):

- ``make_tile_parallel_predict``: the extracted tile batch is sharded over
  the whole mesh — embarrassingly parallel, no halo traffic, best for
  many-tile volumes (zebrafish scale).
- ``make_spatially_sharded_apply``: the volume itself is sharded along x
  with a ``shard_map`` whose halo exchange rides ICI neighbor permutes —
  best when one volume must live across chips (memory-bound case).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.tiling import (TilePlan, extract_tiles, pad_for_tiles,
                          plan_tiles, stitch_tiles)


def make_tile_parallel_predict(model_apply: Callable, mesh: Mesh,
                               plan: TilePlan,
                               axis: str = "data"):
    """Jit tiled inference with the tile batch sharded over ``axis``
    (and replicated params).  ``model_apply(params, state, tiles)`` maps a
    (b, x, y, z, 1) batch to probabilities of the same shape."""
    n_tiles = plan.origins.shape[0]
    axis_size = mesh.shape[axis]
    pad = (-n_tiles) % axis_size
    tile_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def fn(params, state, volume):
        padded = pad_for_tiles(volume, plan)
        tiles = extract_tiles(padded, plan)
        if pad:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad,) + plan.tile_shape, tiles.dtype)])
        tiles = jax.lax.with_sharding_constraint(tiles[..., None],
                                                 tile_sharding)
        probs = model_apply(params, state, tiles)[..., 0]
        return stitch_tiles(probs[:n_tiles], plan)

    return jax.jit(fn, in_shardings=(replicated, replicated, replicated),
                   out_shardings=replicated)


def make_spatially_sharded_apply(model_apply: Callable, mesh: Mesh,
                                 halo: int, axis: str = "spatial"):
    """Shard a (b, x, y, z, c) batch along x over ``axis`` with explicit
    halo exchange via ``shard_map`` + ppermute, then apply the model per
    shard and crop the halos.

    Valid when ``model_apply`` is translation-equivariant with receptive
    radius <= halo (conv nets).  This is the hand-rolled analogue of XLA
    SPMD's automatic conv halos, useful when the model is applied through
    non-conv ops XLA cannot infer halos for.

    Boundary semantics: interior shard seams are exact.  Within ``halo``
    voxels of the GLOBAL x edges the result can differ from a stack of
    SAME convs (which zero-pads every layer; here zeros pad the input
    once) — in the segmentation pipeline that band lies inside the
    tile-and-stitch ``shrink`` margin and is discarded anyway.
    """
    from jax import shard_map

    def sharded(params, state, x):
        def body(params, state, x_local):
            idx = jax.lax.axis_index(axis)
            size = jax.lax.axis_size(axis)
            # send my left edge to the left neighbor, right edge right
            left_edge = x_local[:, :halo]
            right_edge = x_local[:, -halo:]
            from_right = jax.lax.ppermute(
                left_edge, axis,
                [(i, (i - 1) % size) for i in range(size)])
            from_left = jax.lax.ppermute(
                right_edge, axis,
                [(i, (i + 1) % size) for i in range(size)])
            # zero halos at the global boundary (reflect handled by caller
            # padding; zero is the conv 'SAME' behavior)
            from_left = jnp.where(idx == 0, jnp.zeros_like(from_left),
                                  from_left)
            from_right = jnp.where(idx == size - 1,
                                   jnp.zeros_like(from_right), from_right)
            x_ext = jnp.concatenate([from_left, x_local, from_right],
                                    axis=1)
            y_ext = model_apply(params, state, x_ext)
            return y_ext[:, halo:-halo]

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(None, axis)),
            out_specs=P(None, axis))(params, state, x)

    return jax.jit(sharded)
