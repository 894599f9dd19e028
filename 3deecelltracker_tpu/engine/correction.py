"""Boundary-cell flagging and the accurate-correction fixed-point loop.

Rebuilds ``CoordsToImageTransformer.get_cells_on_boundary`` /
``accurate_correction`` / ``_correction_once``
(``coord_image_transformer.py:371-489``) as one jitted device loop: move
cells by the current displacement, drop overlaps, recompute every cell's
probability-weighted center of mass, repeat until the max positive interp
delta is < 0.5 voxel (the reference's exact convergence rule, including its
signed-max quirk) or ``max_repetition`` is hit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.segment_reduce import center_of_mass
from ..ops.subregions import SubregionAtlas, move_cells_sampled


@functools.partial(jax.jit, static_argnames=("image_shape", "ensemble"))
def get_cells_on_boundary(coordinates_real: jax.Array,
                          image_shape: Tuple[int, int, int],
                          voxel_size: Tuple[float, float, float],
                          ensemble: bool = False,
                          boundary_xy: int = 6) -> jax.Array:
    """Boolean per-cell mask of boundary cells.

    Exact port of the reference formula (coord_image_transformer.py:389-404),
    including its units asymmetry: the lower bound compares real coords to
    ``boundary_xy`` directly, the upper bound scales by voxel size.
    In ensemble mode ``boundary_xy`` is 0 (tracker.py:1529-1531 semantics).
    """
    b = 0.0 if ensemble else boundary_xy * 1.0
    x_siz, y_siz, z_siz = image_shape
    vx, vy, vz = voxel_size
    x, y, z = (coordinates_real[:, 0], coordinates_real[:, 1],
               coordinates_real[:, 2])
    return ((x < b) | (y < b)
            | (x > (x_siz - b) * vx)
            | (y > (y_siz - b) * vy)
            | (z < 0) | (z > z_siz * vz))


@functools.partial(jax.jit, static_argnames=("max_repetition",))
def accurate_correction_loop(atlas: SubregionAtlas,
                             coord_vol1_raw: jax.Array,
                             coords_raw: jax.Array,
                             prob_img: jax.Array,
                             boundary_mask: jax.Array,
                             max_repetition: int = 20
                             ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                        jax.Array]:
    """Refine raw cell centers against the probability map.

    Returns (corrected_raw (n,3) f32, labels image (x,y,z) int32, overlap
    count mask, n_iterations).  The labels image is move_cells at the
    corrected positions (overlaps NOT yet re-watershedded — callers apply
    ``recalculate_cell_boundaries``, matching ``move_cells_in_3d_image``).
    """
    f = float(atlas.interpolation_factor)
    interp_scale = jnp.asarray((1.0, 1.0, f), jnp.float32)
    include = ~boundary_mask & atlas.valid
    n = atlas.n_cells

    def one_round(coords):
        disp = jnp.round((coords - coord_vol1_raw) * interp_scale
                         ).astype(jnp.int32)
        labels, overlap = move_cells_sampled(atlas, disp, include)
        markers = jnp.where(overlap > 1, 0, labels)
        centers = center_of_mass(prob_img, markers, n)       # (n, 3)
        lost = jnp.isnan(centers[:, 0])
        centers = jnp.where(lost[:, None], jnp.round(coords), centers)
        return centers.astype(jnp.float32)

    def body(carry):
        coords, _, it = carry
        new = one_round(coords)
        delta_interp = jnp.round((new - coords) * interp_scale)
        # reference quirk: signed max, not abs (coord_image_transformer:444)
        delta_max = jnp.max(jnp.where(atlas.valid[:, None], delta_interp,
                                      -jnp.inf))
        return new, delta_max, it + 1

    def cond(carry):
        _, delta_max, it = carry
        return (it < max_repetition) & ~(delta_max < 0.5)

    coords, _, it = jax.lax.while_loop(
        cond, body, (coords_raw.astype(jnp.float32), jnp.inf, jnp.int32(0)))

    disp = jnp.round((coords - coord_vol1_raw) * interp_scale
                     ).astype(jnp.int32)
    labels, overlap = move_cells_sampled(atlas, disp, include)
    return coords, labels, overlap, it
