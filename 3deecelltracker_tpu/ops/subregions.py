"""Cell subregion atlas: z-interpolated per-cell masks + label synthesis.

Rebuilds the reference's geometry stack:

- ``gaussian_interpolation_3d`` (``coord_image_transformer.py:586-621``):
  per cell, crop the bbox, repeat z by ``interpolation_factor``, gaussian
  blur (sigma, 'constant'), threshold at the cell's occupancy percentile.
- ``move_cells`` (``coord_image_transformer.py:292-369``): paste every
  cell's boolean subregion at bbox + integer displacement with boundary
  clipping, accumulating a label image and an overlap-count mask.

TPU-first redesign:
- Variable-size bboxes become ONE fixed-size box per cell (static shape =
  max bbox extent), zero outside the true bbox, so the whole atlas is a
  dense (n_cells, BX, BY, BZ*f) array; blurring is a single batched
  separable conv (zero padding inside the fixed box equals the reference's
  'constant' mode because the cell indicator is fully contained in its
  bbox).
- Pasting uses a canvas padded by the box size, so out-of-range clipping is
  free (content landing in the margin is cropped away) — no per-cell shape
  logic.
- The downstream pipeline only ever reads the interpolated image at the
  original z slices (``z_slice_original_labels``,
  coord_image_transformer.py:238-240); ``move_cells_sampled`` pastes ONLY
  those planes (one box z-plane in f), saving f x memory and bandwidth.
  ``move_cells_full`` keeps full-resolution parity for tests/visualization.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_filter
from .segment_reduce import find_objects_bounds


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SubregionAtlas:
    """Static-shape atlas of per-cell interpolated masks.

    boxes:   (n, BX, BY, BZ*f) bool — cell mask in box coordinates; zero
             outside the cell's true (interpolated) bbox.
    origins: (n, 3) int32 — interp-frame position of box corner (x, y, z*f).
    valid:   (n,) bool — real cells (padding rows for fixed n are False).
    """
    boxes: jax.Array
    origins: jax.Array
    valid: jax.Array
    interpolation_factor: int = dataclasses.field(metadata=dict(static=True))
    image_shape: Tuple[int, int, int] = dataclasses.field(
        metadata=dict(static=True))    # original (x, y, z)

    @property
    def n_cells(self) -> int:
        return self.boxes.shape[0]

    @property
    def box_shape(self) -> Tuple[int, int, int]:
        return tuple(self.boxes.shape[1:])


def _percentile_threshold(values: jax.Array, n_real: jax.Array,
                          q: jax.Array) -> jax.Array:
    """np.percentile(values[:n_real], q) with linear interpolation; values
    beyond n_real must be +inf (sorted to the end)."""
    v = jnp.sort(values)
    rank = q / 100.0 * (n_real.astype(jnp.float32) - 1.0)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.ceil(rank).astype(jnp.int32)
    frac = rank - lo.astype(jnp.float32)
    return v[lo] * (1.0 - frac) + v[hi] * frac


@functools.partial(jax.jit, static_argnames=(
    "n_cells", "box_shape", "interpolation_factor", "smooth_sigma"))
def build_subregion_atlas(label_image: jax.Array,
                          n_cells: int,
                          box_shape: Tuple[int, int, int],
                          interpolation_factor: int = 10,
                          smooth_sigma: float = 2.5) -> SubregionAtlas:
    """Build the atlas from a labeled (x, y, z) volume.

    ``box_shape`` is the static per-cell box in ORIGINAL z units; the stored
    boxes have z size ``box_shape[2] * interpolation_factor``.  Cells whose
    bbox exceeds ``box_shape`` are clipped (callers should size the box from
    ``find_objects_bounds`` maxima).
    """
    f = int(interpolation_factor)
    bx, by, bz = box_shape
    mins, maxs = find_objects_bounds(label_image, n_cells)
    valid = maxs[:, 0] >= mins[:, 0]
    origins_raw = jnp.where(valid[:, None], mins, 0)
    # For cells near the far border the static box overhangs the image.
    # dynamic_slice's out-of-bounds semantics differ by lowering (direct:
    # the whole START is clamped, shifting content; vmapped-to-gather:
    # per-element edge clamp) — rely on NEITHER: crop at an explicitly
    # clamped start and roll the content back so the cell always sits at
    # box offset 0 (where `origins` points).  The rolled-in wrap/garbage
    # lands at offsets >= the true extent (box - delta >= X - mins >= ext)
    # and the `inside` mask below removes it.
    shape_arr = jnp.asarray(label_image.shape, jnp.int32)
    box_arr = jnp.asarray(box_shape, jnp.int32)
    starts_clamped = jnp.maximum(
        jnp.minimum(origins_raw, shape_arr[None, :] - box_arr[None, :]), 0)
    deltas = origins_raw - starts_clamped                     # >= 0

    def one_cell(i):
        o = starts_clamped[i]
        d = deltas[i]
        crop = jax.lax.dynamic_slice(label_image, (o[0], o[1], o[2]),
                                     (bx, by, bz))
        crop = jnp.roll(crop, (-d[0], -d[1], -d[2]), axis=(0, 1, 2))
        sub = (crop == (i + 1)).astype(jnp.float32)
        # true bbox extents (clipped to the static box)
        ext = jnp.minimum(maxs[i] - mins[i] + 1,
                          jnp.asarray(box_shape, jnp.int32))
        # mask out anything beyond the true bbox (content of other cells'
        # labels is already excluded by the equality test; this bounds the
        # percentile + threshold region like the reference's tight crop)
        n_real_orig = ext[0] * ext[1] * ext[2]
        sub = sub * ((jax.lax.broadcasted_iota(jnp.int32, sub.shape, 0)
                      < ext[0])
                     & (jax.lax.broadcasted_iota(jnp.int32, sub.shape, 1)
                        < ext[1])
                     & (jax.lax.broadcasted_iota(jnp.int32, sub.shape, 2)
                        < ext[2]))
        nnz = jnp.sum(sub)
        percentage = 1.0 - nnz / n_real_orig.astype(jnp.float32)

        sub_rep = jnp.repeat(sub, f, axis=2)
        smooth = gaussian_filter(sub_rep, smooth_sigma, mode="zero")

        # percentile over the interpolated true-bbox region only
        ii = jax.lax.broadcasted_iota(jnp.int32, smooth.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, smooth.shape, 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, smooth.shape, 2)
        inside = (ii < ext[0]) & (jj < ext[1]) & (kk < ext[2] * f)
        vals = jnp.where(inside, smooth, jnp.inf).reshape(-1)
        n_real = n_real_orig * f
        thr = _percentile_threshold(vals, n_real, percentage * 100.0)
        return (smooth > thr) & inside

    boxes = jax.vmap(one_cell)(jnp.arange(n_cells))
    origins = jnp.stack([origins_raw[:, 0], origins_raw[:, 1],
                         origins_raw[:, 2] * f], axis=1).astype(jnp.int32)
    boxes = boxes & valid[:, None, None, None]
    return SubregionAtlas(boxes, origins, valid, f,
                          tuple(int(s) for s in label_image.shape))


def _box_extents(boxes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-cell TIGHT start offset and width of each padded box, per axis
    — the reference's ``region_xyz_min`` (relative to the box origin) and
    ``region_width`` (track.py:520-534: tight bbox of the cell, NOT the
    fixed box).  Empty boxes get (0, 0)."""
    starts, widths = [], []
    for ax, other in ((1, (2, 3)), (2, (1, 3)), (3, (1, 2))):
        any_line = jnp.any(boxes, axis=other)            # (n, len_ax)
        L = any_line.shape[1]
        idx = jax.lax.broadcasted_iota(jnp.int32, any_line.shape, 1)
        first = jnp.min(jnp.where(any_line, idx, L), axis=1)
        last1 = jnp.max(jnp.where(any_line, idx + 1, 0), axis=1)
        nonempty = last1 > 0
        starts.append(jnp.where(nonempty, first, 0))
        widths.append(jnp.where(nonempty, last1 - first, 0))
    return jnp.stack(starts, axis=1), jnp.stack(widths, axis=1)


def _reference_in_bounds(atlas: "SubregionAtlas", movements: jax.Array,
                         full_shape) -> jax.Array:
    """Which moved cells the reference's paste keeps
    (``tracker.py:1370-1376``): the canvas pad is the MAX region width
    (``:1107``), a cell is pasted only when its own extent fits the padded
    canvas (a shape mismatch skips it), and the negative-slicing wrap case
    lands entirely inside the pad — invisible after cropping, i.e. an
    effective drop.  All bounds use the TIGHT per-cell bbox (min + width,
    ``region_xyz_min``/``region_width``), not the fixed atlas box:
    ``-pad_ref <= tight_min + move`` and ``tight_min + move + width <=
    S + pad_ref`` per axis."""
    starts, w = _box_extents(atlas.boxes)
    w_valid = jnp.where(atlas.valid[:, None], w, 0)
    pad_ref = jnp.max(w_valid, axis=0)                       # (3,)
    base = atlas.origins + starts + movements.astype(jnp.int32)
    lim = jnp.asarray(full_shape, jnp.int32)[None, :] + pad_ref[None, :]
    return jnp.all((base >= -pad_ref[None, :]) & (base + w <= lim), axis=1)


def _paste_scatter(canvas_shape, boxes, positions, include,
                   overlap_mode: str = "add"):
    """One batched scatter of all cells' boxes at dynamic positions.

    boxes: (n, bx, by, bz) bool; positions: (n, 3) clamped into the padded
    canvas.  Returns (labels, overlap-count) int32 canvases.  A single
    scatter replaces the reference's per-cell Python paste loop
    (coord_image_transformer.py:362-368) — latency O(1) instead of O(n).

    ``overlap_mode``:
    - ``"add"``: overlap voxels hold the SUM of ids (zeroed downstream
      where overlap > 1 — the TPU default);
    - ``"last"``: the reference's byte-level semantics
      (``tracker.py:1366-1380``, paste in ascending cell id, later write
      wins).  Since ids ascend with paste order, last-write-wins equals a
      scatter-max of ids — no sequential loop needed.
    """
    n, bx, by, bz = boxes.shape
    cx, cy, cz = canvas_shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, bx, by, bz), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, bx, by, bz), 2)
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, bx, by, bz), 3)
    px = positions[:, 0, None, None, None] + ii
    py = positions[:, 1, None, None, None] + jj
    pz = positions[:, 2, None, None, None] + kk
    flat_idx = (px * cy + py) * cz + pz
    vals = boxes & include[:, None, None, None]
    vals_i = vals.astype(jnp.int32)
    cell_ids = jax.lax.broadcasted_iota(
        jnp.int32, (n, bx, by, bz), 0) + 1
    if overlap_mode == "last":
        labels = jnp.zeros((cx * cy * cz,), jnp.int32).at[
            flat_idx.reshape(-1)].max((vals_i * cell_ids).reshape(-1))
    else:
        labels = jnp.zeros((cx * cy * cz,), jnp.int32).at[
            flat_idx.reshape(-1)].add((vals_i * cell_ids).reshape(-1))
    overlap = jnp.zeros((cx * cy * cz,), jnp.int32).at[
        flat_idx.reshape(-1)].add(vals_i.reshape(-1))
    return labels.reshape(canvas_shape), overlap.reshape(canvas_shape)


@functools.partial(jax.jit, static_argnames=("overlap_mode",
                                              "out_of_range"))
def move_cells_full(atlas: SubregionAtlas,
                    movements: Optional[jax.Array] = None,
                    include: Optional[jax.Array] = None,
                    overlap_mode: str = "add",
                    out_of_range: str = "clip"
                    ) -> Tuple[jax.Array, jax.Array]:
    """Reference ``move_cells`` parity: full interpolated canvas
    (x, y, z*f).  ``movements``: (n, 3) int32 in the interp frame.
    ``include``: (n,) bool (False = cells_missed).  Returns (labels, overlap
    count mask).

    ``overlap_mode``: see ``_paste_scatter``.  ``out_of_range``: ``"clip"``
    keeps cells pushed past the padded canvas (clamped — the TPU default);
    ``"drop"`` skips them entirely like the reference
    (``tracker.py:1375-1376`` continues on shape mismatch).  Pass
    ``overlap_mode="last", out_of_range="drop"`` for byte-level parity with
    ``_transform_cells_quick``."""
    n = atlas.n_cells
    if movements is None:
        movements = jnp.zeros((n, 3), jnp.int32)
    if include is None:
        include = jnp.ones((n,), bool)
    include = include & atlas.valid
    f = atlas.interpolation_factor
    x, y, z = atlas.image_shape
    full_shape = (x, y, z * f)
    bx, by, bzf = atlas.box_shape
    pad = (bx, by, bzf)
    canvas_shape = tuple(s + 2 * p for s, p in zip(full_shape, pad))
    pos = atlas.origins + movements.astype(jnp.int32) + \
        jnp.asarray(pad, jnp.int32)
    hi = jnp.asarray([c - b for c, b in zip(canvas_shape, atlas.box_shape)],
                     jnp.int32)
    if out_of_range == "drop":
        include = include & _reference_in_bounds(atlas, movements,
                                                 full_shape)
    # clamp so even fully-out-of-range cells stay inside the padded canvas
    pos = jnp.clip(pos, 0, hi)
    cl, cm = _paste_scatter(canvas_shape, atlas.boxes, pos, include,
                            overlap_mode)
    sl = tuple(slice(p, p + s) for p, s in zip(pad, full_shape))
    return cl[sl], cm[sl]


@functools.partial(jax.jit, static_argnames=("overlap_mode",
                                              "out_of_range"))
def move_cells_sampled(atlas: SubregionAtlas,
                       movements: Optional[jax.Array] = None,
                       include: Optional[jax.Array] = None,
                       overlap_mode: str = "add",
                       out_of_range: str = "clip"
                       ) -> Tuple[jax.Array, jax.Array]:
    """Like ``move_cells_full`` followed by sampling the original z slices
    ``z = f//2, f//2 + f, ...`` (``z_slice_original_labels``), but pastes
    only the needed box planes — f x less memory traffic.

    Returns (labels, overlap mask) of shape (x, y, z).
    ``overlap_mode`` / ``out_of_range``: see ``move_cells_full``; the
    ``"drop"`` bound is evaluated in the FULL interpolated frame so it
    matches the reference's check exactly."""
    n = atlas.n_cells
    if movements is None:
        movements = jnp.zeros((n, 3), jnp.int32)
    if include is None:
        include = jnp.ones((n,), bool)
    include = include & atlas.valid
    f = atlas.interpolation_factor
    off = f // 2
    x, y, z = atlas.image_shape
    bx, by, bzf = atlas.box_shape
    bz = bzf // f

    pad = (bx, by, bz + 1)
    canvas_shape = (x + 2 * pad[0], y + 2 * pad[1], z + 2 * pad[2])

    pos_interp = atlas.origins + movements.astype(jnp.int32)
    if out_of_range == "drop":
        include = include & _reference_in_bounds(atlas, movements,
                                                 (x, y, z * f))
    # boxes reshaped so plane index p = k*f + r
    boxes_r = atlas.boxes.reshape(n, bx, by, bz, f)

    z0 = pos_interp[:, 2]
    # plane phase r with (z0 + p) ≡ off (mod f)
    r = jnp.mod(off - z0, f)
    planes = jnp.take_along_axis(
        boxes_r, r[:, None, None, None, None], axis=4)[..., 0]
    # sampled-frame z of plane k: s = (z0 + r - off)/f + k
    s0 = (z0 + r - off) // f
    pos = jnp.stack([pos_interp[:, 0] + pad[0],
                     pos_interp[:, 1] + pad[1],
                     s0 + pad[2]], axis=1)
    pos = jnp.clip(pos, 0, jnp.asarray(
        [canvas_shape[0] - bx, canvas_shape[1] - by,
         canvas_shape[2] - bz], jnp.int32))
    cl, cm = _paste_scatter(canvas_shape, planes, pos, include,
                            overlap_mode)
    sl = tuple(slice(p, p + s) for p, s in zip(pad, (x, y, z)))
    return cl[sl], cm[sl]
