"""CoordsToImageTransformer: cell coordinates <-> label images.

Rebuild of the reference class (``coord_image_transformer.py:144-558``):
loads the proofed vol-1 segmentation, builds the z-interpolated subregion
atlas, synthesizes label images from tracked coordinates, and runs the
probability-weighted accurate-correction loop.

Host side: file IO, atlas sizing, results tree.  Device side: atlas build,
move-cells, correction loop, boundary recalculation (all jitted).
"""

from __future__ import annotations

from glob import glob
from pathlib import Path
from typing import Optional, Set, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..coordinates import Coordinates
from ..io.artifacts import ResultsTree
from ..io.imageio import imread_stack
from ..ops.connected import label_components_values
from ..ops.segment_reduce import center_of_mass, find_objects_bounds
from ..ops.subregions import (SubregionAtlas, build_subregion_atlas,
                              move_cells_full, move_cells_sampled)
from ..ops.watershed import recalculate_cell_boundaries
from .correction import accurate_correction_loop, get_cells_on_boundary

BOUNDARY_XY = 6  # reference tracker.py:47


def upsample_prob_pipeline(prob_grid_xyz, grid, out_shape, xp=jnp):
    """GRID-resolution (x, y, z)-frame prob map -> full resolution:
    per-axis repeat with the pipeline-frame axis mapping
    (axis0 <- grid[1], axis1 <- grid[2], axis2 <- grid[0]) + crop
    (coord_image_transformer.py:431-435).  The ONE shared implementation
    of this subtle mapping — used on host (xp=np), outside jit on device
    arrays, and inside the fused tracking program."""
    out = prob_grid_xyz
    for axis, g in enumerate((grid[1], grid[2], grid[0])):
        if g > 1:
            out = xp.repeat(out, g, axis=axis)
    return out[:out_shape[0], :out_shape[1], :out_shape[2]]


def _relabel_sequential_np(labels: np.ndarray) -> np.ndarray:
    """skimage.segmentation.relabel_sequential for host label volumes."""
    uniq = np.unique(labels)
    uniq = uniq[uniq != 0]
    remap = np.zeros(int(labels.max()) + 1, labels.dtype)
    remap[uniq] = np.arange(1, len(uniq) + 1)
    return remap[labels]


class CoordsToImageTransformer:
    """See reference ``coord_image_transformer.py:144-167``."""

    def __init__(self, results_folder: Union[str, Path], voxel_size):
        self.voxel_size = tuple(float(v) for v in np.asarray(voxel_size))
        self.tree = ResultsTree(results_folder)
        self.results_folder = Path(results_folder)
        self.proofed_segmentation: Optional[np.ndarray] = None
        self.atlas: Optional[SubregionAtlas] = None
        self.auto_corrected_segmentation: Optional[np.ndarray] = None
        self.coord_vol1: Optional[Coordinates] = None
        self.interpolation_factor: int = 1
        self.use_8_bit: bool = True

    # ---- segmentation loading (coord_image_transformer.py:169-190) --------
    def load_segmentation(self, manual_vol_start_path: str) -> None:
        slice_paths = sorted(glob(manual_vol_start_path))
        if len(slice_paths) == 0:
            raise FileNotFoundError(
                f"No image in {manual_vol_start_path} was found")
        seg = imread_stack(slice_paths).transpose(1, 2, 0).astype(np.int32)
        self.proofed_segmentation = _relabel_sequential_np(seg)
        n = int(np.count_nonzero(np.unique(self.proofed_segmentation)))
        print(f"Loaded the proofed segmentations at vol 1 with {n} cells")

    def load_segmentation_array(self, seg_xyz: np.ndarray) -> None:
        """Array-input variant (for pipelines that keep vol-1 in memory)."""
        self.proofed_segmentation = _relabel_sequential_np(
            np.asarray(seg_xyz).astype(np.int32))

    # ---- atlas build (coord_image_transformer.py:192-267) ------------------
    def _box_shape_for(self, segmentation: np.ndarray, n_cells: int
                       ) -> Tuple[int, int, int]:
        mins, maxs = find_objects_bounds(jnp.asarray(segmentation), n_cells)
        ext = np.maximum(np.asarray(maxs) - np.asarray(mins) + 1, 1)
        bx, by, bz = ext.max(axis=0)
        return int(bx), int(by), int(bz)

    @staticmethod
    def _box_shape_np(segmentation: np.ndarray, n_cells: int
                      ) -> Tuple[int, int, int]:
        """Host-side twin of ``_box_shape_for`` for segmentations already
        in host memory — the box shape is a STATIC shape parameter, so
        computing it on device costs a blocking scalar round-trip
        (~100 ms through a remote link) before anything can trace."""
        import scipy.ndimage as ndi

        ext = np.ones((max(n_cells, 1), 3), np.int64)
        for i, sl in enumerate(ndi.find_objects(segmentation,
                                                max_label=n_cells)):
            if sl is not None:
                ext[i] = [s.stop - s.start for s in sl]
        bx, by, bz = ext.max(axis=0)
        return int(bx), int(by), int(bz)

    def _extract_regions(self, segmentation, interpolation_factor: int,
                         smooth_sigma: float, n_cells: Optional[int] = None,
                         box_shape: Optional[Tuple[int, int, int]] = None):
        """Atlas + resynthesized vol-1 labels.  ``segmentation`` may be a
        host OR device array; the returned labels stay ON DEVICE — the
        interpolate pipeline chains several of these stages, and round-
        tripping the (x, y, z) int32 volume between every stage costs more
        in link transfers than all the compute."""
        seg_dev = jnp.asarray(segmentation)
        if n_cells is None:
            n_cells = int(jnp.max(seg_dev))
        if box_shape is None:
            box_shape = self._box_shape_for(seg_dev, n_cells)
        atlas = build_subregion_atlas(
            seg_dev, n_cells=n_cells, box_shape=box_shape,
            interpolation_factor=interpolation_factor,
            smooth_sigma=smooth_sigma)
        labels, overlap = move_cells_sampled(atlas)
        auto_corrected = recalculate_cell_boundaries(
            labels, overlap, sampling_xy=self.voxel_size[:2])
        return atlas, auto_corrected

    def interpolate(self, interpolation_factor: int,
                    smooth_sigma: float = 2.5, t_start: int = 1) -> None:
        """Interpolate along z, fix labeling errors, rebuild subregions, and
        persist vol-1 labels + center coordinates (reference :192-267)."""
        if interpolation_factor <= 0:
            raise ValueError("Interpolation factor must be greater than zero.")
        if self.proofed_segmentation is None:
            raise RuntimeError("call load_segmentation first")
        self.interpolation_factor = int(interpolation_factor)

        # the whole chain (smooth -> fix labels -> rebuild atlas ->
        # resynthesize -> centers) stays device-resident with exactly TWO
        # blocking round-trips: one paired scalar fetch (the post-smoothing
        # and post-correction cell counts, both needed as static shape
        # parameters) and one paired final fetch (uint16 labels + centers)
        n_cells0 = int(self.proofed_segmentation.max())
        box_shape = self._box_shape_np(self.proofed_segmentation, n_cells0)
        seg_dev = jnp.asarray(self.proofed_segmentation)
        _, smoothed_dev = self._extract_regions(
            seg_dev, self.interpolation_factor, smooth_sigma,
            n_cells=n_cells0, box_shape=box_shape)

        # fix_labeling_errors (coord_image_transformer.py:624-647);
        # n_before counts the labels that SURVIVED smoothing.  The relabel
        # capacity only needs an upper bound, so the host-known n_cells0
        # stands in for n_before and both counts fetch together.
        present = jnp.bincount(jnp.ravel(smoothed_dev),
                               length=n_cells0 + 1)[1:] > 0
        cap = max(64, 2 * n_cells0 + 8)
        corrected_dev = label_components_values(
            smoothed_dev, connectivity=3, max_labels=cap)
        # re-derive the box shape from the CORRECTED segmentation (rides
        # the same scalar fetch): smoothing + per-z boundary recalc can
        # grow a cell past its proofed bbox, and fix_labeling_errors can
        # merge touching cells into one larger component — the stale
        # box_shape would silently clip those in the second atlas (the
        # reference recomputes find_objects per extract_regions call,
        # coord_image_transformer.py:600-623)
        mins_dev, maxs_dev = find_objects_bounds(corrected_dev, cap)
        n_before, n_after, mins_np, maxs_np = jax.device_get(
            (jnp.sum(present), jnp.max(corrected_dev), mins_dev, maxs_dev))
        n_before, n_after = int(n_before), int(n_after)
        if n_after != n_before:
            print(f"WARNING: cell count changed {n_before} -> "
                  f"{n_after}; segmentation corrected.")
        ext = np.maximum(np.asarray(maxs_np) - np.asarray(mins_np) + 1, 1)
        box_shape2 = tuple(int(v) for v in ext.max(axis=0))

        self.atlas, auto_dev = self._extract_regions(
            corrected_dev, self.interpolation_factor, smooth_sigma,
            n_cells=n_after, box_shape=box_shape2)
        com_dev = center_of_mass(
            (auto_dev > 0).astype(jnp.float32), auto_dev, n_after)
        auto_np, com = jax.device_get((auto_dev.astype(jnp.uint16), com_dev))
        self.auto_corrected_segmentation = np.asarray(auto_np).astype(
            np.int32)
        self.use_8_bit = int(self.auto_corrected_segmentation.max()) <= 255

        self.tree.save_tracked_labels(self.auto_corrected_segmentation,
                                      t_start, self.use_8_bit)

        self.coord_vol1 = Coordinates.from_raw(
            np.asarray(com), self.interpolation_factor, self.voxel_size)
        self.tree.save_coords_real(t_start, np.asarray(self.coord_vol1.real))

    # ---- label synthesis (coord_image_transformer.py:269-369) --------------
    def move_cells(self, movements_nx3: Optional[np.ndarray] = None,
                   cells_missed: Optional[Set[int]] = None,
                   full_resolution: bool = False):
        include = self._include_mask(cells_missed)
        fn = move_cells_full if full_resolution else move_cells_sampled
        mv = None if movements_nx3 is None else jnp.asarray(
            movements_nx3, jnp.int32)
        return fn(self.atlas, mv, include)

    def move_cells_in_3d_image(self,
                               movements_nx3: Optional[np.ndarray] = None,
                               cells_missed: Optional[Set[int]] = None
                               ) -> np.ndarray:
        labels, overlap = self.move_cells(movements_nx3, cells_missed)
        return np.asarray(recalculate_cell_boundaries(
            labels, overlap, sampling_xy=self.voxel_size[:2]))

    def _include_mask(self, cells_missed) -> jnp.ndarray:
        include = np.ones(self.atlas.n_cells, bool)
        if cells_missed:
            for label in cells_missed:
                if 1 <= label <= self.atlas.n_cells:
                    include[label - 1] = False
        return jnp.asarray(include)

    # ---- boundary + correction (coord_image_transformer.py:371-489) --------
    def get_cells_on_boundary(self, coordinates_real_nx3, ensemble: bool,
                              boundary_xy: int = BOUNDARY_XY) -> np.ndarray:
        mask = get_cells_on_boundary(
            jnp.asarray(coordinates_real_nx3, jnp.float32),
            self.proofed_segmentation.shape, self.voxel_size,
            ensemble=ensemble, boundary_xy=boundary_xy)
        return np.where(np.asarray(mask))[0] + 1

    def load_prob_map(self, t: int, grid: Tuple[int, int, int],
                      fmt: str = "prob%06d.npy") -> np.ndarray:
        """seg/prob*.npy upsampled by the StarDist grid and cropped
        (coord_image_transformer.py:431-435)."""
        prob = self.tree.load_seg_prob(t, fmt)
        return np.asarray(upsample_prob_pipeline(
            prob, grid, self.proofed_segmentation.shape,
            xp=np)).astype(np.float32)

    def accurate_correction(self, t: int, grid: Tuple[int, int, int],
                            coords: Coordinates, ensemble: bool,
                            max_repetition: int = 20,
                            format: str = "prob%06d.npy",
                            prob_map: Optional[np.ndarray] = None,
                            prob_map_grid=None,
                            return_device: bool = False):
        """Probability-weighted center refinement (reference :406-447).

        Returns (corrected Coordinates, corrected labels image).  With
        ``return_device=True`` the labels stay a device array (no host
        sync) so the tracking recurrence never blocks on transfers.

        ``prob_map_grid``: GRID-resolution prob map (host or device, any
        float dtype) — the grid upsample + crop then run ON DEVICE
        (same math as ``load_prob_map``), so callers upload 1/(gy*gx) of
        the bytes."""
        if prob_map_grid is not None:
            prob_map = upsample_prob_pipeline(
                jnp.asarray(prob_map_grid).astype(jnp.float32), grid,
                self.proofed_segmentation.shape)
        elif prob_map is None:
            prob_map = self.load_prob_map(t, grid, format)
        boundary = get_cells_on_boundary(
            jnp.asarray(coords.real), self.proofed_segmentation.shape,
            self.voxel_size, ensemble=ensemble, boundary_xy=BOUNDARY_XY)
        corrected_raw, labels, overlap, _ = accurate_correction_loop(
            self.atlas, self.coord_vol1.raw_f32,
            jnp.asarray(coords.raw_f32), jnp.asarray(prob_map), boundary,
            max_repetition=max_repetition)
        corrected = Coordinates(corrected_raw, self.interpolation_factor,
                                tuple(self.voxel_size))
        corrected_labels = recalculate_cell_boundaries(
            labels, overlap, sampling_xy=self.voxel_size[:2])
        if not return_device:
            corrected_labels = np.asarray(corrected_labels)
        return corrected, corrected_labels

    # ---- persistence (coord_image_transformer.py:491-558) ------------------
    def save_tracking_results(self, coords,
                              corrected_labels_image: np.ndarray,
                              t2: int,
                              images_path=None, tracker=None,
                              t1: Optional[int] = None) -> None:
        """``coords``: a Coordinates, or an already-fetched (n, 3) REAL
        ndarray (lets callers batch the device->host fetch with the label
        image — one RPC instead of two on high-latency links).

        NOTE the argument order differs from the reference's
        ``save_tracking_results(coords, labels, tracker, t1, t2,
        images_path)`` (coord_image_transformer.py:491): ``t2`` comes
        third here; ``tracker``/``t1`` are optional keywords that, when
        BOTH given, also write the reference's per-volume matching figure
        (``figure/matching_<t2>.png``, plot_prgls_prediction)."""
        if not isinstance(t2, (int, np.integer)):
            raise TypeError(
                f"t2 must be an int (got {type(t2).__name__}) — note this "
                "signature is (coords, labels, t2, images_path=, tracker=, "
                "t1=), NOT the reference's positional (coords, labels, "
                "tracker, t1, t2, images_path)")
        real = (np.asarray(coords) if isinstance(coords, np.ndarray)
                else np.asarray(coords.real))
        self.tree.save_coords_real(t2, real)
        self.tree.save_tracked_labels(corrected_labels_image, t2,
                                      self.use_8_bit)
        if images_path is not None:
            try:
                from ..viz import save_merged_labels
                save_merged_labels(self.tree, corrected_labels_image,
                                   images_path, t2,
                                   self.interpolation_factor)
            except Exception as e:  # visualization must never kill tracking
                print(f"merged-label figure skipped: {e}")
        if tracker is not None and t1 is not None:
            # the reference's matching visualization
            # (coord_image_transformer.py:516-522)
            try:
                from ..viz import save_matching_figure
                confirmed_t1 = self.tree.load_coords_real(t1)
                seg_t2 = tracker._get_segmented_pos(t2)
                save_matching_figure(self.tree, confirmed_t1,
                                     np.asarray(seg_t2.real), real, t1, t2)
            except Exception as e:
                print(f"matching figure skipped: {e}")
