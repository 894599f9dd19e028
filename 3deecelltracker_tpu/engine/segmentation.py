"""U-Net segmentation engine: volume -> cell instances -> centers.

Rebuild of ``Segmentation._segment`` (``tracker.py:605-684``): local
contrast normalization, tiled 3D U-Net inference, per-z 2-D watershed, 3-D
anisotropic watershed with size filtering, sequential relabeling, centers of
mass.  The whole device path (LCN -> batched tiles -> U-Net -> stitching) is
one jitted function; watershed runs as a second jitted stage so the U-Net
probability cache (``unet_cache`` parity) can sit between them.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SegmentationConfig
from ..models.unet3d import UNet3D
from ..ops.connected import relabel_sequential
from ..ops.lcn import normalize_image
from ..ops.segment_reduce import center_of_mass
from ..ops.tiling import (extract_tiles, pad_for_tiles, plan_tiles,
                          stitch_tiles)
from ..ops.watershed import watershed_2d, watershed_3d


class SegResult(NamedTuple):
    """Parity with the reference's ``SegResults`` (tracker.py:464-496)."""
    image_cell_bg: np.ndarray          # U-Net probability volume
    l_center_coordinates: np.ndarray   # centers in voxel units (n, 3)
    segmentation_auto: np.ndarray      # instance labels
    image_gcn: np.ndarray              # raw / 65536 (correction weighting)
    r_coordinates_segment: np.ndarray  # centers with z scaled by z_xy_ratio


class UNetSegmenter:
    """Device-resident U-Net + watershed segmentation for one volume shape."""

    def __init__(self, model: UNet3D, params, state,
                 config: SegmentationConfig,
                 vol_shape: Tuple[int, int, int],
                 max_cells: int = 1024,
                 compute_dtype=jnp.bfloat16,
                 mesh=None, mesh_mode: str = "tiles",
                 spatial_axis: Optional[str] = None,
                 halo: Optional[int] = None):
        """``mesh``: optional ``jax.sharding.Mesh`` — scale the per-volume
        U-Net sweep over devices (VERDICT r4 #6; the reference's only
        big-volume mechanism is the serial tile loop, unet3d.py:246-254).

        ``mesh_mode="tiles"``: the tile batch the single-device path
        already extracts is sharded over the mesh axis — no halo traffic,
        identical numerics to the serial sweep, the right choice whenever
        the volume fits one device.

        ``mesh_mode="halo"``: the WHOLE volume is sharded along x with
        explicit halo exchange (``parallel.spatial.
        make_spatially_sharded_apply``) and swept in one un-tiled apply —
        per-device activation memory drops to ~1/axis of the whole-volume
        sweep, for volumes whose full-resolution activations exceed one
        chip.  With the default ``halo`` (the model's pool-aligned
        receptive radius) every interior voxel is EXACT — tile-stitch
        seams disappear entirely; a smaller pool-aligned halo (e.g.
        ``config.shrink[0]``) trades edge-band accuracy for less
        redundant compute, the same standard the tile sweep's shrink
        margin accepts.  LCN runs replicated (it is cheap and its 61-wide
        median stride would dominate any halo)."""
        self.model = model
        self.params = params
        self.state = state
        self.config = config
        self.vol_shape = tuple(int(s) for s in vol_shape)
        self.max_cells = int(max_cells)
        self.compute_dtype = compute_dtype
        self.plan = plan_tiles(self.vol_shape, model.tile_shape,
                               config.shrink)
        self.mesh = mesh
        if mesh is None:
            self._predict = jax.jit(self._predict_impl)
        elif mesh_mode == "tiles":
            from ..parallel.spatial import make_tile_parallel_predict
            axis = spatial_axis or mesh.axis_names[0]
            tile_fn = make_tile_parallel_predict(
                self._apply_probs, mesh, self.plan, axis=axis)
            self._predict = jax.jit(
                lambda p, s, raw: tile_fn(p, s, normalize_image(
                    raw, self.config.noise_level, median_stride=61)))
        elif mesh_mode == "halo":
            from ..parallel.spatial import make_spatially_sharded_apply
            axis = spatial_axis or "spatial"
            n_levels = len(model.down_filters)
            tp = model.pool[0] ** n_levels
            axis_size = int(mesh.shape[axis])
            if halo is None:
                r = model.receptive_radius()[0]
                halo = -(-r // tp) * tp
            if halo % tp:
                raise ValueError(
                    f"halo must be a multiple of the total x pool factor "
                    f"{tp} (pooling-grid alignment), got {halo}")
            self.halo = int(halo)
            xl, yl, zl = self.vol_shape
            mult = axis_size * tp
            shard_x = (xl + ((-xl) % mult)) // axis_size
            if self.halo > shard_x:
                raise ValueError(
                    f"halo ({self.halo}) exceeds the per-device x shard "
                    f"({shard_x} = padded {xl} / {axis_size} devices): the "
                    f"halo slices would clamp and the exchange would fail "
                    f"with an opaque shape error.  Use fewer devices on "
                    f"the {axis!r} axis, a bigger volume, or a smaller "
                    f"pool-aligned halo= (edge-band accuracy tradeoff, "
                    f"see docstring)")
            sharded = make_spatially_sharded_apply(
                self._apply_probs, mesh, self.halo, axis=axis)
            pads = ((0, (-xl) % mult),
                    (0, (-yl) % model.pool[1] ** n_levels),
                    (0, (-zl) % model.pool[2] ** n_levels))

            def predict_halo(params, state, image_raw):
                norm = normalize_image(image_raw, self.config.noise_level,
                                       median_stride=61)
                padded = jnp.pad(norm, pads)
                probs = sharded(params, state, padded[None, ..., None])
                return probs[0, :xl, :yl, :zl, 0]

            self._predict = jax.jit(predict_halo)
        else:
            raise ValueError(
                f"mesh_mode must be 'tiles' or 'halo', got {mesh_mode!r}")
        self._watershed = jax.jit(self._watershed_impl,
                                  static_argnames=("method",))

    def _apply_probs(self, params, state, xb):
        probs, _ = self.model.apply(params, state, xb, train=False,
                                    compute_dtype=self.compute_dtype)
        return probs

    # ---- stage 1: LCN + tiled U-Net (tracker.py:662-669) -------------------
    def _predict_impl(self, params, state, image_raw):
        norm = normalize_image(image_raw, self.config.noise_level,
                               median_stride=61)
        padded = pad_for_tiles(norm, self.plan)
        tiles = extract_tiles(padded, self.plan)
        probs, _ = self.model.apply(params, state, tiles[..., None],
                                    train=False,
                                    compute_dtype=self.compute_dtype)
        return stitch_tiles(probs[..., 0], self.plan)

    def predict_cellregions(self, image_raw: np.ndarray,
                            cache_path: Optional[Union[str, Path]] = None
                            ) -> jax.Array:
        """U-Net probabilities with the reference's float16 on-disk cache
        (``unet_cache/t%06i.npy``, tracker.py:652-669)."""
        if cache_path is not None and Path(cache_path).exists():
            return jnp.asarray(np.load(cache_path).astype(np.float32))
        probs = self._predict(self.params, self.state,
                              jnp.asarray(image_raw, jnp.float32))
        if cache_path is not None:
            Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
            np.save(str(cache_path), np.asarray(probs, np.float16))
        return probs

    # ---- stage 2: watershed (tracker.py:671-684) -----------------------------
    def _watershed_impl(self, image_cell_bg, method: str):
        cfg = self.config
        ws2d, _ = watershed_2d(image_cell_bg,
                               min_distance=cfg.min_distance_2d)
        labels_wo_bd, labels_clear, min_size, cell_num = watershed_3d(
            ws2d, samplingrate=(1.0, 1.0, cfg.z_xy_ratio), method=method,
            min_size=cfg.min_size, cell_num=cfg.cell_num,
            min_distance=cfg.min_distance_3d, max_labels=self.max_cells)
        # the reference keeps the WITH-border labels and relabels them
        # sequentially (tracker.py:677-680)
        seg = relabel_sequential(labels_clear, self.max_cells)
        com = center_of_mass((seg > 0).astype(jnp.float32), seg,
                             self.max_cells)
        return seg, com, min_size, cell_num

    # ---- full per-volume segmentation (tracker.py:605-650) --------------------
    def segment(self, image_raw: np.ndarray, method: str = "min_size",
                cache_path: Optional[Union[str, Path]] = None) -> SegResult:
        image_raw = np.asarray(image_raw)
        if method == "cell_num" and not self.config.cell_num:
            raise ValueError(
                "method='cell_num' requires a positive cell_num — "
                "segment volume 1 with method='min_size' first (it learns "
                "cell_num, tracker.py:682-683) or set it in the config")
        probs = self.predict_cellregions(image_raw, cache_path)
        if float(jnp.max(probs)) <= 0.5:
            raise ValueError(
                "No cell was detected by 3D U-Net! Try to reduce the "
                "noise_level.")
        seg, com, min_size, cell_num = self._watershed(probs, method=method)
        # adopt the adaptive values the watershed derived, exactly as the
        # reference stores them (tracker.py:681-683): min_size always
        # (learned under method='cell_num'); cell_num only when the
        # min_size method counted the cells.  The jitted watershed bakes
        # the config in at trace time, so a change must re-jit (compiles
        # lazily; the values change once, at vol 1)
        import dataclasses
        new_cfg = dataclasses.replace(
            self.config, min_size=int(min_size),
            cell_num=int(cell_num) if method == "min_size"
            else self.config.cell_num)
        if new_cfg != self.config:
            self.config = new_cfg
            self._watershed = jax.jit(self._watershed_impl,
                                      static_argnames=("method",))
        seg_np = np.asarray(seg)
        n = int(seg_np.max())
        if n == 0:
            raise ValueError(
                "No cell was detected by watershed! Try to reduce the "
                "min_size.")
        centers = np.asarray(com)[:n]
        r_coords = centers * np.array([1.0, 1.0, self.config.z_xy_ratio])
        return SegResult(
            image_cell_bg=np.asarray(probs),
            l_center_coordinates=centers,
            segmentation_auto=seg_np,
            image_gcn=image_raw / 65536.0,
            r_coordinates_segment=r_coords,
        )
