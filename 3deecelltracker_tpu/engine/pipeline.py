"""End-to-end v1.0 (StarDist) tracking pipeline.

The reference drives this workflow from notebook cells
(``Examples/use_stardist/track_stardist_single_mode.ipynb``):

1. ``predict_and_save`` — segment every volume into ``seg/`` (cell 10),
2. manual correction of ``auto_vol1`` -> ``manual_vol1`` (external),
3. ``CoordsToImageTransformer.load_segmentation`` + ``interpolate``
   (cells 15-21),
4. per-volume loop: ``predict_cell_positions`` (single or ensemble) ->
   ``accurate_correction`` -> ``save_tracking_results`` (cell 23),
5. ``activities`` -> CSV (cell 30).

``track_timelapse`` packages steps 3-5 as one callable with prefetched
artifacts and the jitted device path; the pieces remain available for
notebook-style step-by-step use.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

import functools

import jax
import jax.numpy as jnp

from ..config import TrackingConfig
from ..coordinates import Coordinates
from ..ops.watershed import recalculate_cell_boundaries
from .correction import accurate_correction_loop, get_cells_on_boundary
from .tracker import TrackerLite, get_volumes_list, track_step
from .transformer import (BOUNDARY_XY, CoordsToImageTransformer,
                          upsample_prob_pipeline)


@functools.partial(jax.jit, static_argnames=(
    "voxel_size", "image_shape", "ensemble", "max_repetition",
    "k_points", "max_iteration", "prob_grid", "labels_u8",
    "m_step_refine"))
def fused_track_and_correct(ffn_params, ffn_state,
                            confirmed_raw: jax.Array,
                            coord_vol1_raw: jax.Array,
                            seg_t1_real: jax.Array, seg_t1_mask: jax.Array,
                            seg_t2_real: jax.Array, seg_t2_mask: jax.Array,
                            prob_img: jax.Array,
                            atlas,
                            voxel_size, image_shape,
                            beta: float, lambda_: float,
                            ensemble: bool = False,
                            max_repetition: int = 20,
                            k_points: int = 20,
                            max_iteration: int = 2000,
                            prob_grid: Tuple[int, int, int] = (1, 1, 1),
                            labels_u8: bool = False,
                            m_step_refine: int = 0):
    """One volume of the tracking recurrence as a SINGLE device program:
    FFN matching + PR-GLS + boundary flagging + accurate correction +
    boundary recalculation.  One dispatch per volume instead of six —
    matters when host-to-device latency is non-trivial (remote links), and
    lets XLA overlap the stages.

    ``prob_grid``: when != (1,1,1), ``prob_img`` is the GRID-resolution
    probability map as stored on disk ((x, y, z) frame,
    ``seg/prob*.npy``); the grid upsample + crop
    (coord_image_transformer.py:431-435) runs on device — uploading the
    grid-res map moves grid_y*grid_x times fewer bytes per volume."""
    if prob_grid != (1, 1, 1):
        prob_img = upsample_prob_pipeline(prob_img, prob_grid, image_shape)
    # prob maps upload as float16 (half the bytes on the host->device
    # link); correction weights compute in f32
    prob_img = prob_img.astype(jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    confirmed_real = confirmed_raw * vs
    tracked_real = track_step(ffn_params, ffn_state, confirmed_real,
                              seg_t1_real, seg_t1_mask,
                              seg_t2_real, seg_t2_mask,
                              beta=beta, lambda_=lambda_,
                              k_points=k_points,
                              max_iteration=max_iteration,
                              m_step_refine=m_step_refine)
    boundary = get_cells_on_boundary(tracked_real, image_shape, voxel_size,
                                     ensemble=ensemble,
                                     boundary_xy=BOUNDARY_XY)
    pred_raw = tracked_real / vs
    corrected_raw, labels, overlap, _ = accurate_correction_loop(
        atlas, coord_vol1_raw, pred_raw, prob_img, boundary,
        max_repetition=max_repetition)
    corrected_labels = recalculate_cell_boundaries(
        labels, overlap, sampling_xy=tuple(voxel_size[:2]))
    # uint16 halves the device->host transfer (uint8 quarters it when cell
    # ids fit — the reference writes 8-bit label TIFFs by default,
    # coord_image_transformer.py:561-583)
    return corrected_raw, corrected_labels.astype(
        jnp.uint8 if labels_u8 else jnp.uint16)


def track_timelapse(results_dir: Union[str, Path],
                    manual_vol1_glob: str,
                    ffn_weights,
                    voxel_size: Tuple[float, float, float],
                    interpolation_factor: int,
                    t_range: Tuple[int, int],
                    grid: Tuple[int, int, int] = (1, 1, 1),
                    config: TrackingConfig = TrackingConfig(),
                    miss_frame: Optional[List[int]] = None,
                    images_path=None,
                    save_figures: bool = False,
                    verbose: bool = True,
                    timer=None,
                    ) -> Dict[int, np.ndarray]:
    """Track all volumes; returns {t: real coordinates}.

    Requires ``seg/coords*.npy`` + ``seg/prob*.npy`` to exist (run
    ``engine.stardist.predict_and_save`` first) and the proofed vol-1 labels
    at ``manual_vol1_glob``.
    """
    from ..utils.profiling import StageTimer
    if timer is None:
        timer = StageTimer()
    t_min, t_max = t_range
    transformer = CoordsToImageTransformer(results_dir, voxel_size)
    transformer.load_segmentation(manual_vol1_glob)
    with timer.stage("interpolate_vol1"):
        transformer.interpolate(interpolation_factor, t_start=t_min)

    tracker = TrackerLite(results_dir, ffn_weights,
                          transformer.coord_vol1,
                          miss_frame=miss_frame)

    # Device-resident recurrence with an async artifact writer: the loop
    # dispatches predict + correction for t+1 while the saver thread
    # fetches volume t's labels/coords and writes TIFF/npy/figures — the
    # TPU never waits on codecs or device->host latency.
    import queue
    import threading

    import jax

    n_savers = 3        # overlap the per-volume d2h RPC latency + codecs
    save_q: "queue.Queue" = queue.Queue(maxsize=2 + n_savers)
    errors: List[Exception] = []
    # pyplot's figure-manager state is global and NOT thread-safe;
    # concurrent savers must serialize all figure work
    mpl_lock = threading.Lock()

    def saver():
        while True:
            item = save_q.get()
            if item is None:
                return
            t2, corrected, labels_dev, coords_t1_real_dev = item
            try:
                # one d2h RPC for labels + coords together
                labels_np, real_np = jax.device_get((labels_dev,
                                                     corrected.real))
                transformer.save_tracking_results(np.asarray(real_np),
                                                  labels_np, t2,
                                                  images_path=images_path)
                if save_figures:
                    from ..viz import save_matching_figure
                    seg_t2 = tracker._get_segmented_pos(t2)
                    with mpl_lock:
                        save_matching_figure(
                            transformer.tree,
                            np.asarray(jax.device_get(coords_t1_real_dev)),
                            np.asarray(seg_t2.real),
                            np.asarray(corrected.real), t2 - 1, t2)
            except Exception as e:
                errors.append(e)

    saver_threads = [threading.Thread(target=saver, daemon=True)
                     for _ in range(n_savers)]
    for th in saver_threads:
        th.start()

    # prob maps (the correction stage's input) prefetch on their own
    # thread so the device loop never blocks on npy reads; the grid
    # upsample happens ON DEVICE (fused_track_and_correct prob_grid), so
    # only the grid-resolution map is uploaded
    from ..io.prefetch import VolumePrefetcher
    # The prefetch thread does DISK work only (npy reads + padding); the
    # host arrays then ride INSIDE the fused call's execute RPC — measured
    # on the tunneled link: an 810 KB np argument adds ~20 ms to the call,
    # while a separate synchronous upload costs a ~50 ms round-trip, and
    # there are three arrays per volume.  (Building seg Coordinates
    # through jnp on the main thread used to cost ~95 ms/volume.)
    vs_np = np.asarray(transformer.voxel_size, np.float32)
    miss = set(miss_frame or [])
    # single mode pairs each volume with the LAST NON-MISSED frame (a miss
    # frame has no seg artifacts to load); ensemble mode loads only the
    # prob map — its reference volumes come from get_volumes_list
    prev_of: Dict[int, int] = {}
    _prev = t_min
    for _t in range(t_min + 1, t_max + 1):
        if _t in miss:
            continue
        prev_of[_t] = _prev
        _prev = _t

    def _pad_real(raw_pts):
        return tracker._pad_np(np.asarray(raw_pts, np.float32) * vs_np)

    def _load_inputs(t2):
        prob = transformer.tree.load_seg_prob(t2).astype(np.float16)
        if config.ensemble:
            return prob, None, None
        p1, m1 = _pad_real(transformer.tree.load_seg_coords(prev_of[t2]))
        p2, m2 = _pad_real(transformer.tree.load_seg_coords(t2))
        return prob, np.stack([p1, p2]), np.stack([m1, m2])

    prob_iter = iter(VolumePrefetcher(
        _load_inputs,
        [t for t in range(t_min + 1, t_max + 1) if t not in miss],
        depth=2, workers=2))
    grid_t = tuple(int(g) for g in grid)
    labels_u8 = transformer.coord_vol1.real.shape[0] <= 255

    coords_by_t: Dict[int, np.ndarray] = {
        t_min: np.asarray(transformer.coord_vol1.real)}
    coords_t1 = transformer.coord_vol1
    corrected_by_t: Dict[int, Coordinates] = {}
    try:
        for t2 in range(t_min + 1, t_max + 1):
            if t2 in tracker.miss_frame:
                corrected_by_t[t2] = coords_t1
                continue
            if config.ensemble:
                # device fan-out over reference volumes with in-memory
                # confirmed coordinates (the disk-reading reference variant
                # would race with the async writer)
                from ..parallel.ensemble import ensemble_track_step
                t1s = get_volumes_list(t2, tracker.miss_frame,
                                       config.sampling_number,
                                       config.adjacent, t_min)
                confirmed_stack = jnp.stack([
                    (transformer.coord_vol1 if t1 == t_min
                     else corrected_by_t[t1]).real for t1 in t1s])
                seg1s, mask1s = zip(*[
                    tracker._pad(np.asarray(
                        tracker._get_segmented_pos(t1).real))
                    for t1 in t1s])
                seg2, mask2 = tracker._pad(np.asarray(
                    tracker._get_segmented_pos(t2).real))
                combined = ensemble_track_step(
                    tracker.ffn_params, tracker.ffn_state,
                    confirmed_stack, jnp.stack(seg1s), jnp.stack(mask1s),
                    seg2, mask2, beta=config.beta, lambda_=config.lambda_,
                    trim_proportion=config.trim_proportion,
                    m_step_refine=config.m_step_refine)
                pred = Coordinates.from_real(
                    combined, transformer.interpolation_factor,
                    transformer.voxel_size)
                t_prob, (prob_g, _, _) = next(prob_iter)
                assert t_prob == t2
                with timer.stage("correction"):
                    # prob_g is the already-uploaded grid-resolution map;
                    # the upsample runs on device
                    corrected, labels_dev = transformer.accurate_correction(
                        t2, grid_t, pred, ensemble=True,
                        max_repetition=config.max_correction_reps,
                        prob_map_grid=prob_g, return_device=True)
            else:
                # single mode: the whole per-volume step is one device
                # program (match + EM + boundary + correction + watershed)
                t_prob, (prob_g, pts_np, masks_np) = next(prob_iter)
                assert t_prob == t2
                # host arrays: they ride inside the fused call's execute
                # RPC (no separate upload round-trips)
                seg1, m1 = pts_np[0], masks_np[0]
                seg2, m2 = pts_np[1], masks_np[1]
                with timer.stage("track+correct (fused)"):
                    corrected_raw, labels_dev = fused_track_and_correct(
                        tracker.ffn_params, tracker.ffn_state,
                        coords_t1.raw_f32,
                        transformer.coord_vol1.raw_f32,
                        seg1, m1, seg2, m2, prob_g,
                        transformer.atlas,
                        tuple(transformer.voxel_size),
                        transformer.proofed_segmentation.shape,
                        beta=config.beta, lambda_=config.lambda_,
                        ensemble=False,
                        max_repetition=config.max_correction_reps,
                        prob_grid=grid_t, labels_u8=labels_u8,
                        m_step_refine=config.m_step_refine)
                corrected = Coordinates(
                    corrected_raw, transformer.interpolation_factor,
                    tuple(transformer.voxel_size))
            save_q.put((t2, corrected, labels_dev, coords_t1.real))
            corrected_by_t[t2] = corrected
            coords_t1 = corrected
            if errors:
                raise errors[0]
            if verbose:
                print(f"tracked t={t2}/{t_max}", end="\r")
    finally:
        for _ in saver_threads:
            save_q.put(None)
        for th in saver_threads:
            th.join()
    if errors:
        raise errors[0]
    for t2, c in corrected_by_t.items():
        coords_by_t[t2] = np.asarray(c.real)
    if verbose:
        print()
        print(timer.summary())
    return coords_by_t
