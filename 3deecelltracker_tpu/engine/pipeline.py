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


def _track_correct_body(ffn_params, ffn_state,
                        confirmed_raw: jax.Array,
                        coord_vol1_raw: jax.Array,
                        seg_t1_real: jax.Array, seg_t1_mask: jax.Array,
                        seg_t2_real: jax.Array, seg_t2_mask: jax.Array,
                        prob_img: jax.Array,
                        atlas,
                        voxel_size, image_shape,
                        beta: float, lambda_: float,
                        ensemble: bool,
                        max_repetition: int,
                        k_points: int,
                        max_iteration: int,
                        prob_grid: Tuple[int, int, int],
                        labels_u8: bool,
                        m_step_refine: int):
    """Shared per-volume track+correct body (see
    :func:`fused_track_and_correct` for semantics); traced inside both
    the disk-coupled and the device-handoff jitted programs."""
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
    return _track_correct_body(
        ffn_params, ffn_state, confirmed_raw, coord_vol1_raw,
        seg_t1_real, seg_t1_mask, seg_t2_real, seg_t2_mask, prob_img,
        atlas, voxel_size, image_shape, beta, lambda_, ensemble,
        max_repetition, k_points, max_iteration, prob_grid, labels_u8,
        m_step_refine)


def seg_candidates_to_padded_real(points_zyx: jax.Array, kept: jax.Array,
                                  pad_n: int, voxel_size):
    """Adapt raw seg-program candidate outputs to the tracker's padded
    point-set contract, ON DEVICE — the device-resident equivalent of
    writing ``seg/coords*.npy`` and re-reading it through
    ``TrackerLite._pad_np``.

    ``points_zyx`` (K, 3) int voxel coords arrive prob-DESCENDING from the
    candidate top-k; compressing the ``kept`` rows to the front with a
    stable sort therefore reproduces the exact row order of the disk
    artifact (``StarDist3D._finalize_instances`` sorts kept candidates by
    descending prob, stably).  Rows are mapped to the pipeline (x, y, z)
    frame (zyx -> (y, x, z), the ``save_seg_coords`` layout), scaled to
    real units, and padded to ``pad_n`` with the 1e6 parking value + bool
    mask of ``TrackerLite._pad_np``.  Kept counts above ``pad_n`` are
    TRUNCATED here (static shapes); the driver's artifact saver surfaces
    that as the same error the disk path raises."""
    k = int(points_zyx.shape[0])
    order = jnp.argsort(jnp.logical_not(kept), stable=True)
    pts = points_zyx[order]
    pipe = jnp.stack([pts[:, 1], pts[:, 2], pts[:, 0]],
                     axis=1).astype(jnp.float32)
    kept_sorted = kept[order]
    vs = jnp.asarray(voxel_size, jnp.float32)
    m = min(k, int(pad_n))
    real = jnp.full((int(pad_n), 3), 1e6, jnp.float32)
    mask = jnp.zeros((int(pad_n),), bool)
    real = real.at[:m].set(
        jnp.where(kept_sorted[:m, None], pipe[:m] * vs, 1e6))
    mask = mask.at[:m].set(kept_sorted[:m])
    return real, mask


@functools.partial(jax.jit, static_argnames=(
    "voxel_size", "image_shape", "ensemble", "max_repetition",
    "k_points", "max_iteration", "prob_grid", "labels_u8",
    "m_step_refine", "pad_n"))
def fused_track_from_seg(ffn_params, ffn_state,
                         confirmed_raw: jax.Array,
                         coord_vol1_raw: jax.Array,
                         pts1_zyx: jax.Array, kept1: jax.Array,
                         pts2_zyx: jax.Array, kept2: jax.Array,
                         prob_zyx_grid: jax.Array,
                         atlas,
                         voxel_size, image_shape,
                         beta: float, lambda_: float,
                         ensemble: bool = False,
                         max_repetition: int = 20,
                         k_points: int = 20,
                         max_iteration: int = 2000,
                         prob_grid: Tuple[int, int, int] = (1, 1, 1),
                         labels_u8: bool = False,
                         m_step_refine: int = 0,
                         pad_n: int = 192):
    """:func:`fused_track_and_correct` fed DIRECTLY from the seg program's
    device outputs — the device-resident seg->track handoff (VERDICT r3
    #1).  Takes the raw candidate arrays (``points``/``kept`` of
    ``StarDist3D._predict_instances_device``) for t1 and t2 plus the
    (z, y, x) GRID-resolution prob map, and performs the disk artifacts'
    frame conversions on device: candidate compress/pad
    (:func:`seg_candidates_to_padded_real`) and the prob transpose to the
    pipeline frame (``predict_and_save`` writes
    ``prob_map.transpose((1, 2, 0))``).  Bit-identical results to the
    disk-coupled path, with the per-volume prob-map d2h + npy + h2d round
    trip deleted (reference semantics being fused:
    stardistwrapper.py:75-111 -> coord_image_transformer.py:406-447)."""
    seg1_real, m1 = seg_candidates_to_padded_real(pts1_zyx, kept1, pad_n,
                                                  voxel_size)
    seg2_real, m2 = seg_candidates_to_padded_real(pts2_zyx, kept2, pad_n,
                                                  voxel_size)
    prob_img = jnp.transpose(prob_zyx_grid, (1, 2, 0))
    return _track_correct_body(
        ffn_params, ffn_state, confirmed_raw, coord_vol1_raw,
        seg1_real, m1, seg2_real, m2, prob_img,
        atlas, voxel_size, image_shape, beta, lambda_, ensemble,
        max_repetition, k_points, max_iteration, prob_grid, labels_u8,
        m_step_refine)


def segment_and_track(images_path, model,
                      results_dir: Union[str, Path],
                      manual_vol1_glob: str,
                      ffn_weights,
                      voxel_size: Tuple[float, float, float],
                      interpolation_factor: int,
                      t_range: Tuple[int, int],
                      config: TrackingConfig = TrackingConfig(),
                      miss_frame: Optional[List[int]] = None,
                      save_figures: bool = False,
                      verbose: bool = True,
                      timer=None,
                      handoff: str = "disk",
                      mesh=None,
                      data_axis: str = "data",
                      transport: str = "u16") -> Dict[int, np.ndarray]:
    """Run segmentation AND tracking concurrently over one recording:
    ``predict_and_save`` on its own thread, ``track_timelapse`` on the
    caller's, handing volumes off as their seg artifacts land.

    The reference runs the two stages strictly in sequence
    (``stardistwrapper.predict_and_save`` first, then the notebook's
    tracking loop) — so does the split driver here, and the total wall
    is seg + track.  But the stages load OPPOSITE directions of the
    host<->device link (seg is upload-dominated: raw volumes in; track
    is download-dominated: labels out) and neither saturates device
    compute, so overlapping them approaches max(seg, track) instead of
    the sum.  Requires the proofed ``manual_vol1`` labels up front (the
    normal workflow: vol 1 was segmented + corrected in a previous
    session; ``seg/`` artifacts for vol 1 are REgenerated here).

    ``handoff``: how tracking consumes segmentation.
      - ``"disk"`` (default): through the ``seg/`` artifact tree, gated
        per volume — the resumable reference composition.
      - ``"device"``: tracking consumes the seg program's DEVICE-RESIDENT
        candidate/prob outputs directly (single mode only); ``seg/`` and
        tracking artifacts are still written asynchronously for the
        resume contract, but the per-volume prob-map d2h -> npy -> h2d
        round trip leaves the critical path.  Bit-identical results to
        ``"disk"`` (tested); fuses stardistwrapper.py:75-111 ->
        coord_image_transformer.py:406-447.

    ``mesh``: optional ``jax.sharding.Mesh`` — the flagship composition
    on the multi-chip target.  With ``handoff="device"``, segmentation
    fans the volume stream over the mesh's ``data_axis`` in data-sharded
    groups while the serial tracking recurrence consumes the per-volume
    device outputs in order (artifacts bit-identical to the single-device
    handoff; tested).  With ``handoff="disk"``, the concurrent
    ``predict_and_save`` shards its dispatch groups over the mesh and, in
    ensemble mode, ``track_timelapse`` fans the member predictions over
    the same mesh.

    ``transport``: raw-volume wire format to the device.  ``"u16"``
    (default, lossless).  ``"u8"`` quantizes against the volume's own
    1/99.8 percentiles on the host (``io.imageio.quantize_u8``) — HALF
    the upload bytes, for remote-link deployments; LOSSY (clips outside
    the percentile range, 1/255 steps), so validate accuracy on your
    recipe first (worm bench: identical 150/150 detection, 0 identity
    switches, BASELINE.md).
    """
    import threading

    from .stardist import predict_and_save

    if handoff == "device":
        return _segment_and_track_device(
            images_path, model, results_dir, manual_vol1_glob, ffn_weights,
            voxel_size, interpolation_factor, t_range, config, miss_frame,
            save_figures, verbose, timer, mesh=mesh, data_axis=data_axis,
            transport=transport)
    if handoff != "disk":
        raise ValueError(f"handoff must be 'disk' or 'device', got "
                         f"{handoff!r}")

    t_min, t_max = t_range
    done_lock = threading.Condition()
    done: set = set()
    watermark = [t_min - 1]
    seg_error: List[Exception] = []

    def progress(t):
        with done_lock:
            done.add(t)
            while watermark[0] + 1 in done:
                watermark[0] += 1
            done_lock.notify_all()

    seg_done = [False]
    cancel = threading.Event()          # set when tracking fails early:
                                        # the segmenter stops after its
                                        # in-flight volume instead of
                                        # sweeping the whole recording

    def seg_thread():
        try:
            predict_and_save(images_path, model, results_dir,
                             volumes=list(range(t_min, t_max + 1)),
                             progress_cb=progress,
                             should_stop=cancel.is_set,
                             mesh=mesh, data_axis=data_axis,
                             transport=transport)
        except Exception as e:          # surface on the tracking side
            seg_error.append(e)
        with done_lock:
            seg_done[0] = True
            done_lock.notify_all()

    def volume_ready(t):
        # NOTE: a finished segmenter does NOT imply volume t exists —
        # predict_and_save stops early (with a warning, reference
        # end-of-recording semantics) when raw images go missing
        # mid-recording; report the truncation instead of letting
        # tracking crash on the absent seg artifacts
        with done_lock:
            done_lock.wait_for(
                lambda: watermark[0] >= t or seg_done[0] or seg_error)
            reached = watermark[0]
        if seg_error:
            raise RuntimeError("segmentation failed") from seg_error[0]
        if reached < t:
            raise RuntimeError(
                f"segmentation ended at t={reached} before volume {t} "
                f"(raw images missing from the recording?); tracking "
                f"cannot continue")

    th = threading.Thread(target=seg_thread, daemon=True)
    th.start()
    tracked_ok = False
    try:
        coords = track_timelapse(
            results_dir, manual_vol1_glob, ffn_weights,
            voxel_size=voxel_size,
            interpolation_factor=interpolation_factor,
            t_range=t_range, grid=tuple(model.config.grid),
            config=config, miss_frame=miss_frame,
            images_path=images_path, save_figures=save_figures,
            verbose=verbose, timer=timer, mesh=mesh,
            volume_ready=volume_ready)
        tracked_ok = True
    finally:
        if not tracked_ok:
            # tracking failed: stop the segmenter after its in-flight
            # volume instead of sweeping the rest of the recording
            # (tracking success implies segmentation reached t_max, save
            # possibly trailing miss frames the segmenter still writes)
            cancel.set()
        th.join()
    if seg_error:
        raise seg_error[0]
    return coords


def _segment_and_track_device(images_path, model,
                              results_dir: Union[str, Path],
                              manual_vol1_glob: str,
                              ffn_weights,
                              voxel_size: Tuple[float, float, float],
                              interpolation_factor: int,
                              t_range: Tuple[int, int],
                              config: TrackingConfig,
                              miss_frame: Optional[List[int]],
                              save_figures: bool,
                              verbose: bool,
                              timer,
                              mesh=None,
                              data_axis: str = "data",
                              transport: str = "u16") -> Dict[int,
                                                              np.ndarray]:
    """Device-resident ``segment_and_track`` (VERDICT r3 #1): per volume,
    ONE seg dispatch + ONE track dispatch, with tracking fed from the seg
    program's device outputs via :func:`fused_track_from_seg`.  Artifacts
    (seg/ tree + track_results/) are written by async fetch-batched saver
    threads — the resume contract is preserved but entirely off the
    critical path; the disk path's per-volume grid-prob re-upload and
    coords npy round trips are deleted, and the single host core never
    encodes/decodes npy on the hot path.

    Device-compute overlap: the seg program for volume t+1 is enqueued
    behind the track program for volume t on the in-order device stream,
    so seg(t+1) executes while the host is still assembling track(t+1)'s
    dispatch — neither stage ever waits on the other's host work.

    ``mesh`` (VERDICT r4 #1): with a ``jax.sharding.Mesh``, segmentation
    fans the volume stream out over the mesh's ``data_axis`` in
    data-sharded groups (every device segments a different volume of the
    group concurrently, the same SPMD program ``predict_and_save(mesh=)``
    runs), while the serial tracking recurrence — inherently ordered,
    reference semantics stardistwrapper.py:94 -> the notebook cell-23
    loop — consumes the per-volume device outputs in t order on device 0.
    Groups dispatch ONE batch ahead of the consumer, so the mesh segments
    group k+1 while the host tracks group k.  Artifacts are bit-identical
    to the single-device handoff (same per-volume programs; tested).
    """
    from ..io.prefetch import VolumePrefetcher
    from ..utils.profiling import StageTimer

    if config.ensemble:
        raise ValueError(
            "handoff='device' supports single mode only; ensemble "
            "tracking draws confirmed references from many past volumes "
            "— use the disk-coupled driver (handoff='disk')")
    if timer is None:
        timer = StageTimer()
    t_min, t_max = t_range
    transformer = CoordsToImageTransformer(results_dir, voxel_size)
    transformer.load_segmentation(manual_vol1_glob)
    with timer.stage("interpolate_vol1"):
        transformer.interpolate(interpolation_factor, t_start=t_min)
    tracker = TrackerLite(results_dir, ffn_weights,
                          transformer.coord_vol1, miss_frame=miss_frame)
    grid_t = tuple(int(g) for g in model.config.grid)
    vs_t = tuple(transformer.voxel_size)
    image_shape = transformer.proofed_segmentation.shape
    labels_u8 = transformer.coord_vol1.real.shape[0] <= 255
    miss = set(miss_frame or [])
    axis = int(mesh.shape[data_axis]) if mesh is not None else 1

    if transport not in ("u16", "u8"):
        raise ValueError(f"transport must be 'u16' or 'u8', got "
                         f"{transport!r}")

    def _load_raw(t):
        # percentiles on the prefetch thread; the h2d upload happens here
        # too, overlapping link latency with the previous volume's work
        # (same mechanics as predict_and_save._load_raw).  Mesh path:
        # volumes stay on host — the stacked group is device_put with the
        # batch sharding at dispatch
        from ..io.imageio import load_2d_slices_at_time, transport_encode
        x = load_2d_slices_at_time(images_path, t=t, do_normalize=False)
        # the shared wire format (lossless u16 / opt-in lossy u8) —
        # ONE definition in io.imageio.transport_encode
        x, mi, ma = transport_encode(x, transport)
        if mesh is not None:
            return x, float(mi), float(ma)
        return jnp.asarray(x), float(mi), float(ma)

    loader = VolumePrefetcher(_load_raw, list(range(t_min, t_max + 1)),
                              depth=2 if mesh is None else axis + 1,
                              workers=2)
    seg_saver = _AsyncSegSaver(model, transformer.tree, results_dir,
                               t_min, tracker.max_cells)
    track_saver = _AsyncTrackSaver(transformer, tracker, images_path,
                                   save_figures, seg_gate=seg_saver)
    truncated = [False]

    def _seg_stream():
        """Yield ``(t, seg6)`` in t order, ``seg6`` the single-volume
        device tuple ``(kept, probs, dists, points, prob_map, labels)``.
        Without a mesh: one fused dispatch per volume.  With a mesh:
        volumes after t_min dispatch as data-sharded groups of ``axis``
        (padded tails repeat the last volume; the same one-compile
        semantics as ``predict_and_save.flush_group``), pipelined one
        group ahead; per-volume slices land on device 0 where the serial
        tracking recurrence (and every model/atlas leaf) lives."""
        from jax.sharding import NamedSharding, PartitionSpec
        dev0 = jax.local_devices()[0]
        data_sh = (NamedSharding(mesh, PartitionSpec(data_axis))
                   if mesh is not None else None)
        it = iter(loader)
        group: list = []
        pending: Optional[list] = None

        def _dispatch_group():
            ts = [g[0] for g in group]
            padded = group + [group[-1]] * (axis - len(group))
            xs = jax.device_put(np.stack([g[1] for g in padded]), data_sh)
            out = model._predict_batch_device(
                xs, [g[2] for g in padded], [g[3] for g in padded],
                mesh=mesh, data_axis=data_axis)
            group.clear()
            sliced = []
            for i, t in enumerate(ts):
                per = jax.device_put(
                    jax.tree_util.tree_map(lambda a: a[i], out), dev0)
                sliced.append((t, per + (None,)))
            return sliced

        while True:
            try:
                t, (x, mi, ma) = next(it)
            except StopIteration:
                break
            except FileNotFoundError:
                # reference end-of-recording semantics
                # (stardistwrapper.py:98-101); already-dispatched volumes
                # below still track, then the driver raises
                truncated[0] = True
                break
            if mesh is None or t == t_min:
                # vol 1 always runs the single-volume program (it renders
                # the auto_vol1 labels), in both paths
                yield t, model._predict_instances_device(
                    x, norm_minmax=(mi, ma), return_labels=(t == t_min))
            else:
                group.append((t, x, mi, ma))
                if len(group) == axis:
                    d = _dispatch_group()
                    if pending is not None:
                        yield from pending
                    pending = d
        if group:
            d = _dispatch_group()
            if pending is not None:
                yield from pending
            pending = d
        if pending is not None:
            yield from pending

    coords_t1 = transformer.coord_vol1
    corrected_by_t: Dict[int, Coordinates] = {}
    prev_pts = prev_kept = None
    done_t = t_min - 1
    try:
        for t, seg_out in _seg_stream():
            kept, probs, dists, points, prob_map, _ = seg_out
            seg_saver.put(t, seg_out)
            if t == t_min:
                prev_pts, prev_kept = points, kept
            elif t in miss:
                # miss frames still get seg artifacts (the sweep has no
                # miss concept, stardistwrapper.py:94) but tracking
                # freezes at the previous confirmed positions and pairs
                # the next volume with the last NON-missed frame
                corrected_by_t[t] = coords_t1
            else:
                with timer.stage("track+correct (device handoff)"):
                    corrected_raw, labels_dev = fused_track_from_seg(
                        tracker.ffn_params, tracker.ffn_state,
                        coords_t1.raw_f32,
                        transformer.coord_vol1.raw_f32,
                        prev_pts, prev_kept, points, kept, prob_map,
                        transformer.atlas, vs_t, image_shape,
                        beta=config.beta, lambda_=config.lambda_,
                        ensemble=False,
                        max_repetition=config.max_correction_reps,
                        k_points=config.k_neighbors,
                        max_iteration=config.max_iteration,
                        prob_grid=grid_t, labels_u8=labels_u8,
                        m_step_refine=config.m_step_refine,
                        pad_n=tracker.max_cells)
                corrected = Coordinates(
                    corrected_raw, transformer.interpolation_factor, vs_t)
                track_saver.put(t, corrected, labels_dev, coords_t1.real)
                corrected_by_t[t] = corrected
                coords_t1 = corrected
                prev_pts, prev_kept = points, kept
            done_t = t
            if seg_saver.errors:
                raise seg_saver.errors[0]
            if track_saver.errors:
                raise track_saver.errors[0]
            if verbose and t > t_min:
                print(f"tracked t={t}/{t_max}", end="\r")
        if truncated[0]:
            # unlike a standalone seg sweep, tracking cannot continue
            # past the truncation
            raise RuntimeError(
                f"segmentation ended at t={done_t} before volume "
                f"{done_t + 1} (raw images missing from the "
                f"recording?); tracking cannot continue")
    finally:
        loader.close()
        seg_saver.close()
        track_saver.close()
    if seg_saver.errors:
        raise seg_saver.errors[0]
    if track_saver.errors:
        raise track_saver.errors[0]
    print(f"All images from t={t_min} to t={done_t} have been segmented")
    coords_by_t: Dict[int, np.ndarray] = {
        t_min: np.asarray(transformer.coord_vol1.real)}
    for t2, c in corrected_by_t.items():
        coords_by_t[t2] = np.asarray(c.real)
    if verbose:
        print()
        print(timer.summary())
    return coords_by_t


def _maybe_rle_labels(labels_dev, max_cells: int):
    """Dispatch an on-device RLE of the tracked label volume (sized by
    :func:`~..ops.rle.runs_budget`) when the encoding meaningfully
    shrinks the device->host payload; None at shapes where dense is
    already cheap (tiny tests).  The dense buffer stays the overflow
    fallback — see ``_AsyncTrackSaver._fetcher``."""
    from ..ops.rle import rle_encode, runs_budget, worth_encoding
    n = int(np.prod(labels_dev.shape))
    r = runs_budget(n, max_cells)
    if not worth_encoding(n, r, labels_dev.dtype.itemsize):
        return None
    return rle_encode(labels_dev.reshape(-1), r)


class _AsyncTrackSaver:
    """Async tracked-artifact writer shared by :func:`track_timelapse` and
    the device-handoff driver: a fetcher thread drains the queue greedily
    and fetches SEVERAL volumes' labels + coords in ONE ``device_get``
    (round 2 paid one RPC per volume — ~15-20 ms/vol of pure link latency
    at the measured wall), then ``n_writers`` writer threads run the
    TIFF/npy/figure codecs — the device loop never waits on codecs or
    device->host latency.

    Labels ride the link RUN-LENGTH ENCODED (``ops/rle.py``): at worm
    scale the dense (32,224,224) uint8 volume is ~1.6 MB/vol — the
    single largest device->host item — while its ~13k runs encode in
    ~160 KB.  Encoding dispatches on device at ``put`` time; the fetcher
    decodes with one ``np.repeat`` and falls back to fetching the dense
    buffer if the run budget overflowed (correctness never depends on
    the budget)."""

    def __init__(self, transformer, tracker, images_path, save_figures,
                 n_writers: int = 2, fetch_batch: int = 3, seg_gate=None):
        import queue
        import threading

        self.transformer = transformer
        self.tracker = tracker
        self.images_path = images_path
        self.save_figures = save_figures
        # when tracking runs CONCURRENTLY with an _AsyncSegSaver (the
        # device-handoff driver), volume t2's track artifacts must not be
        # written before its seg artifacts are complete and validated:
        # the figure path re-reads seg/coords{t2}.npy (a racing read of a
        # half-written npy aborted runs intermittently), and a seg
        # validation failure (max_cells overflow) must not leave tracked
        # artifacts derived from a silently truncated candidate set in a
        # resumable tree (ADVICE r4).
        self.seg_gate = seg_gate
        self.n_writers = n_writers
        self.fetch_batch = fetch_batch
        self.save_q: "queue.Queue" = queue.Queue(maxsize=2 + fetch_batch)
        self.write_q: "queue.Queue" = queue.Queue(maxsize=2 * fetch_batch)
        self.errors: List[Exception] = []
        # pyplot's figure-manager state is global and NOT thread-safe;
        # concurrent savers must serialize all figure work
        self.mpl_lock = threading.Lock()
        self.threads = [threading.Thread(target=self._fetcher, daemon=True)]
        self.threads += [threading.Thread(target=self._writer, daemon=True)
                         for _ in range(n_writers)]
        for th in self.threads:
            th.start()

    def put(self, t2: int, corrected: Coordinates, labels_dev,
            t1_real) -> None:
        enc = _maybe_rle_labels(labels_dev, self.tracker.max_cells)
        self.save_q.put((t2, corrected, labels_dev, t1_real, enc))

    def close(self) -> None:
        """Stop (idempotent-safe only once) and join all threads."""
        self.save_q.put(None)          # fetcher forwards stop to writers
        for th in self.threads:
            th.join()

    def _fetcher(self):
        import queue
        done = False
        while not done:
            item = self.save_q.get()
            if item is None:
                break
            batch = [item]
            while len(batch) < self.fetch_batch:
                try:
                    nxt = self.save_q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    done = True
                    break
                batch.append(nxt)
            try:
                from ..ops.rle import rle_decode
                payload = jax.device_get(
                    [(it[4] if it[4] is not None else it[2],
                      it[1].real, it[3]) for it in batch])
                for (t2, corrected, labels_dev, _, enc), \
                        (lab, real_np, t1_real) in zip(batch, payload):
                    if enc is None:
                        labels_np = np.asarray(lab)
                    else:
                        starts, vals, n_runs = lab
                        if int(n_runs) > starts.size:
                            # budget overflow (dense volume still on
                            # device): correctness over compression
                            labels_np = np.asarray(
                                jax.device_get(labels_dev))
                        else:
                            labels_np = rle_decode(
                                starts, vals, int(n_runs),
                                int(np.prod(labels_dev.shape))
                            ).reshape(labels_dev.shape)
                    self.write_q.put((t2, np.asarray(real_np), labels_np,
                                      np.asarray(t1_real)))
            except Exception as e:
                self.errors.append(e)
        for _ in range(self.n_writers):
            self.write_q.put(None)

    def _writer(self):
        while True:
            item = self.write_q.get()
            if item is None:
                return
            t2, real_np, labels_np, t1_real = item
            if self.seg_gate is not None and \
                    not self.seg_gate.wait_written(t2):
                continue    # seg failed at/before t2: the driver surfaces
                            # the seg error; write no dependent artifacts
            try:
                self.transformer.save_tracking_results(
                    real_np, labels_np, t2, images_path=self.images_path)
                if self.save_figures:
                    from ..viz import save_matching_figure
                    seg_t2 = self.tracker._get_segmented_pos(t2)
                    with self.mpl_lock:
                        save_matching_figure(
                            self.transformer.tree, t1_real,
                            np.asarray(seg_t2.real), real_np, t2 - 1, t2)
            except Exception as e:
                self.errors.append(e)


class _AsyncSegSaver:
    """Async seg-artifact writer for the device-handoff driver: drains the
    queue greedily, fetches several volumes' seg device tuples in ONE
    ``device_get``, and persists ``seg/coords*.npy`` + ``seg/prob*.npy``
    (+ ``auto_vol1`` labels for the first volume) EXACTLY as
    ``predict_and_save`` does — the resume contract stays intact, just
    off the tracking critical path."""

    def __init__(self, model, tree: ResultsTree, results_folder,
                 t_min: int, max_cells: int, fetch_batch: int = 3,
                 progress_cb=None):
        import queue
        import threading

        self.model = model
        self.tree = tree
        self.results_folder = Path(results_folder)
        self.t_min = t_min
        self.max_cells = int(max_cells)
        self.fetch_batch = fetch_batch
        self.progress_cb = progress_cb
        self.q: "queue.Queue" = queue.Queue(maxsize=2 + fetch_batch)
        self.errors: List[Exception] = []
        # per-t completion watermark: volumes arrive and write in t order
        # on the single run thread, so "written through t" is one integer.
        # _AsyncTrackSaver gates its (disk-reading, resume-contract) writes
        # on it — see wait_written (ADVICE r4 medium + low #2).
        self._cond = threading.Condition()
        self._done_t = t_min - 1
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def wait_written(self, t: int) -> bool:
        """Block until volume ``t``'s seg artifacts are fully written;
        returns False if the saver failed first (validation errors like
        the max_cells overflow are TERMINAL: no later volume's artifacts
        are written, so dependent track artifacts must not be either)."""
        with self._cond:
            self._cond.wait_for(lambda: self._done_t >= t or self.errors)
            return self._done_t >= t

    def put(self, t: int, device_tuple) -> None:
        self.q.put((t, device_tuple))

    def close(self) -> None:
        self.q.put(None)
        self.thread.join()

    def _write_one(self, t: int, finalized) -> None:
        from ..io.imageio import save_volume_slices

        (labels, details), prob_map = finalized
        n = int(details["points"].shape[0])
        if n > self.max_cells:
            # the disk-coupled path raises this in TrackerLite._pad_np;
            # the device adapter truncated silently (static shapes), so
            # surface the identical contract violation here
            raise ValueError(
                f"{n} cells exceeds max_cells={self.max_cells}")
        self.tree.save_seg_coords(t, details["points"][:, [1, 2, 0]])
        self.tree.save_seg_prob(t, prob_map.transpose((1, 2, 0)))
        if t == self.t_min and labels is not None:
            save_volume_slices(labels.transpose((1, 2, 0)),
                               self.results_folder / "auto_vol1",
                               "auto_vol1_z%04i.tif")
        if self.progress_cb is not None:
            self.progress_cb(t)
        with self._cond:
            self._done_t = t
            self._cond.notify_all()

    def _run(self):
        import queue
        done = False
        while not done:
            item = self.q.get()
            if item is None:
                break
            batch = [item]
            while len(batch) < self.fetch_batch:
                try:
                    nxt = self.q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    done = True
                    break
                batch.append(nxt)
            if self.errors:
                continue    # terminal: drain (so producers never block on
                            # the bounded queue) but write nothing more
            try:
                # skip dists — never part of the seg artifacts (~100 KB
                # of d2h per volume saved)
                payload = jax.device_get(
                    [(it[1][0], it[1][1], it[1][3], it[1][4], it[1][5])
                     for it in batch])
                for (t, _), (kept, probs, points, prob_map, labels) \
                        in zip(batch, payload):
                    self._write_one(t, self.model._finalize_instances(
                        (kept, probs, None, points, prob_map, labels)))
            except Exception as e:
                self.errors.append(e)
                with self._cond:
                    self._cond.notify_all()   # wake gated track writers


@functools.lru_cache(maxsize=8)
def _sharded_members_cache(mesh, beta, lambda_, k_points, max_iteration,
                           m_step_refine):
    """One jitted sharded member fan-out per (mesh, statics) — a fresh
    jit object per volume would retrace every call."""
    from ..parallel.ensemble import make_sharded_ensemble_members
    return make_sharded_ensemble_members(
        mesh, beta=beta, lambda_=lambda_, k_points=k_points,
        max_iteration=max_iteration, m_step_refine=m_step_refine)


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
                    mesh=None,
                    volume_ready=None,
                    ) -> Dict[int, np.ndarray]:
    """Track all volumes; returns {t: real coordinates}.

    Requires ``seg/coords*.npy`` + ``seg/prob*.npy`` to exist (run
    ``engine.stardist.predict_and_save`` first) and the proofed vol-1 labels
    at ``manual_vol1_glob``.

    ``mesh``: optional ``jax.sharding.Mesh`` — in ensemble mode the member
    fan-out is sharded over its ``"data"`` axis (members padded to an
    axis multiple; the exact trimmed mean runs over the real members
    after the XLA all-gather).  Single mode ignores it (the recurrence is
    serial; scale-out there is over tiles/volumes, see parallel/).

    ``volume_ready``: optional ``fn(t)`` the artifact prefetcher calls
    (and blocks on) before reading volume t's seg artifacts — lets
    :func:`segment_and_track` start tracking while segmentation is still
    writing later volumes.
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
    # dispatches predict + correction for t+1 while the saver threads
    # fetch volume t's labels/coords and write TIFF/npy/figures — the
    # TPU never waits on codecs or device->host latency.
    saver = _AsyncTrackSaver(transformer, tracker, images_path, save_figures)
    errors = saver.errors

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
        if volume_ready is not None:
            volume_ready(t2)
        prob = transformer.tree.load_seg_prob(t2).astype(np.float16)
        if config.ensemble:
            return prob, None, None
        p1, m1 = _pad_real(transformer.tree.load_seg_coords(prev_of[t2]))
        p2, m2 = _pad_real(transformer.tree.load_seg_coords(t2))
        return prob, np.stack([p1, p2]), np.stack([m1, m2])

    prefetcher = VolumePrefetcher(
        _load_inputs,
        [t for t in range(t_min + 1, t_max + 1) if t not in miss],
        depth=2, workers=2)
    prob_iter = iter(prefetcher)
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
                if volume_ready is not None:
                    # the main loop reads seg/coords for t2 directly below
                    # (the single-mode loop only reads through the gated
                    # prefetcher) — block until the concurrent segmenter
                    # has written volume t2's artifacts
                    volume_ready(t2)
                from ..parallel.ensemble import (
                    ensemble_member_predictions, pad_members)
                from ..ops.trim import trim_mean
                t1s = get_volumes_list(t2, tracker.miss_frame,
                                       config.sampling_number,
                                       config.adjacent, t_min)
                confirmed_list = [
                    np.asarray((transformer.coord_vol1 if t1 == t_min
                                else corrected_by_t[t1]).real)
                    for t1 in t1s]
                seg1s, mask1s = zip(*[
                    tracker._pad_np(np.asarray(
                        tracker._get_segmented_pos(t1).real))
                    for t1 in t1s])
                seg2, mask2 = tracker._pad(np.asarray(
                    tracker._get_segmented_pos(t2).real))
                # pad the member axis to a CONSTANT so the fan-out program
                # compiles ONCE: the reference volumes ramp
                # 1..sampling_number over the first volumes, and a
                # per-count jit would recompile the big program for every
                # distinct count (10-30 s each through a remote link).
                # The trimmed mean runs over the REAL members only (a
                # trim over repeated padding members biases the combine).
                e_pad = max(int(config.sampling_number),
                            len(confirmed_list))
                if mesh is not None:
                    axis = int(mesh.shape["data"])
                    e_pad = -(-e_pad // axis) * axis
                conf_p, n_real = pad_members(confirmed_list, e_pad)
                seg1_p, _ = pad_members(list(seg1s), e_pad)
                mask1_p, _ = pad_members(list(mask1s), e_pad)
                if mesh is not None:
                    sharded = _sharded_members_cache(
                        mesh, config.beta, config.lambda_,
                        config.k_neighbors, config.max_iteration,
                        config.m_step_refine)
                    preds = sharded(
                        tracker.ffn_params, tracker.ffn_state,
                        jnp.asarray(conf_p), jnp.asarray(seg1_p),
                        jnp.asarray(mask1_p), seg2, mask2)
                else:
                    preds = ensemble_member_predictions(
                        tracker.ffn_params, tracker.ffn_state,
                        conf_p, seg1_p, mask1_p, seg2, mask2,
                        beta=config.beta, lambda_=config.lambda_,
                        k_points=config.k_neighbors,
                        max_iteration=config.max_iteration,
                        m_step_refine=config.m_step_refine)
                combined = trim_mean(preds[:n_real],
                                     config.trim_proportion, axis=0)
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
                        k_points=config.k_neighbors,
                        max_iteration=config.max_iteration,
                        prob_grid=grid_t, labels_u8=labels_u8,
                        m_step_refine=config.m_step_refine)
                corrected = Coordinates(
                    corrected_raw, transformer.interpolation_factor,
                    tuple(transformer.voxel_size))
            saver.put(t2, corrected, labels_dev, coords_t1.real)
            corrected_by_t[t2] = corrected
            coords_t1 = corrected
            if errors:
                raise errors[0]
            if verbose:
                print(f"tracked t={t2}/{t_max}", end="\r")
    finally:
        # stop the prefetch workers first (an early error path would
        # otherwise leave one blocked on the bounded queue, pinning its
        # in-flight volumes for the life of the process)
        prefetcher.close()
        saver.close()
    if errors:
        raise errors[0]
    for t2, c in corrected_by_t.items():
        coords_by_t[t2] = np.asarray(c.real)
    if verbose:
        print()
        print(timer.summary())
    return coords_by_t
