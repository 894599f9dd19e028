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

from ..config import TrackingConfig
from ..coordinates import Coordinates
from .tracker import TrackerLite, get_volumes_list
from .transformer import CoordsToImageTransformer


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
                    verbose: bool = True
                    ) -> Dict[int, np.ndarray]:
    """Track all volumes; returns {t: real coordinates}.

    Requires ``seg/coords*.npy`` + ``seg/prob*.npy`` to exist (run
    ``engine.stardist.predict_and_save`` first) and the proofed vol-1 labels
    at ``manual_vol1_glob``.
    """
    t_min, t_max = t_range
    transformer = CoordsToImageTransformer(results_dir, voxel_size)
    transformer.load_segmentation(manual_vol1_glob)
    transformer.interpolate(interpolation_factor, t_start=t_min)

    tracker = TrackerLite(results_dir, ffn_weights,
                          transformer.coord_vol1,
                          miss_frame=miss_frame)

    coords_by_t: Dict[int, np.ndarray] = {
        t_min: np.asarray(transformer.coord_vol1.real)}
    coords_t1 = transformer.coord_vol1
    for t2 in range(t_min + 1, t_max + 1):
        if t2 in tracker.miss_frame:
            coords_by_t[t2] = coords_by_t[t2 - 1]
            continue
        if config.ensemble:
            pred = tracker.predict_cell_positions_ensemble(
                tracker.miss_frame, t2, coords_t1,
                beta=config.beta, lambda_=config.lambda_,
                sampling_number=config.sampling_number,
                adjacent=config.adjacent, t_start=t_min)
        else:
            pred = tracker.predict_cell_positions(
                t2 - 1, t2, confirmed_coord_t1=coords_t1,
                beta=config.beta, lambda_=config.lambda_)
        corrected, labels_img = transformer.accurate_correction(
            t2, grid, pred, ensemble=bool(config.ensemble),
            max_repetition=config.max_correction_reps)
        transformer.save_tracking_results(corrected, labels_img, t2,
                                          images_path=images_path)
        if save_figures:
            try:
                from ..viz import save_matching_figure
                seg_t2 = tracker._get_segmented_pos(t2)
                save_matching_figure(
                    transformer.tree, np.asarray(coords_t1.real),
                    np.asarray(seg_t2.real), np.asarray(corrected.real),
                    t2 - 1, t2)
            except Exception as e:
                print(f"figure skipped: {e}")
        coords_by_t[t2] = np.asarray(corrected.real)
        coords_t1 = corrected
        if verbose:
            print(f"tracked t={t2}/{t_max}", end="\r")
    if verbose:
        print()
    return coords_by_t
