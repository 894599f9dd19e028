"""TrackerLite: FFN + PR-GLS tracking over on-disk segmentation artifacts.

Rebuild of the reference's v1.0 tracker (``trackerlite.py:33-201``).  The
per-volume prediction — normalize, kNN features, all-pairs FFN scoring,
greedy matching, PR-GLS with two references, denormalize — is ONE jitted
device function over fixed-shape (padded + masked) point sets, so the whole
recurrence compiles once per recording instead of bouncing through
host NumPy between every stage (reference call stack SURVEY §3.2).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..coordinates import Coordinates
from ..io.artifacts import ResultsTree
from ..io.imageio import load_2d_slices_at_time
from ..models.ffn import FFN, ffn_pair_scores
from ..ops.knn import knn_feature_vectors
from ..ops.matching import simple_match
from ..ops.pointset import normalize_points
from ..ops.prgls import prgls_with_two_ref
from ..ops.segment_reduce import topq_mean_intensity
from ..utils.checkpoint import load_pytree

BETA, LAMBDA, MAX_ITERATION = 3.0, 3.0, 2000   # trackerlite.py:29
K_POINTS = 20                                  # trackerlite.py:30


@functools.partial(jax.jit, static_argnames=("k_points", "max_iteration",
                                             "m_step_refine"))
def track_step(ffn_params, ffn_state,
               confirmed_t1_real: jax.Array,
               seg_t1_real: jax.Array, seg_t1_mask: jax.Array,
               seg_t2_real: jax.Array, seg_t2_mask: jax.Array,
               beta: float = BETA, lambda_: float = LAMBDA,
               k_points: int = K_POINTS,
               max_iteration: int = MAX_ITERATION,
               m_step_refine: int = 0) -> jax.Array:
    """One tracking step (``predict_cell_positions`` trackerlite.py:70-109):
    returns predicted real coordinates of the confirmed set at t2.
    ``m_step_refine``: compensated EM solve (see ``ops.prgls``)."""
    confirmed_norm, (mean, scale) = normalize_points(confirmed_t1_real)
    t1_norm = (seg_t1_real - mean) / scale
    t2_norm = (seg_t2_real - mean) / scale

    feats_t1 = knn_feature_vectors(t1_norm, seg_t1_mask, k_points)
    feats_t2 = knn_feature_vectors(t2_norm, seg_t2_mask, k_points)
    scores = ffn_pair_scores(ffn_params, ffn_state, feats_t1, feats_t2)
    prior, _ = simple_match(scores, threshold=0.1,
                            ref_mask=seg_t1_mask, tgt_mask=seg_t2_mask)
    result = prgls_with_two_ref(
        prior, t2_norm, t1_norm, confirmed_norm,
        beta=beta, lambda_=lambda_, max_iteration=max_iteration,
        tgt_mask=seg_t2_mask, ref_mask=seg_t1_mask,
        m_step_refine=m_step_refine)
    return result.tracked * scale + mean


@functools.partial(jax.jit, static_argnames=("k_points",))
def match_step(ffn_params, ffn_state,
               ref_real: jax.Array, ref_mask: jax.Array,
               tgt_real: jax.Array, tgt_mask: jax.Array,
               k_points: int = K_POINTS):
    """FFN matching preview (``match_by_ffn`` trackerlite.py:127-142):
    returns (score matrix, pair mask)."""
    ref_norm, (mean, scale) = normalize_points(ref_real, ref_mask)
    tgt_norm = (tgt_real - mean) / scale
    feats_ref = knn_feature_vectors(ref_norm, ref_mask, k_points)
    feats_tgt = knn_feature_vectors(tgt_norm, tgt_mask, k_points)
    scores = ffn_pair_scores(ffn_params, ffn_state, feats_ref, feats_tgt)
    _, pairs = simple_match(scores, threshold=0.1,
                            ref_mask=ref_mask, tgt_mask=tgt_mask)
    return scores, pairs


def evenly_distributed_volumes(current_vol: int, sampling_number: int,
                               start_vol: int = 1) -> List[int]:
    """``trackerlite.evenly_distributed_volumes`` (:420-424)."""
    interval = (current_vol - start_vol) // sampling_number
    start = int(np.mod(current_vol - start_vol, sampling_number)) + start_vol
    return list(range(start, current_vol - interval + 1, interval))


def get_volumes_list(current_vol: int, skip_volumes: List[int],
                     sampling_number: int = 20, adjacent: bool = False,
                     start_vol: int = 1) -> List[int]:
    """``trackerlite.get_volumes_list`` (:427-438)."""
    assert current_vol > start_vol, \
        f"current_vol (={current_vol}) should be larger than start_vol"
    if current_vol - start_vol < sampling_number:
        vols = list(range(start_vol, current_vol))
    elif adjacent:
        vols = list(range(current_vol - sampling_number, current_vol))
    else:
        vols = evenly_distributed_volumes(current_vol, sampling_number,
                                          start_vol)
    return [v for v in vols if v not in skip_volumes]


class TrackerLite:
    """See reference ``trackerlite.py:33-68``.

    ``ffn_weights``: path to a ``save_pytree`` .npz of (params, state), or a
    (params, state) tuple directly.
    ``max_cells``: static padding size for segmented point sets (jit once).
    """

    def __init__(self, results_dir: Union[str, Path],
                 ffn_weights,
                 proofed_coords_vol1: Coordinates,
                 miss_frame: Optional[List[int]] = None,
                 max_cells: Optional[int] = None,
                 m_step_refine: int = 0):
        if miss_frame is not None and not isinstance(miss_frame, list):
            raise TypeError(
                f"miss_frame should be a list or None, got {type(miss_frame)}")
        self.tree = ResultsTree(results_dir)
        self.tree.make_dirs()
        self.proofed_coords_vol1 = proofed_coords_vol1
        self.miss_frame = [] if miss_frame is None else miss_frame

        if isinstance(ffn_weights, (str, Path)):
            if str(ffn_weights).endswith(".h5"):
                # reference Keras checkpoint (trackerlite.py:63)
                from ..utils.keras_import import import_ffn
                self.ffn_params, self.ffn_state = import_ffn(ffn_weights)
            else:
                ffn = FFN()
                template = ffn.init(jax.random.PRNGKey(0))
                self.ffn_params, self.ffn_state = load_pytree(
                    template, ffn_weights)
        else:
            self.ffn_params, self.ffn_state = ffn_weights
        # host (numpy) weight leaves — e.g. a Keras import or an
        # in-memory tuple — would re-upload inside EVERY tracking
        # dispatch; pin them on device once
        self.ffn_params, self.ffn_state = jax.tree_util.tree_map(
            jnp.asarray, (self.ffn_params, self.ffn_state))

        n1 = proofed_coords_vol1.cell_num
        self.max_cells = int(max_cells) if max_cells else int(
            np.ceil(n1 * 1.5 / 64) * 64)
        self.m_step_refine = int(m_step_refine)

    # ---- helpers -----------------------------------------------------------
    def _pad_np(self, pts: np.ndarray):
        """Pad a point set to the static ``max_cells`` shape (host arrays).
        THE padding contract — every caller (device or host) goes through
        here so the parking value/mask semantics can never diverge."""
        n = pts.shape[0]
        if n > self.max_cells:
            raise ValueError(
                f"{n} cells exceeds max_cells={self.max_cells}")
        out = np.zeros((self.max_cells, 3), np.float32)
        out[:n] = pts
        # park padding far away so it never enters any kNN neighborhood
        out[n:] = 1e6
        mask = np.zeros(self.max_cells, bool)
        mask[:n] = True
        return out, mask

    def _pad(self, pts: np.ndarray):
        out, mask = self._pad_np(np.asarray(pts))
        return jnp.asarray(out), jnp.asarray(mask)

    def _get_segmented_pos(self, t: int) -> Coordinates:
        """seg/coords*.npy -> Coordinates (``trackerlite.py:144-150``)."""
        return Coordinates.from_raw(
            self.tree.load_seg_coords(t),
            self.proofed_coords_vol1.interpolation_factor,
            self.proofed_coords_vol1.voxel_size)

    # ---- API (trackerlite.py:70-142) ----------------------------------------
    def predict_cell_positions(self, t1: int, t2: int,
                               confirmed_coord_t1: Optional[Coordinates]
                               = None,
                               beta: float = BETA, lambda_: float = LAMBDA,
                               draw_fig: bool = False) -> Coordinates:
        assert t2 not in self.miss_frame
        seg_t1 = self._get_segmented_pos(t1)
        seg_t2 = self._get_segmented_pos(t2)
        if confirmed_coord_t1 is None:
            confirmed_coord_t1 = seg_t1

        p1, m1 = self._pad(np.asarray(seg_t1.real))
        p2, m2 = self._pad(np.asarray(seg_t2.real))
        tracked_real = track_step(
            self.ffn_params, self.ffn_state,
            jnp.asarray(confirmed_coord_t1.real), p1, m1, p2, m2,
            beta=beta, lambda_=lambda_, m_step_refine=self.m_step_refine)
        coords = Coordinates.from_real(
            tracked_real, self.proofed_coords_vol1.interpolation_factor,
            self.proofed_coords_vol1.voxel_size)
        if draw_fig:
            from ..viz import plot_prgls_prediction
            plot_prgls_prediction(np.asarray(confirmed_coord_t1.real),
                                  np.asarray(seg_t2.real),
                                  np.asarray(coords.real), t1, t2)
        return coords

    def predict_cell_positions_ensemble(self, skipped_volumes: List[int],
                                        t2: int, coord_t1: Coordinates,
                                        beta: float = BETA,
                                        lambda_: float = LAMBDA,
                                        sampling_number: int = 20,
                                        adjacent: bool = False,
                                        t_start: int = 1) -> Coordinates:
        """Serial host loop variant (``trackerlite.py:111-125``); the
        device-parallel fan-out lives in ``parallel/ensemble.py``."""
        from ..ops.trim import trim_mean
        preds = []
        for t1 in get_volumes_list(t2, skipped_volumes, sampling_number,
                                   adjacent, t_start):
            loaded = Coordinates.from_real(
                self.tree.load_coords_real(t1),
                coord_t1.interpolation_factor, coord_t1.voxel_size)
            preds.append(np.asarray(self.predict_cell_positions(
                t1=t1, t2=t2, confirmed_coord_t1=loaded, beta=beta,
                lambda_=lambda_).real))
        combined = np.asarray(trim_mean(jnp.asarray(np.stack(preds)), 0.1))
        return Coordinates.from_real(
            combined, self.proofed_coords_vol1.interpolation_factor,
            self.proofed_coords_vol1.voxel_size)

    def match_by_ffn(self, t1: int, t2: int,
                     confirmed_coord_t1: Optional[Coordinates] = None):
        assert t2 not in self.miss_frame
        seg_t1 = self._get_segmented_pos(t1)
        seg_t2 = self._get_segmented_pos(t2)
        if confirmed_coord_t1 is None:
            confirmed_coord_t1 = seg_t1
        pr, mr = self._pad(np.asarray(confirmed_coord_t1.real))
        pt, mt = self._pad(np.asarray(seg_t2.real))
        scores, pairs = match_step(self.ffn_params, self.ffn_state,
                                   pr, mr, pt, mt)
        pairs_px2 = np.argwhere(np.asarray(pairs))[:, [1, 0]]  # (ref, tgt)
        try:
            from ..viz import plot_initial_matching
            plot_initial_matching(np.asarray(confirmed_coord_t1.real),
                                  np.asarray(seg_t2.real), pairs_px2, t1, t2)
        except Exception as e:
            print(f"matching figure skipped: {e}")
        return pairs_px2

    # ---- activities (trackerlite.py:152-201) ---------------------------------
    def activities(self, raw_path, discard_ratio: float = 0.1,
                   do_normalize: bool = False) -> np.ndarray:
        import re
        from glob import glob as _glob
        labels_dir = self.tree.labels_dir
        filenames = _glob(str(labels_dir / "*t*.tif"))
        assert len(filenames) > 0, f"No labels found in {labels_dir}"
        numbers = [int(re.findall(r"t(\d+)", Path(f).name)[0])
                   for f in filenames]
        t_min, t_max = min(numbers), max(numbers)

        activities = None
        cell_num = 0
        for t in range(t_min, t_max + 1):
            try:
                raw = load_2d_slices_at_time(raw_path, t=t,
                                             do_normalize=do_normalize)
            except FileNotFoundError:
                print(f"Warning: raw images at t={t} missing; stopping.")
                break
            try:
                labels = load_2d_slices_at_time(
                    str(labels_dir / "*t%06i*.tif"), t=t, do_normalize=False)
            except FileNotFoundError:
                if t == t_min:
                    print("Warning: no label images; stopping.")
                    break
                print(f"Warning: skip volume {t}")
                activities[t - t_min, :] = np.nan
                continue
            if t == t_min:
                cell_num = int(labels.max())
                activities = np.zeros((t_max - t_min + 1, cell_num))
            activities[t - t_min] = np.asarray(topq_mean_intensity(
                jnp.asarray(raw.astype(np.float32)),
                jnp.asarray(labels.astype(np.int32)),
                cell_num, discard_ratio=discard_ratio))
        return activities
