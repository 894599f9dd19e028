"""Legacy (v0.4) ``Tracker`` facade — the U-Net generation of the API.

API-compatible rebuild of the monolithic ``Tracker(Segmentation, Draw)``
(``tracker.py:779-1551``) over the new TPU stack: same folder conventions
(``Paths.make_folders`` tracker.py:738-753), displacement/coordinate
``History``, miss-frame skipping, single/ensemble modes with the 5-rep
beta-annealed FFN + PR-GLS fit, replayed motion (C, beta, intermediates),
boundary-cell persistence semantics, legacy accurate correction weighted by
U-Net probability + raw intensity, and CSV export.

Deliberate internal differences (documented, results-equivalent in the
default mode):
- label synthesis uses the atlas scatter (overlaps accumulate then zero at
  mask > 1) instead of last-write-wins pasting — downstream both paths zero
  overlaps before use (tracker.py:1322, 1395);
- cells pushed partially outside the canvas are clipped instead of dropped
  (tracker.py:1375-1376 skips them) — boundary flagging removes them first
  in practice.
Construct with ``paste_mode="reference"`` for byte-level parity on both
points (last-write-wins ids + drop out-of-range cells; see
``ops/subregions.py`` move_cells_* overlap_mode/out_of_range).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ffn import FFN
from ..models.unet3d import UNet3D, get_unet
from ..config import SegmentationConfig
from ..ops.connected import label_components_values
from ..ops.knn import knn_feature_vectors
from ..ops.matching import legacy_init_match
from ..ops.prgls import gaussian_gram, pr_gls_quick
from ..ops.segment_reduce import center_of_mass
from ..ops.subregions import build_subregion_atlas, move_cells_sampled
from ..ops.trim import trim_mean
from ..ops.watershed import recalculate_cell_boundaries
from ..models.ffn import ffn_pair_scores
from ..utils.checkpoint import load_pytree, save_pytree
from .segmentation import UNetSegmenter
from ..io.imageio import load_image, read_image_ts, save_label_slices

REP_NUM_PRGLS = 5          # tracker.py:45
REP_NUM_CORRECTION = 20    # tracker.py:46
BOUNDARY_XY = 6            # tracker.py:47
K_POINTS = 20

import functools


@functools.partial(jax.jit, static_argnames=("rep", "max_iteration",
                                             "k_points"))
def legacy_fit_and_predict(ffn_params, ffn_state,
                           inter0: jax.Array, inter_mask: jax.Array,
                           tgt: jax.Array, tgt_mask: jax.Array,
                           tracked0: jax.Array,
                           beta0: float, lambda_: float,
                           rep: int = REP_NUM_PRGLS,
                           max_iteration: int = 20,
                           k_points: int = K_POINTS):
    """The legacy per-source prediction — ``rep`` x (FFN matching + v0.4
    PR-GLS fit) interleaved with the motion replay
    (``tracker.py:1224-1289``) — as ONE device program over PADDED point
    sets.

    The reference (and the host-loop methods below) dispatches ~8 device
    calls and ~3 fetches per rep; through a remote TPU link each RPC
    costs ~50-100 ms, so a 5-rep fit pays ~2-4 s of pure latency per
    source volume.  Fused + padded (one static shape -> one compile for
    the whole recording), the same work is one dispatch.

    Returns (pred (n_t0, 3), inters (rep, M, 3), Cs (rep, 3, M)) — the
    stacks replay the per-rep frames for diagnostics/draw.
    """
    ffn_state = jax.tree_util.tree_map(jnp.asarray, ffn_state)
    feats_t = knn_feature_vectors(tgt, tgt_mask, k_points)
    inter = inter0
    pred = tracked0.astype(jnp.float32)
    inters, cs = [], []
    for i in range(rep):
        beta_i = beta0 * (0.8 ** i)
        feats_r = knn_feature_vectors(inter, inter_mask, k_points)
        corr = ffn_pair_scores(ffn_params, ffn_state, feats_r, feats_t)
        res = pr_gls_quick(inter, tgt, corr, beta=beta_i,
                           max_iteration=max_iteration, lambda_=lambda_,
                           ref_mask=inter_mask, tgt_mask=tgt_mask)
        gram = gaussian_gram(pred, inter, beta_i ** 2)
        gram = jnp.where(inter_mask[None, :], gram, 0.0)
        inters.append(inter)
        cs.append(res.coefficients)
        pred = pred + gram @ res.coefficients.T
        inter = res.moved_ref
    return pred, jnp.stack(inters), jnp.stack(cs)


@functools.partial(jax.jit, static_argnames=(
    "rep", "max_iteration", "k_points"))
def legacy_fit_members(ffn_params, ffn_state,
                       inter0_stack, inter_masks,
                       tgt, tgt_mask, tracked0_stack,
                       beta0: float, lambda_: float,
                       rep: int = REP_NUM_PRGLS,
                       max_iteration: int = 20,
                       k_points: int = K_POINTS):
    """All ensemble source volumes in one dispatch (vmapped members,
    ``tracker.py:1502-1507``); returns the (E, n_t0, 3) per-member
    predictions.  The caller pads E to a CONSTANT (the configured
    ensemble size) by repeating a member and trims over the real rows on
    host — early volumes have fewer reference volumes than the ensemble
    size, and letting E vary would recompile the program per count
    (measured: two in-loop remote compiles made the ensemble path 2x
    SLOWER than the host loop)."""
    def member(inter0, mask, tracked0):
        pred, _, _ = legacy_fit_and_predict(
            ffn_params, ffn_state, inter0, mask, tgt, tgt_mask, tracked0,
            beta0, lambda_, rep=rep, max_iteration=max_iteration,
            k_points=k_points)
        return pred

    return jax.vmap(member)(inter0_stack, inter_masks, tracked0_stack)


@functools.partial(jax.jit, static_argnames=(
    "max_repetition", "overlap_mode", "out_of_range", "render",
    "labels_u8"))
def legacy_correction_and_render(atlas, weights: jax.Array,
                                 i_disp0: jax.Array, include: jax.Array,
                                 tracked_t0_real: jax.Array,
                                 z_xy_ratio: float, z_scaling: float,
                                 max_repetition: int = REP_NUM_CORRECTION,
                                 overlap_mode: str = "add",
                                 out_of_range: str = "clip",
                                 render: bool = True,
                                 labels_u8: bool = False):
    """The legacy accurate-correction fixed point
    (``tracker.py:1177-1191, 1310-1348``) plus the final
    ``_transform_motion_to_image`` (:1391-1400) as ONE device program:
    <=20 x (paste + weighted center-of-mass + rint) in a
    ``lax.while_loop``, then the label render + boundary recalculation.

    Returns (r_disp (n, 3), i_disp (n, 3) int32, tracked_labels) —
    labels only when ``render`` (int32 (x, y, z); uint8 when
    ``labels_u8``, valid for <=255 cells — quarters the d2h transfer
    through a remote link).

    ``weights`` may arrive float16 (half the h2d bytes — the U-Net
    probability + normalized intensity sum needs ~3 decimal digits);
    accumulation runs f32 on device either way."""
    weights = weights.astype(jnp.float32)
    n_t0 = atlas.n_cells
    zr = jnp.float32(z_xy_ratio)
    zs = jnp.float32(z_scaling)
    to_layer = jnp.stack([jnp.float32(1), jnp.float32(1), 1.0 / zr])
    to_interp = jnp.stack([jnp.float32(1), jnp.float32(1), zs / zr])

    def once(i_disp):
        labels, overlap = move_cells_sampled(
            atlas, i_disp, include, overlap_mode=overlap_mode,
            out_of_range=out_of_range)
        markers = jnp.where(overlap > 1, 0, labels)
        centers = center_of_mass(weights, markers, n_t0)
        l_moved = tracked_t0_real * to_layer + \
            i_disp.astype(jnp.float32) * jnp.stack(
                [jnp.float32(1), jnp.float32(1), 1.0 / zs])
        lost = jnp.isnan(centers[:, 0])
        corr = jnp.where(lost[:, None], 0.0, centers - l_moved)
        corr = corr * jnp.stack([jnp.float32(1), jnp.float32(1), zr])
        r_disp = i_disp.astype(jnp.float32) * jnp.stack(
            [jnp.float32(1), jnp.float32(1), zr / zs]) + corr
        i_new = jnp.rint(r_disp * to_interp).astype(jnp.int32)
        metric = jnp.max(jnp.abs(corr * to_interp))
        return r_disp, i_new, metric

    def body(carry):
        i_disp, _, it, _ = carry
        r_disp, i_new, metric = once(i_disp)
        return i_new, r_disp, it + 1, metric

    def cond(carry):
        _, _, it, metric = carry
        return (it < max_repetition) & (metric >= 0.5)

    i_disp, r_disp, _, _ = jax.lax.while_loop(
        cond, body, (i_disp0.astype(jnp.int32),
                     jnp.zeros_like(tracked_t0_real, jnp.float32),
                     jnp.int32(0), jnp.float32(jnp.inf)))
    if not render:
        return r_disp, i_disp, None
    labels, overlap = move_cells_sampled(
        atlas, i_disp, include, overlap_mode=overlap_mode,
        out_of_range=out_of_range)
    labels = jnp.where(overlap > 1, 0, labels)
    tracked = recalculate_cell_boundaries(labels, overlap)
    if labels_u8:
        tracked = tracked.astype(jnp.uint8)
    return r_disp, i_disp, tracked


def get_tracking_path(adjacent: bool, ensemble, folder_path: str) -> str:
    """tracker.py:90-110."""
    if not ensemble:
        return os.path.join(folder_path, "track_results_SingleMode/")
    elif adjacent:
        return os.path.join(folder_path, "track_results_EnsembleAdjctMode/")
    return os.path.join(folder_path, "track_results_EnsembleDstrbtMode/")


def get_reference_vols(ensemble, vol: int, adjacent: bool = False
                       ) -> List[int]:
    """track.py:575-610: source volumes for single/ensemble prediction."""
    if not ensemble:
        return [vol - 1]
    if vol - 1 < ensemble:
        return list(range(1, vol))
    if adjacent:
        return list(range(vol - ensemble, vol))
    return get_remote_vols(ensemble, vol)


def get_remote_vols(ensemble, vol: int) -> List[int]:
    """track.py: evenly distributed historic volumes."""
    interval = (vol - 1) // ensemble
    start = np.mod(vol - 1, ensemble) + 1
    return list(range(start, vol - interval + 1, interval))


class Paths:
    """tracker.py:687-753 folder conventions."""

    def __init__(self, folder_path, image_name, unet_model_file,
                 ffn_model_file):
        self.folder = folder_path
        self.image_name = image_name
        self.unet_model_file = unet_model_file
        self.ffn_model_file = ffn_model_file

    def make_folders(self, adjacent, ensemble):
        fp = self.folder
        mk = lambda p: (os.makedirs(p, exist_ok=True), p)[1]
        self.raw_image = mk(os.path.join(fp, "data/"))
        self.auto_segmentation_vol1 = mk(os.path.join(fp, "auto_vol1/"))
        self.manual_segmentation_vol1 = mk(os.path.join(fp, "manual_vol1/"))
        self.track_information = mk(os.path.join(fp, "track_information/"))
        self.models = mk(os.path.join(fp, "models/"))
        self.unet_cache = mk(os.path.join(fp, "unet_cache/"))
        self.track_results = mk(get_tracking_path(adjacent, ensemble, fp))
        self.anim = mk(os.path.join(fp, "anim/"))
        self.unet_weights = mk(os.path.join(self.models, "unet_weights/"))


class History:
    """tracker.py:756-776."""

    def __init__(self):
        self.r_displacements: List[np.ndarray] = []
        self.r_segmented_coordinates: List[np.ndarray] = []
        self.r_tracked_coordinates: List[np.ndarray] = []
        self.anim: List = []


class Tracker:
    """Legacy orchestrator (tracker.py:779-1551) over the TPU stack."""

    def __init__(self, volume_num, siz_xyz: tuple, z_xy_ratio, z_scaling,
                 noise_level, min_size, beta_tk, lambda_tk, maxiter_tk,
                 folder_path, image_name, unet_model_file, ffn_model_file,
                 cell_num=0, ensemble=False, adjacent=False,
                 shrink=(24, 24, 2), miss_frame=None,
                 unet_variant: str = "a", max_cells: int = 512,
                 paste_mode: str = "scatter"):
        self.volume_num = volume_num
        self.x_siz, self.y_siz, self.z_siz = siz_xyz
        self.z_xy_ratio = float(z_xy_ratio)
        self.z_scaling = int(z_scaling)
        self.noise_level = noise_level
        self.min_size = min_size
        self.beta_tk = beta_tk
        self.lambda_tk = lambda_tk
        self.max_iteration = maxiter_tk
        self.cell_num = cell_num
        self.ensemble = ensemble
        self.adjacent = adjacent
        self.shrink = tuple(shrink)
        self.miss_frame = [] if not miss_frame else miss_frame
        self.max_cells = max_cells
        self.paths = Paths(folder_path, image_name, unet_model_file,
                           ffn_model_file)
        self.paths.make_folders(adjacent, ensemble)
        self.history = History()
        self.use_8_bit = True
        self.unet_variant = unet_variant
        self.unet_model: Optional[UNet3D] = None
        self.segmenter: Optional[UNetSegmenter] = None
        self.ffn_params = None
        self.ffn_state = None
        self.cells_on_boundary = None
        self.cell_num_t0 = None
        self.atlas = None
        self.segresult = None
        self.tracked_labels = None
        self.save_figures = False
        # "scatter" (TPU default: overlaps accumulate + clip at canvas) or
        # "reference" (byte-level tracker.py:1366-1389 parity: id-order
        # last-write-wins + drop out-of-range cells)
        if paste_mode not in ("scatter", "reference"):
            raise ValueError(f"paste_mode {paste_mode!r}")
        self._paste_kwargs = (
            dict(overlap_mode="last", out_of_range="drop")
            if paste_mode == "reference" else {})

    # ---- parameter setters (tracker.py:520-550, 889-906) -------------------
    def set_segmentation(self, noise_level=None, min_size=None,
                         del_cache=False):
        changed = False
        if noise_level is not None and noise_level != self.noise_level:
            self.noise_level = noise_level
            changed = True
        if min_size is not None and min_size != self.min_size:
            self.min_size = min_size
            changed = True
        if changed or del_cache:
            for f in os.listdir(self.paths.unet_cache):
                os.remove(os.path.join(self.paths.unet_cache, f))
            print("All files under /unet_cache folder were deleted")
        if changed:
            self._build_segmenter()

    def set_tracking(self, beta_tk, lambda_tk, maxiter_tk):
        if (self.beta_tk, self.lambda_tk, self.max_iteration) == \
                (beta_tk, lambda_tk, maxiter_tk):
            print("Tracking parameters were not modified")
        else:
            self.beta_tk, self.lambda_tk, self.max_iteration = \
                beta_tk, lambda_tk, maxiter_tk
            print(f"Parameters were modified: beta_tk={beta_tk}, "
                  f"lambda_tk={lambda_tk}, maxiter_tk={maxiter_tk}")

    # ---- model loading -------------------------------------------------------
    def _build_segmenter(self):
        cfg = SegmentationConfig(
            noise_level=self.noise_level, min_size=self.min_size,
            cell_num=self.cell_num, z_xy_ratio=self.z_xy_ratio,
            z_scaling=self.z_scaling, shrink=self.shrink)
        self.segmenter = UNetSegmenter(
            self.unet_model, self.unet_params, self.unet_bn_state, cfg,
            (self.x_siz, self.y_siz, self.z_siz), max_cells=self.max_cells)

    def load_unet(self):
        """Load a pretrained U-Net checkpoint — either this framework's
        .npz (TrainingUNet3D) or the reference's Keras .h5
        (``tracker.py:579`` load_model / ``:991`` load_weights), imported
        via ``utils.keras_import``."""
        path = os.path.join(self.paths.models, self.paths.unet_model_file)
        if path.endswith(".h5"):
            from ..utils.keras_import import import_unet3
            self.unet_model, self.unet_params, self.unet_bn_state = \
                import_unet3(path, self.unet_variant)
            # imported host leaves would re-upload per dispatch
            self.unet_params, self.unet_bn_state = jax.tree_util.tree_map(
                jnp.asarray, (self.unet_params, self.unet_bn_state))
        else:
            self.unet_model = get_unet(self.unet_variant)
            template = self.unet_model.init(jax.random.PRNGKey(0))
            self.unet_params, self.unet_bn_state = load_pytree(
                template, path)
        save_pytree((self.unet_params, self.unet_bn_state),
                    os.path.join(self.paths.unet_weights,
                                 "weights_initial.npz"))
        self._build_segmenter()
        print("Loaded the 3D U-Net model")

    def load_unet_arrays(self, model: UNet3D, params, bn_state):
        """In-memory variant for pipelines/tests."""
        self.unet_model = model
        self.unet_params, self.unet_bn_state = params, bn_state
        self._build_segmenter()

    def load_ffn(self):
        """Accepts .npz (this framework) or the reference's Keras .h5
        weights (``tracker.py:1121``, ``ffn.py:211-220``)."""
        path = os.path.join(self.paths.models, self.paths.ffn_model_file)
        if path.endswith(".h5"):
            from ..utils.keras_import import import_ffn
            self.ffn_params, self.ffn_state = jax.tree_util.tree_map(
                jnp.asarray, import_ffn(path))
        else:
            template = FFN().init(jax.random.PRNGKey(0))
            self.ffn_params, self.ffn_state = load_pytree(template, path)
        print("Loaded the FFN model")

    def load_ffn_arrays(self, params, state):
        self.ffn_params, self.ffn_state = params, state

    # ---- segmentation (tracker.py:583-603) -----------------------------------
    def _read_volume(self, vol: int) -> np.ndarray:
        pattern = os.path.join(self.paths.raw_image, self.paths.image_name)
        return read_image_ts(vol, pattern, (1, self.z_siz + 1))

    def _segment(self, vol: int, method: str = "min_size"):
        image_raw = self._read_volume(vol)
        cache = os.path.join(self.paths.unet_cache, "t%06i.npy" % vol)
        result = self.segmenter.segment(image_raw, method=method,
                                        cache_path=cache)
        # mirror the reference's adaptive storage (tracker.py:681-683):
        # segmenting with 'min_size' learns cell_num (enabling the
        # method='cell_num' tracking workflow), and 'cell_num' learns
        # min_size; the segmenter updated its config — sync our attributes
        # so a later _build_segmenter rebuild keeps the learned values
        self.min_size = self.segmenter.config.min_size
        self.cell_num = self.segmenter.config.cell_num
        return result

    def precompute_segmentation(self, volumes=None,
                                prefetch_depth: int = 2) -> None:
        """Prewarm the U-Net cache for all volumes with prefetched input —
        the bulk analogue of the reference's lazy per-volume cache
        (tracker.py:652-669).  Tracking afterwards never touches the
        network."""
        from ..io.prefetch import VolumePrefetcher
        if volumes is None:
            volumes = range(1, self.volume_num + 1)
        loader = VolumePrefetcher(self._read_volume, volumes,
                                  depth=prefetch_depth)
        for vol, image_raw in loader:
            cache = os.path.join(self.paths.unet_cache, "t%06i.npy" % vol)
            self.segmenter.predict_cellregions(image_raw, cache)
            print(f"cached U-Net prediction t={vol}", end="\r")
        print()

    def segment_vol1(self, method="min_size"):
        self.segresult = self._segment(1, method)
        self.r_coordinates_segment_t0 = \
            self.segresult.r_coordinates_segment.copy()
        self.use_8_bit = self.segresult.segmentation_auto.max() <= 255
        save_label_slices(self.segresult.segmentation_auto,
                          self.paths.auto_segmentation_vol1,
                          "auto_R_t%04i_z%04i.tif", 1, self.use_8_bit)
        print("Segmented volume 1 and saved it")

    # ---- U-Net retraining (tracker.py:923-1044) ------------------------------
    def _remove_2d_boundary(self, labels3d: np.ndarray) -> np.ndarray:
        """Remove x-y boundaries between touching cells (tracker.py:944-962)
        so retraining forces the net to predict boundaries as background."""
        from ..ops.watershed import find_boundaries_outer
        out = labels3d.copy()
        for z in range(out.shape[2]):
            b = np.asarray(find_boundaries_outer(
                jnp.asarray(out[:, :, z]), connectivity=2))
            out[:, :, z][b] = 0
        return out

    def retrain_unet(self, iteration: int = 10,
                     weights_name: str = "unet_weights_retrain_",
                     steps_per_epoch: int = 60, verbose: bool = True):
        """Retrain the U-Net on the vol-1 manual segmentation
        (tracker.py:964-1007): training patches from vol 1 with touching-
        cell x-y boundaries removed; weights saved at every val-loss
        improvement."""
        from ..models.train_unet import TrainingUNet3D
        image_raw_vol1 = self._read_volume(1)
        label_vol1 = (self._remove_2d_boundary(
            self.segmentation_manual_relabels) > 0).astype(np.int32)
        trainer = TrainingUNet3D(
            noise_level=self.noise_level,
            folder_path=Path(self.paths.unet_weights) / "retrain",
            model=self.unet_model)
        trainer.params, trainer.bn_state = load_pytree(
            (trainer.params, trainer.bn_state),
            os.path.join(self.paths.unet_weights, "weights_initial.npz"))
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        trainer.load_dataset_arrays(image_raw_vol1, label_vol1,
                                    image_raw_vol1, label_vol1)
        trainer.preprocess()
        self.val_losses = [trainer.validation_loss()]
        if verbose:
            print("val_loss before retraining:", self.val_losses[0])
        for step in range(1, iteration + 1):
            rng_np = np.random.RandomState(step)
            for _ in range(steps_per_epoch):
                x, y = trainer._train_batch(rng_np)
                trainer.params, trainer.bn_state, trainer.opt_state, _ = \
                    trainer._step(trainer.params, trainer.bn_state,
                                  trainer.opt_state, x,
                                  y.astype(jnp.float32))
            loss = trainer.validation_loss()
            if loss < min(self.val_losses):
                if verbose:
                    print(f"val_loss updated from {min(self.val_losses):.4f}"
                          f" to {loss:.4f}")
                save_pytree((trainer.params, trainer.bn_state),
                            os.path.join(self.paths.unet_weights,
                                         f"{weights_name}step{step}.npz"))
            self.val_losses.append(loss)
        self._retrainer = trainer
        return self.val_losses

    def select_unet_weights(self, step: int,
                            weights_name: str = "unet_weights_retrain_"):
        """Restore retrained (step >= 1) or initial (step == 0) weights
        (tracker.py:1021-1044)."""
        if step == 0:
            path = os.path.join(self.paths.unet_weights,
                                "weights_initial.npz")
        elif step > 0:
            path = os.path.join(self.paths.unet_weights,
                                f"{weights_name}step{step}.npz")
        else:
            raise ValueError("step should be an integer >= 0")
        self.unet_params, self.unet_bn_state = load_pytree(
            (self.unet_params, self.unet_bn_state), path)
        if step > 0:
            save_pytree((self.unet_params, self.unet_bn_state),
                        os.path.join(self.paths.unet_weights,
                                     "unet3_retrained.npz"))
        self._build_segmenter()

    # ---- manual seg + interpolation (tracker.py:908-921, 1046-1112) ----------
    def load_manual_seg(self):
        seg = load_image(self.paths.manual_segmentation_vol1)
        from .transformer import _relabel_sequential_np
        self.segmentation_manual_relabels = _relabel_sequential_np(
            seg.astype(np.int32))
        if self.segmentation_manual_relabels.max() > 255:
            self.use_8_bit = False
        print("Loaded manual _segment at vol 1")

    def interpolate_seg(self):
        """tracker.py:1046-1075 over the new atlas machinery."""
        seg = self.segmentation_manual_relabels
        n0 = int(seg.max())

        atlas0 = self._make_atlas(seg)
        labels, overlap = move_cells_sampled(atlas0,
                                             **self._paste_kwargs)
        smoothed = np.asarray(recalculate_cell_boundaries(labels, overlap))

        corrected = np.asarray(label_components_values(
            jnp.asarray(smoothed), connectivity=3,
            max_labels=max(64, 2 * n0 + 8)))
        if int(corrected.max()) != n0:
            print(f"WARNING: {n0} cells were manually labeled while the "
                  f"program found {int(corrected.max())} separated cells "
                  "and corrected it")
        self.atlas = self._make_atlas(corrected)
        labels, overlap = move_cells_sampled(self.atlas,
                                             **self._paste_kwargs)
        self.segmentation_manual_relabels = np.asarray(
            recalculate_cell_boundaries(labels, overlap))

        save_label_slices(self.segmentation_manual_relabels,
                          self.paths.track_results,
                          "track_results_t%06i_z%04i.tif", 1,
                          self.use_8_bit)
        n = self.atlas.n_cells
        com = np.asarray(center_of_mass(
            jnp.asarray(self.segmentation_manual_relabels > 0, jnp.float32),
            jnp.asarray(self.segmentation_manual_relabels), n))
        self.r_coordinates_tracked_t0 = com * np.array(
            [1.0, 1.0, self.z_xy_ratio])
        self.cell_num_t0 = n

    def _make_atlas(self, seg: np.ndarray):
        from ..ops.segment_reduce import find_objects_bounds
        n = int(seg.max())
        mins, maxs = find_objects_bounds(jnp.asarray(seg), n)
        ext = np.maximum(np.asarray(maxs) - np.asarray(mins) + 1, 1)
        box = tuple(int(b) for b in ext.max(axis=0))
        return build_subregion_atlas(jnp.asarray(seg), n_cells=n,
                                     box_shape=box,
                                     interpolation_factor=self.z_scaling,
                                     smooth_sigma=2.5)

    def cal_subregions(self):
        """tracker.py:1095-1112 — the atlas already holds the padded
        subregions; kept for API compatibility."""
        assert self.atlas is not None, "run interpolate_seg first"

    # ---- tracking core -------------------------------------------------------
    def initiate_tracking(self):
        self.cells_on_boundary = np.zeros(self.cell_num_t0, int)
        self.history.r_displacements = [np.zeros((self.cell_num_t0, 3))]
        self.history.r_segmented_coordinates = [
            self.r_coordinates_segment_t0]
        self.history.r_tracked_coordinates = [self.r_coordinates_tracked_t0]
        self.history.anim = []
        print("Initiated coordinates for tracking (from vol 1)")

    def _initial_matching(self, ref_real: np.ndarray, tgt_real: np.ndarray
                          ) -> np.ndarray:
        """legacy ``initial_matching_quick`` (track.py:117-178): FFN scores
        on UN-normalized real coords."""
        mask_r = jnp.ones(ref_real.shape[0], bool)
        mask_t = jnp.ones(tgt_real.shape[0], bool)
        fr = knn_feature_vectors(jnp.asarray(ref_real, jnp.float32), mask_r,
                                 K_POINTS)
        ft = knn_feature_vectors(jnp.asarray(tgt_real, jnp.float32), mask_t,
                                 K_POINTS)
        return ffn_pair_scores(self.ffn_params, self.ffn_state, fr, ft)

    def _fit_ffn_prgls(self, rep: int, r_coordinates_segment_pre):
        """tracker.py:1224-1267: rep x (FFN + legacy PR-GLS), beta*0.8^i."""
        inter = np.asarray(r_coordinates_segment_pre, np.float32)
        tgt = np.asarray(self.segresult.r_coordinates_segment, np.float32)
        C_t, BETA_t, inter_list = [], [], []
        for i in range(rep):
            inter_list.append(inter.copy())
            corr = self._initial_matching(inter, tgt)
            beta_i = self.beta_tk * (0.8 ** i)
            res = pr_gls_quick(jnp.asarray(inter), jnp.asarray(tgt), corr,
                               beta=beta_i,
                               max_iteration=self.max_iteration,
                               lambda_=self.lambda_tk)
            C_t.append(np.asarray(res.coefficients))
            BETA_t.append(beta_i)
            inter = np.asarray(res.moved_ref)
        return C_t, BETA_t, inter_list

    def _predict_one_rep(self, pred, inter, beta, C):
        """tracker.py:1269-1289: apply stored motion basis to tracked set."""
        gram = np.asarray(gaussian_gram(jnp.asarray(pred, jnp.float32),
                                        jnp.asarray(inter, jnp.float32),
                                        beta ** 2))          # (n_t0, n_auto)
        return pred + gram @ C.T

    def _pad_pts(self, pts: np.ndarray):
        """Pad to the static ``max_cells`` shape (parked far) + mask, so
        the fused legacy programs compile once per recording."""
        n = pts.shape[0]
        if n > self.max_cells:
            raise ValueError(f"{n} cells exceeds max_cells="
                             f"{self.max_cells}")
        out = np.full((self.max_cells, 3), 1e6, np.float32)
        out[:n] = pts
        mask = np.zeros((self.max_cells,), bool)
        mask[:n] = True
        return out, mask

    def _fused_predict_inputs(self, source_volume: int):
        inter0, m1 = self._pad_pts(np.asarray(
            self.history.r_segmented_coordinates[source_volume - 1],
            np.float32))
        tracked0 = np.asarray(
            self.history.r_tracked_coordinates[source_volume - 1],
            np.float32)
        return inter0, m1, tracked0

    def _predict_pos_once(self, source_volume: int, draw: bool = False):
        """One fused device dispatch (``legacy_fit_and_predict``) instead
        of the reference's ~8 calls + 3 fetches per rep
        (tracker.py:1193-1289); the host-loop building blocks above stay
        for step-by-step/notebook use."""
        inter0, m1, tracked0 = self._fused_predict_inputs(source_volume)
        tgt, m2 = self._pad_pts(np.asarray(
            self.segresult.r_coordinates_segment, np.float32))
        pred_dev, inters_dev, cs_dev = legacy_fit_and_predict(
            self.ffn_params, self.ffn_state, inter0, m1, tgt, m2,
            tracked0, self.beta_tk, self.lambda_tk,
            rep=REP_NUM_PRGLS, max_iteration=self.max_iteration)
        if not draw:
            return np.asarray(jax.device_get(pred_dev), np.float64), None
        pred, inters, cs = jax.device_get((pred_dev, inters_dev, cs_dev))
        frames = self._replay_rep_frames(tracked0, m1, inters, cs)
        anim = None
        try:
            from ..viz import ffn_prgls_animation
            anim = ffn_prgls_animation(
                frames, self.segresult.r_coordinates_segment)
        except Exception as e:
            print(f"animation skipped: {e}")
        return np.asarray(pred, np.float64), anim

    def _replay_rep_frames(self, tracked0, m1, inters, cs):
        """Rebuild the per-rep (pre, post) coordinate pairs of the 5-rep
        beta-annealed prediction on host from the fused fit's replay
        stacks (tracker.py:1205-1215 does the same replay inline)."""
        frames = []
        p = np.asarray(tracked0, np.float64)
        for i in range(REP_NUM_PRGLS):
            beta_i = self.beta_tk * (0.8 ** i)
            pre = p
            p = self._predict_one_rep(p, inters[i][m1], beta_i,
                                      cs[i][:, m1])
            frames.append((pre, p))
        return frames

    def draw_prediction_grid(self, target_volume: int, method="min_size",
                             segresult=None, path: Optional[str] = None):
        """Static per-rep diagnostic grid of the FFN + PR-GLS prediction
        (``tracker.py:265-279`` ``_draw_transformation`` frames, laid out
        as a grid instead of the animation): one ROW per reference volume
        (a single row in single mode; every ensemble member in ensemble
        mode, ``tracker.py:1502-1507``), one COLUMN per beta-annealing
        rep.  ``segresult`` as in :meth:`match`.  Returns the figure."""
        if target_volume in self.miss_frame:
            raise ValueError("target_volume is a miss_frame")
        self.segresult = segresult if segresult is not None else \
            self._segment(target_volume, method)
        source_vols = get_reference_vols(self.ensemble, target_volume,
                                         adjacent=self.adjacent)
        tgt, m2 = self._pad_pts(np.asarray(
            self.segresult.r_coordinates_segment, np.float32))
        member_frames = []
        for sv in source_vols:
            inter0, m1, tracked0 = self._fused_predict_inputs(sv)
            _, inters_dev, cs_dev = legacy_fit_and_predict(
                self.ffn_params, self.ffn_state, inter0, m1, tgt, m2,
                tracked0, self.beta_tk, self.lambda_tk,
                rep=REP_NUM_PRGLS, max_iteration=self.max_iteration)
            inters, cs = jax.device_get((inters_dev, cs_dev))
            member_frames.append(self._replay_rep_frames(
                tracked0, m1, inters, cs))
        from ..viz import ffn_prgls_grid
        return ffn_prgls_grid(
            member_frames, self.segresult.r_coordinates_segment,
            member_labels=[f"from vol {sv}" for sv in source_vols],
            path=path)

    def _get_cells_onBoundary(self, r_coords, ensemble):
        """tracker.py:1291-1308."""
        b = 0 if ensemble else BOUNDARY_XY
        return np.where(
            (r_coords[:, 0] < b) | (r_coords[:, 1] < b)
            | (r_coords[:, 0] > self.x_siz - b)
            | (r_coords[:, 1] > self.y_siz - b)
            | (r_coords[:, 2] / self.z_xy_ratio < 0)
            | (r_coords[:, 2] / self.z_xy_ratio > self.z_siz))[0]

    # ---- legacy accurate correction (tracker.py:1177-1413) -------------------
    def _correction_once_interp(self, i_disp_from_vol1, cell_on_bound):
        include = jnp.asarray(cell_on_bound == 0)
        labels, overlap = move_cells_sampled(
            self.atlas, jnp.asarray(i_disp_from_vol1, jnp.int32), include,
            **self._paste_kwargs)
        markers = jnp.where(overlap > 1, 0, labels)
        weights = jnp.asarray(
            self.segresult.image_cell_bg + self.segresult.image_gcn,
            jnp.float32)
        centers = np.asarray(center_of_mass(weights, markers,
                                            self.cell_num_t0))
        l_coords_moved = self.r_coordinates_tracked_t0 * \
            np.array([1, 1, 1 / self.z_xy_ratio]) + \
            i_disp_from_vol1 * np.array([1, 1, 1 / self.z_scaling])
        lost = np.isnan(centers[:, 0])
        corr = centers - l_coords_moved
        corr[lost, :] = 0
        corr[:, 2] *= self.z_xy_ratio
        r_disp = i_disp_from_vol1 * np.array(
            [1, 1, self.z_xy_ratio / self.z_scaling]) + corr
        i_disp_new = np.rint(r_disp * np.array(
            [1, 1, self.z_scaling / self.z_xy_ratio])).astype(int)
        return r_disp, i_disp_new, corr

    def _evaluate_correction(self, r_disp_correction):
        """tracker.py:1402-1413."""
        t = r_disp_correction.copy()
        t[:, 2] *= self.z_scaling / self.z_xy_ratio
        return np.nanmax(np.abs(t)) < 0.5

    def _seed_displacements(self, r_coor_predicted):
        """Displacement seed from the prediction (tracker.py:1496-1500):
        accumulated real displacement plus this volume's predicted move,
        rounded to the interpolated-image integer grid."""
        r_disp = self.history.r_displacements[-1] + \
            (r_coor_predicted - self.history.r_tracked_coordinates[-1])
        i_disp = np.rint(r_disp * np.array(
            [1, 1, self.z_scaling / self.z_xy_ratio])).astype(np.int32)
        return r_disp, i_disp

    def _dispatch_fused_correction(self, r_coor_predicted, include,
                                   render=True, labels_u8=False):
        """Seed + ONE fused correction/render dispatch (shared by
        :meth:`match` and :meth:`track_one_vol`): replaces the <=20 x
        (paste + center-of-mass) round trips of tracker.py:1177-1413.
        The weight map rides h2d as f16 (accumulation is f32 on device).
        Returns device handles."""
        _, i_disp0 = self._seed_displacements(r_coor_predicted)
        weights = np.asarray(
            self.segresult.image_cell_bg + self.segresult.image_gcn,
            np.float16)
        return legacy_correction_and_render(
            self.atlas, weights, i_disp0, include,
            np.asarray(self.r_coordinates_tracked_t0, np.float32),
            self.z_xy_ratio, self.z_scaling,
            max_repetition=REP_NUM_CORRECTION, render=render,
            labels_u8=labels_u8, **self._paste_kwargs)

    def _accurate_correction(self, cells_on_boundary_local,
                             r_coor_predicted):
        _, i_disp = self._seed_displacements(r_coor_predicted)
        for i in range(REP_NUM_CORRECTION):
            r_disp, i_disp, corr = self._correction_once_interp(
                i_disp, cells_on_boundary_local)
            if i == REP_NUM_CORRECTION - 1 or \
                    self._evaluate_correction(corr):
                break
        return r_disp, i_disp

    def _transform_motion_to_image(self, cells_on_boundary_local, i_disp):
        include = jnp.asarray(cells_on_boundary_local == 0)
        labels, overlap = move_cells_sampled(
            self.atlas, jnp.asarray(i_disp, jnp.int32), include,
            **self._paste_kwargs)
        labels = jnp.where(overlap > 1, 0, labels)
        return np.asarray(recalculate_cell_boundaries(labels, overlap))

    # ---- inspection figures (tracker.py:281-332) ------------------------------
    def draw_correction(self, i_disp_from_vol1_updated, r_coor_predicted):
        """Accurate-correction arrows over the cell regions
        (tracker.py:281-314)."""
        from ..viz import draw_correction
        to_layer = np.array([1.0, 1.0, 1.0 / self.z_xy_ratio])
        corrected = (self.r_coordinates_tracked_t0 * to_layer
                     + np.asarray(i_disp_from_vol1_updated)
                     * np.array([1.0, 1.0, 1.0 / self.z_scaling]))
        return draw_correction(
            self.segresult.image_cell_bg,
            np.asarray(r_coor_predicted) * to_layer,
            self.segresult.r_coordinates_segment * to_layer,
            corrected, z_xy_ratio=self.z_xy_ratio)

    def draw_overlapping(self, cells_on_boundary_local, volume2,
                         i_disp_from_vol1_updated):
        """Move the cells by the current displacements, update
        ``tracked_labels``, and draw the before/after label overlay
        (tracker.py:316-390): both panels show the CURRENT volume's
        thresholded cell regions in gray; "before" overlays the constant
        vol-1 interpolated labels (``_draw_before_matching``), "after"
        overlays the freshly moved tracked labels."""
        from ..viz import draw_overlapping
        self.tracked_labels = self._transform_motion_to_image(
            cells_on_boundary_local, i_disp_from_vol1_updated)
        return draw_overlapping(
            np.asarray(self.segresult.image_cell_bg) > 0.5,
            self.segmentation_manual_relabels, self.tracked_labels,
            z_xy_ratio=self.z_xy_ratio, volume2=volume2)

    def draw_segresult(self, percentile_high=99.9):
        """Raw image / U-Net cell regions / auto segmentation as a per-z
        animation, leaving the max projections on the figure
        (tracker.py:212-252)."""
        import matplotlib.pyplot as plt
        from matplotlib import animation

        from ..viz import lbl_cmap
        s = self.segresult
        fig, axs = plt.subplots(1, 3, figsize=(21, 7))
        axs[0].set_title("Raw image (gcn)")
        axs[1].set_title("Cell regions by U-Net")
        axs[2].set_title("Auto-segmentation")
        gcn = np.asarray(s.image_gcn)
        regions = np.asarray(s.image_cell_bg) > 0.5
        auto = np.asarray(s.segmentation_auto).astype(np.int64)
        vmax = np.percentile(gcn, percentile_high)
        vmin = np.percentile(gcn, 10)
        ncol = len(lbl_cmap.colors)
        frames = []
        for z in range(self.z_siz):
            o1 = axs[0].imshow(gcn[:, :, z], vmin=vmin, vmax=vmax,
                               cmap="gray", animated=True)
            o2 = axs[1].imshow(regions[:, :, z], cmap="gray", animated=True)
            o3 = axs[2].imshow(auto[:, :, z] % ncol, cmap=lbl_cmap,
                               interpolation="none", animated=True)
            frames.append([o1, o2, o3])
        anim = animation.ArtistAnimation(fig, frames, interval=200)
        axs[0].imshow(np.max(gcn, axis=2), vmin=vmin, vmax=vmax,
                      cmap="gray")
        axs[1].imshow(np.max(regions, axis=2), cmap="gray")
        axs[2].imshow(np.max(auto, axis=2) % ncol, cmap=lbl_cmap,
                      interpolation="none")
        print("Segmentation results (max projection):")
        return anim

    def draw_manual_seg1(self):
        """U-Net cell regions vs the interpolated manual segmentation,
        max projection (tracker.py:254-262).  Run after
        :meth:`interpolate_seg`."""
        import matplotlib.pyplot as plt

        from ..viz import lbl_cmap
        fig, ax = plt.subplots(1, 2, figsize=(14, 7))
        ax[0].imshow(np.max(np.asarray(self.segresult.image_cell_bg),
                            axis=2) > 0.5, cmap="gray")
        ax[0].set_title("Cell regions by U-Net")
        ncol = len(lbl_cmap.colors)
        ax[1].imshow(np.max(self.segmentation_manual_relabels.astype(
            np.int64), axis=2) % ncol, cmap=lbl_cmap, interpolation="none")
        ax[1].set_title("Interpolated manual segmentation at vol 1")
        return fig

    def subplots_tracking(self):
        """(3, 2) tracking-process figure layout (tracker.py:430-441)."""
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(
            3, 2, figsize=(14, max(int(21 * self.x_siz / self.y_siz), 7)))
        ax = (axs[0, 0], axs[0, 1], axs[1, 0], axs[1, 1],
              axs[2, 0], axs[2, 1])
        return fig, ax

    # ---- public tracking API --------------------------------------------------
    def match(self, target_volume: int, method="min_size", segresult=None):
        """tracker.py:1138-1175.  ``segresult`` injects a precomputed
        segmentation (parity harnesses / pipelines that segment
        elsewhere); default segments from the raw images on disk."""
        if target_volume in self.miss_frame:
            raise ValueError("target_volume is a miss_frame")
        self.segresult = segresult if segresult is not None else \
            self._segment(target_volume, method)
        r_coor_predicted, anim = self._predict_pos_once(source_volume=1,
                                                        draw=True)
        cells_bd = self._get_cells_onBoundary(r_coor_predicted,
                                              self.ensemble)
        local = self.cells_on_boundary.copy()
        local[cells_bd] = 1
        _, i_disp_dev, _ = self._dispatch_fused_correction(
            r_coor_predicted, (local == 0), render=False)
        i_disp = np.asarray(jax.device_get(i_disp_dev))
        print(f"Matching between vol 1 and vol {target_volume} was "
              "computed")
        return anim, [local, target_volume, i_disp, r_coor_predicted]

    def _reset_tracking_state(self, from_volume):
        assert from_volume >= 2, "from_volume should >= 2"
        current = len(self.history.r_displacements)
        del self.history.r_displacements[from_volume - 1:]
        del self.history.r_segmented_coordinates[from_volume - 1:]
        del self.history.r_tracked_coordinates[from_volume - 1:]
        assert len(self.history.r_displacements) == from_volume - 1, \
            f"Tracked until vol {current}, cannot start from {from_volume}"

    def track(self, from_volume=2, fig=None, ax=None):
        self._reset_tracking_state(from_volume)
        for vol in range(from_volume, self.volume_num + 1):
            self.track_one_vol(vol)

    def track_one_vol(self, target_volume: int, fig=None, axc6=None,
                      method="min_size", segresult=None):
        """tracker.py:1473-1536.  ``fig``/``axc6`` hold the reference's
        positional slots (the live 6-panel redraw — here the figures are
        written by ``save_figures``/:meth:`replay_track_animation`
        instead, so they are accepted and unused to keep ported caller
        code working).  ``segresult`` as in :meth:`match`."""
        if target_volume in self.miss_frame:
            save_label_slices(self.tracked_labels, self.paths.track_results,
                              "track_results_t%06i_z%04i.tif",
                              target_volume, self.use_8_bit)
            self.history.r_displacements.append(
                self.history.r_displacements[-1])
            self.history.r_segmented_coordinates.append(
                self.segresult.r_coordinates_segment)
            self.history.r_tracked_coordinates.append(
                self.r_coordinates_tracked_t0 +
                self.history.r_displacements[-1])
            return

        self.segresult = segresult if segresult is not None else \
            self._segment(target_volume, method)
        source_vols = get_reference_vols(self.ensemble, target_volume,
                                         adjacent=self.adjacent)
        tgt, m2 = self._pad_pts(np.asarray(
            self.segresult.r_coordinates_segment, np.float32))
        if len(source_vols) == 1:
            inter0, m1, tracked0 = self._fused_predict_inputs(
                source_vols[0])
            pred_dev, _, _ = legacy_fit_and_predict(
                self.ffn_params, self.ffn_state, inter0, m1, tgt, m2,
                tracked0, self.beta_tk, self.lambda_tk,
                rep=REP_NUM_PRGLS, max_iteration=self.max_iteration)
            r_coor_mean = np.asarray(jax.device_get(pred_dev),
                                     np.float64)
        else:
            # whole ensemble in one dispatch; member axis padded to the
            # CONSTANT configured size so the program compiles once
            ins = [self._fused_predict_inputs(sv) for sv in source_vols]
            n_real = len(ins)
            e_pad = max(int(self.ensemble), n_real)
            ins = ins + [ins[-1]] * (e_pad - n_real)
            preds_dev = legacy_fit_members(
                self.ffn_params, self.ffn_state,
                np.stack([a for a, _, _ in ins]),
                np.stack([m for _, m, _ in ins]),
                tgt, m2, np.stack([t for _, _, t in ins]),
                self.beta_tk, self.lambda_tk, rep=REP_NUM_PRGLS,
                max_iteration=self.max_iteration)
            preds = np.asarray(jax.device_get(preds_dev),
                               np.float64)[:n_real]
            # scipy.stats.trim_mean semantics (tracker.py:1507)
            k = int(0.1 * n_real)
            r_coor_mean = np.sort(preds, axis=0)[k:n_real - k].mean(axis=0)

        cells_bd = self._get_cells_onBoundary(r_coor_mean, self.ensemble)
        self.cells_on_boundary[cells_bd] = 1

        # rendered labels ride d2h as uint8 when ids fit
        r_disp_dev, i_disp_dev, labels_dev = self._dispatch_fused_correction(
            r_coor_mean, (self.cells_on_boundary == 0),
            labels_u8=bool(self.cell_num_t0 <= 255))
        r_disp, i_disp, labels = jax.device_get(
            (r_disp_dev, i_disp_dev, labels_dev))
        r_disp = np.asarray(r_disp, np.float64)
        self.tracked_labels = np.asarray(labels, np.int32)
        save_label_slices(self.tracked_labels, self.paths.track_results,
                          "track_results_t%06i_z%04i.tif", target_volume,
                          self.use_8_bit)
        if self.save_figures:
            try:
                from ..viz import draw_matching_6panel
                raw = self._read_volume(target_volume)
                draw_matching_6panel(
                    raw, self.tracked_labels, r_coor_mean,
                    self.segresult.r_coordinates_segment,
                    self.history.r_tracked_coordinates[-1],
                    z_xy_ratio=self.z_xy_ratio,
                    path=os.path.join(self.paths.anim,
                                      "track_anim_t%06i.png"
                                      % target_volume))
            except Exception as e:
                print(f"6-panel figure skipped: {e}")
        if self.ensemble:
            # ensemble mode: boundary flags reset (tracker.py:1529-1531)
            self.cells_on_boundary = np.zeros(self.cell_num_t0, int)
        self.history.r_displacements.append(r_disp)
        self.history.r_segmented_coordinates.append(
            self.segresult.r_coordinates_segment)
        self.history.r_tracked_coordinates.append(
            self.r_coordinates_tracked_t0 + r_disp)

    def replay_track_animation(self, from_volume: int = 2):
        """Assemble the saved per-volume anim/ figures (tracker.py:1433-1460);
        requires tracking with ``save_figures=True``."""
        from ..viz import replay_track_animation
        return replay_track_animation(self.paths.anim,
                                      range(from_volume,
                                            self.volume_num + 1))

    def save_coordinates(self):
        """tracker.py:1538-1551."""
        coord = np.asarray(self.history.r_tracked_coordinates)
        t, cell, pos = coord.shape
        table = np.column_stack((
            np.repeat(np.arange(1, t + 1), cell),
            np.tile(np.arange(1, cell + 1), t),
            coord.reshape(t * cell, pos)))
        out = os.path.join(self.paths.track_information,
                           "tracked_coordinates.csv")
        np.savetxt(out, table, delimiter=",",
                   header="cell,t,x(row),y(column),z(interpolated)",
                   comments="")
        print(f"Cell coordinates were stored in {out}")
