"""Evaluation metrics: instance matching, tracking accuracy, threshold
optimization.

The reference relies on external tooling for accuracy numbers (its papers
report cell-matching accuracy; upstream stardist ships
``optimize_thresholds``).  This module makes both first-class:

- ``instance_matching``: IoU-based matching of predicted vs ground-truth
  label volumes (precision / recall / F1 / mean matched IoU), computed with
  one device pass over the volume (pair-count contingency via bincount).
- ``tracking_accuracy``: fraction of tracked positions within a radius of
  their ground-truth trajectory (the BASELINE.json "cell-matching
  accuracy" readout).
- ``optimize_thresholds``: grid-search prob/nms thresholds of a StarDist3D
  model against validation volumes, maximizing F1@IoU (stardist 2_training
  workflow parity).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, granularity: int = 64) -> int:
    """Round a label count up to a bucket so _pair_contingency compiles
    once per bucket instead of once per exact (n_gt, n_pred) pair —
    optimize_thresholds varies n_pred at every grid point, and each
    remote compile costs 10-30 s through a tunneled link."""
    return max(granularity, -(-n // granularity) * granularity)


@functools.partial(jax.jit, static_argnames=("max_gt", "max_pred"))
def _pair_contingency(gt: jax.Array, pred: jax.Array, max_gt: int,
                      max_pred: int):
    """Intersection voxel counts for every (gt, pred) label pair plus per-
    label sizes, in one pass."""
    g = jnp.clip(gt.reshape(-1), 0, max_gt)
    p = jnp.clip(pred.reshape(-1), 0, max_pred)
    pair = g * (max_pred + 1) + p
    inter = jnp.bincount(pair, length=(max_gt + 1) * (max_pred + 1))
    inter = inter.reshape(max_gt + 1, max_pred + 1)
    gt_sizes = jnp.bincount(g, length=max_gt + 1)
    pred_sizes = jnp.bincount(p, length=max_pred + 1)
    return inter, gt_sizes, pred_sizes


def instance_matching(gt_labels: np.ndarray, pred_labels: np.ndarray,
                      iou_thresh: float = 0.5) -> Dict[str, float]:
    """Greedy IoU matching of instances (stardist ``matching`` semantics:
    one-to-one pairs above ``iou_thresh``)."""
    n_gt = int(gt_labels.max())
    n_pred = int(pred_labels.max())
    if n_gt == 0 or n_pred == 0:
        return dict(precision=0.0, recall=0.0, f1=0.0, mean_matched_iou=0.0,
                    tp=0, fp=n_pred, fn=n_gt)
    inter, gt_sizes, pred_sizes = _pair_contingency(
        jnp.asarray(gt_labels), jnp.asarray(pred_labels),
        _bucket(n_gt), _bucket(n_pred))
    inter = np.asarray(inter)[1:n_gt + 1, 1:n_pred + 1].astype(np.float64)
    gs = np.asarray(gt_sizes)[1:n_gt + 1].astype(np.float64)
    ps = np.asarray(pred_sizes)[1:n_pred + 1].astype(np.float64)
    union = gs[:, None] + ps[None, :] - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)

    # greedy one-to-one matching by descending IoU
    tp, matched_iou = 0, []
    used_g = np.zeros(n_gt, bool)
    used_p = np.zeros(n_pred, bool)
    order = np.argsort(-iou, axis=None)
    for flat in order:
        g_i, p_i = divmod(int(flat), n_pred)
        if iou[g_i, p_i] < iou_thresh:
            break
        if used_g[g_i] or used_p[p_i]:
            continue
        used_g[g_i] = used_p[p_i] = True
        tp += 1
        matched_iou.append(iou[g_i, p_i])
    fp = n_pred - tp
    fn = n_gt - tp
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    return dict(precision=precision, recall=recall, f1=f1,
                mean_matched_iou=float(np.mean(matched_iou))
                if matched_iou else 0.0,
                tp=tp, fp=fp, fn=fn)


def tracking_accuracy(tracked_by_t: Dict[int, np.ndarray],
                      truth_by_t: Dict[int, np.ndarray],
                      radius: float = 3.0,
                      assign_at: int = None) -> Dict[str, float]:
    """Fraction of tracked positions within ``radius`` of their true
    trajectory.  Cell identities are assigned ONE-TO-ONE at the first
    common time point by greedy nearest-pair matching (labels can be
    permuted by relabeling) — a plain per-row argmin is non-injective
    and would let a degenerate tracker that collapses every cell onto
    one trajectory score high accuracy."""
    ts = sorted(set(tracked_by_t) & set(truth_by_t))
    if not ts:
        raise ValueError(
            f"tracking_accuracy: no common time point between tracked "
            f"({sorted(tracked_by_t)[:5]}...) and truth "
            f"({sorted(truth_by_t)[:5]}...)")
    t0 = assign_at if assign_at is not None else ts[0]
    if t0 not in tracked_by_t or t0 not in truth_by_t:
        raise ValueError(
            f"tracking_accuracy: assign_at={t0} is not present in both "
            f"trajectory dicts (common time points: {ts[:5]}...)")
    d0 = np.linalg.norm(tracked_by_t[t0][:, None, :]
                        - truth_by_t[t0][None, :, :], axis=2)
    n_tr, n_gt = d0.shape
    assign = np.full(n_tr, -1, int)
    used_gt = np.zeros(n_gt, bool)
    for flat in np.argsort(d0, axis=None):
        i, j = divmod(int(flat), n_gt)
        if assign[i] >= 0 or used_gt[j]:
            continue
        assign[i] = j
        used_gt[j] = True
        if used_gt.all() or (assign >= 0).all():
            break
    # unmatched tracked cells (more tracked than truth) count as errors
    unmatched = assign < 0
    assign = np.where(unmatched, 0, assign)
    correct, total = 0, 0
    per_t = {}
    for t in ts:
        err = np.linalg.norm(tracked_by_t[t] - truth_by_t[t][assign],
                             axis=1)
        ok = (err <= radius) & ~unmatched
        per_t[t] = float(ok.mean())
        correct += int(ok.sum())
        total += err.size
    return dict(accuracy=correct / max(total, 1), per_volume=per_t)


def _instances_from_probdist(model, orig_shape: Tuple[int, ...]):
    """Jitted candidates -> overlap -> NMS -> label-render stage taking a
    precomputed (padded, grid-resolution) backbone output.  Thresholds are
    runtime scalars, so one compile serves the whole grid search."""
    from ..models.stardist3d import sparse_candidates
    from ..ops.nms import (greedy_nms, overlap_matrix,
                           render_polyhedra_labels)

    cfg, rays = model.config, model.rays
    image_shape = tuple(int(s) for s in orig_shape)
    max_candidates, render_box = model.max_candidates, model.render_box

    def stage(prob_g, dist_g, prob_thresh, nms_thresh):
        probs, dists, points, valid = sparse_candidates(
            prob_g, dist_g, cfg.grid, prob_thresh,
            max_candidates=max_candidates)
        valid = (valid
                 & (points[:, 0] < image_shape[0])
                 & (points[:, 1] < image_shape[1])
                 & (points[:, 2] < image_shape[2]))
        centers = points.astype(jnp.float32)
        overlaps = overlap_matrix(centers, dists, rays, valid, prob=probs)
        kept = greedy_nms(probs, overlaps, valid, nms_thresh)
        return render_polyhedra_labels(centers, dists, rays, probs, kept,
                                       image_shape,
                                       render_box).astype(jnp.uint16)

    return jax.jit(stage)


def optimize_thresholds(model, X_val: Sequence[np.ndarray],
                        Y_val: Sequence[np.ndarray],
                        prob_grid: Sequence[float] = (0.3, 0.4, 0.5, 0.6,
                                                      0.7),
                        nms_grid: Sequence[float] = (0.3, 0.4, 0.5),
                        iou_thresh: float = 0.5,
                        verbose: bool = True) -> Tuple[float, float]:
    """Grid-search (prob_thresh, nms_thresh) maximizing mean F1@IoU over
    validation volumes; stores the best pair on the model (the reference
    workflow's ``optimize_thresholds`` step).  Y_val are label volumes in
    the model's (z, y, x) frame.

    The backbone forward runs ONCE per validation volume (its output is
    threshold-independent, like upstream stardist's implementation); only
    the candidate/NMS/render stage re-runs per grid point, with the
    thresholds as runtime scalars (no recompiles)."""
    if len(X_val) == 0 or len(X_val) != len(Y_val):
        raise ValueError(
            f"optimize_thresholds needs matched non-empty X_val/Y_val "
            f"(got {len(X_val)} images, {len(Y_val)} labels)")
    fast = hasattr(model, "_pad_input") and hasattr(model, "_fwd")
    if fast:
        # backbone once per volume; grid-resolution outputs stay device-side
        prob_dist = []
        stages = {}
        for x in X_val:
            padded, orig_shape = model._pad_input(np.asarray(x, np.float32))
            prob_g, dist_g = model._fwd(
                model.params, jnp.asarray(padded)[None, ..., None])
            if orig_shape not in stages:
                stages[orig_shape] = _instances_from_probdist(model,
                                                              orig_shape)
            prob_dist.append((prob_g[0, ..., 0], dist_g[0], orig_shape))

    best = (-1.0, None, None)
    for prob_t in prob_grid:
        for nms_t in nms_grid:
            scores = []
            for i, y in enumerate(Y_val):
                if fast:
                    prob_g, dist_g, orig_shape = prob_dist[i]
                    labels = np.asarray(stages[orig_shape](
                        prob_g, dist_g, np.float32(prob_t),
                        np.float32(nms_t))).astype(np.int32)
                else:       # duck-typed model: full predict per point
                    (labels, _), _ = model.predict_instances(
                        X_val[i], prob_thresh=prob_t, nms_thresh=nms_t)
                scores.append(instance_matching(y, labels,
                                                iou_thresh)["f1"])
            mean_f1 = float(np.mean(scores))
            if verbose:
                print(f"prob={prob_t:.2f} nms={nms_t:.2f} "
                      f"F1@{iou_thresh}={mean_f1:.4f}")
            if mean_f1 > best[0]:
                best = (mean_f1, prob_t, nms_t)
    _, prob_t, nms_t = best
    if prob_t is None:
        raise RuntimeError(
            "optimize_thresholds: no grid point produced a finite score "
            "(all F1 values were NaN) — check the validation volumes")
    model._thresholds = dict(prob=prob_t, nms=nms_t)
    if verbose:
        print(f"selected prob_thresh={prob_t}, nms_thresh={nms_t} "
              f"(F1={best[0]:.4f})")
    return prob_t, nms_t
