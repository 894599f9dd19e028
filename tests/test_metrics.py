"""Evaluation metrics: IoU instance matching, tracking accuracy,
threshold optimization."""

import numpy as np
import pytest

from t3dct.engine.metrics import (instance_matching, tracking_accuracy,
                                  optimize_thresholds)


def _two_blobs(shift=0):
    lab = np.zeros((20, 20, 4), np.int32)
    lab[2:8, 2:8, :] = 1
    lab[10 + shift:16 + shift, 10:16, :] = 2
    return lab


def test_instance_matching_perfect():
    gt = _two_blobs()
    m = instance_matching(gt, gt)
    assert m["f1"] == 1.0 and m["tp"] == 2
    assert m["mean_matched_iou"] == pytest.approx(1.0)


def test_instance_matching_partial():
    gt = _two_blobs()
    pred = _two_blobs(shift=3)           # cell 2 shifted -> IoU = 1/3
    m5 = instance_matching(gt, pred, iou_thresh=0.5)
    m3 = instance_matching(gt, pred, iou_thresh=0.3)
    assert m5["tp"] == 1 and m5["fp"] == 1 and m5["fn"] == 1
    assert m3["tp"] == 2


def test_instance_matching_relabeled_invariant():
    gt = _two_blobs()
    pred = gt.copy()
    pred[pred == 1] = 7
    pred[pred == 2] = 3
    pred = np.where(pred == 7, 1, np.where(pred == 3, 2, 0))
    # permuted ids, same partition
    perm = gt.copy()
    perm[gt == 1] = 2
    perm[gt == 2] = 1
    m = instance_matching(gt, perm)
    assert m["f1"] == 1.0


def test_instance_matching_empty():
    gt = _two_blobs()
    empty = np.zeros_like(gt)
    m = instance_matching(gt, empty)
    assert m["f1"] == 0.0 and m["fn"] == 2


def test_tracking_accuracy():
    rng = np.random.RandomState(0)
    truth = {t: rng.rand(10, 3) * 50 for t in (1, 2, 3)}
    perm = rng.permutation(10)
    tracked = {t: truth[t][perm] + rng.randn(10, 3) * 0.2
               for t in (1, 2, 3)}
    out = tracking_accuracy(tracked, truth, radius=2.0)
    assert out["accuracy"] > 0.95
    far = {t: tracked[t] + 10.0 for t in tracked}
    assert tracking_accuracy(far, truth, radius=2.0)["accuracy"] < 1.0


class _FakeModel:
    """predict_instances stub whose quality peaks at prob=0.5/nms=0.3."""

    def __init__(self, gt):
        self.gt = gt
        self._thresholds = dict(prob=0.1, nms=0.1)

    def predict_instances(self, x, prob_thresh=None, nms_thresh=None):
        if prob_thresh == 0.5 and nms_thresh == 0.3:
            return (self.gt, {}), None
        pred = self.gt.copy()
        pred[pred == 2] = 0          # drop a cell elsewhere
        return (pred, {}), None


def test_optimize_thresholds_picks_best():
    gt = _two_blobs()
    model = _FakeModel(gt)
    prob_t, nms_t = optimize_thresholds(
        model, [np.zeros_like(gt, np.float32)], [gt],
        prob_grid=(0.4, 0.5), nms_grid=(0.3, 0.4), verbose=False)
    assert (prob_t, nms_t) == (0.5, 0.3)
    assert model._thresholds == dict(prob=0.5, nms=0.3)


def test_tracking_accuracy_rejects_collapsed_tracker():
    """Regression: a non-injective nearest-neighbor identity assignment
    let a tracker that collapses ALL cells onto one trajectory score
    ~100% accuracy; the one-to-one assignment must score it ~1/N."""
    from t3dct.engine.metrics import tracking_accuracy
    rng = np.random.RandomState(0)
    n = 10
    truth0 = rng.rand(n, 3).astype(np.float32) * 50
    truth = {t: truth0 + t for t in range(1, 4)}
    # degenerate tracker: every cell sits exactly on truth cell 0
    collapsed = {t: np.tile(truth[t][0], (n, 1)) for t in truth}
    acc = tracking_accuracy(collapsed, truth, radius=3.0)["accuracy"]
    assert acc <= 1.5 / n, f"collapsed tracker scored {acc}"
    # and a correct tracker still scores 1.0 (permuted ids)
    perm = rng.permutation(n)
    good = {t: truth[t][perm] for t in truth}
    assert tracking_accuracy(good, truth, radius=1e-3)["accuracy"] == 1.0


def test_optimize_thresholds_fast_path_matches_full_predict():
    """The restructured optimize_thresholds runs the backbone once per
    volume and re-runs only the candidates/NMS/render stage per grid
    point; its labels must be identical to the full predict_instances
    pipeline at every grid point."""
    from t3dct.config import StarDistConfig
    from t3dct.engine.stardist import StarDist3D
    from t3dct.engine.metrics import _instances_from_probdist

    cfg = StarDistConfig(n_rays=16, grid=(1, 2, 2),
                         anisotropy=(2.0, 1.0, 1.0),
                         unet_n_filter_base=4, net_conv_after_unet=8)
    model = StarDist3D(cfg, max_candidates=32, render_box=(5, 9, 9))
    rng = np.random.RandomState(0)
    x = rng.rand(8, 32, 32).astype(np.float32)

    import jax.numpy as jnp
    padded, orig_shape = model._pad_input(x)
    prob_g, dist_g = model._fwd(model.params,
                                jnp.asarray(padded)[None, ..., None])
    stage = _instances_from_probdist(model, orig_shape)
    for prob_t, nms_t in ((0.3, 0.3), (0.5, 0.4)):
        fast = np.asarray(stage(prob_g[0, ..., 0], dist_g[0],
                                np.float32(prob_t),
                                np.float32(nms_t))).astype(np.int32)
        (full, _), _ = model.predict_instances(x, prob_thresh=prob_t,
                                               nms_thresh=nms_t)
        np.testing.assert_array_equal(fast, full)


def test_optimize_thresholds_rejects_empty_val():
    gt = _two_blobs()
    model = _FakeModel(gt)
    with pytest.raises(ValueError, match="non-empty"):
        optimize_thresholds(model, [], [], verbose=False)


def test_tracking_accuracy_clear_errors():
    from t3dct.engine.metrics import tracking_accuracy
    a = {1: np.zeros((3, 3), np.float32)}
    b = {2: np.zeros((3, 3), np.float32)}
    with pytest.raises(ValueError, match="no common time point"):
        tracking_accuracy(a, b)
    with pytest.raises(ValueError, match="assign_at"):
        tracking_accuracy({1: a[1], 2: a[1]}, {1: a[1]}, assign_at=5)
