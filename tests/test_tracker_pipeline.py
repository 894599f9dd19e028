"""End-to-end TrackerLite pipeline on synthetic data: artifact round trips,
padding invariance, ensemble combination, activities extraction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats

import t3dct
from t3dct import Coordinates
from t3dct.engine.tracker import (TrackerLite, track_step, get_volumes_list,
                                  evenly_distributed_volumes)
from t3dct.io.artifacts import ResultsTree
from t3dct.io.imageio import save_label_slices, load_2d_slices_at_time
from t3dct.models.ffn import FFN
from t3dct.ops.trim import trim_mean
from t3dct.utils.checkpoint import save_pytree, load_pytree


def _synthetic_recording(tmp_path, n_cells=40, n_vols=4, seed=0):
    """Point clouds drifting smoothly; seg coords saved like predict_and_save."""
    rng = np.random.RandomState(seed)
    tree = ResultsTree(tmp_path)
    tree.make_dirs()
    base = rng.rand(n_cells, 3).astype(np.float32) * \
        np.array([100, 150, 12], np.float32)
    coords = base.copy()
    all_coords = []
    for t in range(1, n_vols + 1):
        drift = 0.8 * np.sin(coords[:, [1, 2, 0]] / 20.0) + \
            rng.randn(n_cells, 3) * 0.05
        if t > 1:
            coords = coords + drift.astype(np.float32)
        perm = rng.permutation(n_cells)
        tree.save_seg_coords(t, coords[perm])   # raw frame, shuffled ids
        all_coords.append(coords.copy())
    return tree, base, np.stack(all_coords)


@pytest.fixture(scope="module")
def ffn_weights():
    return FFN().init(jax.random.PRNGKey(0))


def test_trim_mean_vs_scipy():
    rng = np.random.RandomState(1)
    x = rng.rand(20, 7, 3)
    got = np.asarray(trim_mean(jnp.asarray(x), 0.1, axis=0))
    want = scipy.stats.trim_mean(x, 0.1, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_volumes_lists():
    assert get_volumes_list(5, [], sampling_number=20) == [1, 2, 3, 4]
    assert get_volumes_list(50, [], sampling_number=5, adjacent=True) == \
        [45, 46, 47, 48, 49]
    vols = get_volumes_list(50, [], sampling_number=5, adjacent=False)
    assert vols == evenly_distributed_volumes(50, 5)
    assert len(vols) <= 6 and max(vols) < 50
    assert get_volumes_list(50, [46], 5, True) == [45, 47, 48, 49]


def test_tracker_predict_runs_and_padding_invariant(tmp_path, ffn_weights):
    tree, base, truth = _synthetic_recording(tmp_path)
    vol1 = Coordinates.from_raw(truth[0], 5, (1, 1, 9.2))
    tr_a = TrackerLite(tmp_path, ffn_weights, vol1, max_cells=64)
    tr_b = TrackerLite(tmp_path, ffn_weights, vol1, max_cells=128)
    pred_a = tr_a.predict_cell_positions(1, 2)
    pred_b = tr_b.predict_cell_positions(1, 2)
    a = np.asarray(pred_a.real)
    assert a.shape == (40, 3)
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a, np.asarray(pred_b.real), rtol=1e-3,
                               atol=1e-3)
    # prediction should stay in the scene's bounding box neighborhood
    seg2 = tree.load_seg_coords(2) * np.array([1, 1, 9.2])
    assert np.linalg.norm(a.mean(0) - seg2.mean(0)) < 20.0


def test_tracker_ffn_checkpoint_roundtrip(tmp_path, ffn_weights):
    path = tmp_path / "ffn_model.npz"
    save_pytree(ffn_weights, path)
    tree, base, truth = _synthetic_recording(tmp_path)
    vol1 = Coordinates.from_raw(truth[0], 5, (1, 1, 9.2))
    tr = TrackerLite(tmp_path, str(path), vol1, max_cells=64)
    tr2 = TrackerLite(tmp_path, ffn_weights, vol1, max_cells=64)
    p1 = np.asarray(tr.predict_cell_positions(1, 2).real)
    p2 = np.asarray(tr2.predict_cell_positions(1, 2).real)
    np.testing.assert_allclose(p1, p2, rtol=1e-5)


def test_ensemble_prediction(tmp_path, ffn_weights):
    tree, base, truth = _synthetic_recording(tmp_path, n_vols=5)
    vol1 = Coordinates.from_raw(truth[0], 5, (1, 1, 9.2))
    tr = TrackerLite(tmp_path, ffn_weights, vol1, max_cells=64)
    # confirmed coords for t=1..3 (pretend tracked == truth)
    for t in range(1, 4):
        tree.save_coords_real(t, truth[t - 1] * np.array([1, 1, 9.2]))
    pred = tr.predict_cell_positions_ensemble(
        [], t2=4, coord_t1=vol1, beta=3.0, lambda_=3.0, sampling_number=3)
    assert np.asarray(pred.real).shape == (40, 3)
    assert np.all(np.isfinite(np.asarray(pred.real)))


def test_activities_extraction(tmp_path, ffn_weights):
    rng = np.random.RandomState(3)
    tree = ResultsTree(tmp_path)
    tree.make_dirs()
    # labels: 2 cells in a (20, 20, 3) volume, 2 time points
    labels = np.zeros((20, 20, 3), np.int32)
    labels[2:8, 2:8, :] = 1
    labels[12:18, 12:18, :] = 2
    raws = []
    for t in (1, 2):
        tree.save_tracked_labels(labels, t, use_8_bit=True)
        raw = (rng.rand(20, 20, 3) * 1000).astype(np.uint16)
        raws.append(raw)
        # raw TIFFs saved (z, x, y) slices with t pattern
        save_label_slices(raw, tmp_path / "raw", "raw_t%06i_z%04i.tif", t,
                          use_8_bit=False)
    vol1 = Coordinates.from_raw(np.array([[5., 5., 1.], [15., 15., 1.]]),
                                1, (1, 1, 1))
    tr = TrackerLite(tmp_path, ffn_weights, vol1, max_cells=64)
    acts = tr.activities(str(tmp_path / "raw" / "*t%06i*.tif"),
                         do_normalize=False)
    assert acts.shape == (2, 2)
    # golden: reference formula (trackerlite.py:188-197)
    for ti, raw in enumerate(raws):
        # loader returns (z, x, y); labels were saved from (x, y, z)
        lab_zxy = labels.transpose(2, 0, 1)
        raw_zxy = raw.transpose(2, 0, 1)
        for label in (1, 2):
            vals = raw_zxy[lab_zxy == label].astype(np.float64)
            thr = np.percentile(vals, 90)
            want = vals[vals > thr].mean()
            np.testing.assert_allclose(acts[ti, label - 1], want, rtol=2e-2)


def test_track_timelapse_miss_frame_without_artifacts(tmp_path):
    """A miss frame mid-recording has NO seg artifacts (predict_and_save
    never wrote them); single mode must pair each volume with the last
    non-missed frame and carry coordinates through (trackerlite
    miss_frame semantics)."""
    import jax
    from t3dct.config import TrackingConfig
    from t3dct.engine.pipeline import track_timelapse
    from t3dct.io.artifacts import ResultsTree
    from t3dct.io.imageio import save_label_slices
    from t3dct.models.ffn import FFN

    rng = np.random.RandomState(4)
    shape = (30, 40, 6)                     # (x, y, z) pipeline frame
    n = 5
    tree = ResultsTree(tmp_path)
    tree.make_dirs()
    pts = np.stack([rng.uniform(8, 22, n), rng.uniform(8, 32, n),
                    rng.uniform(2, 4, n)], 1).astype(np.float32)
    lab1 = np.zeros(shape, np.int32)
    for i, (cx, cy, cz) in enumerate(pts):
        lab1[int(cx) - 2:int(cx) + 2, int(cy) - 2:int(cy) + 2,
             int(cz) - 1:int(cz) + 1] = i + 1
    save_label_slices(lab1, tmp_path / "manual_vol1",
                      "manual_vol1_t%04i_z%04i.tif", 0, use_8_bit=True)
    gz, gy = shape[0], shape[1]
    for t in (1, 2, 4, 5):                  # t=3 is the miss frame
        drift = 0.3 * (t - 1)
        tree.save_seg_coords(t, pts + drift)
        prob = np.zeros(shape, np.float32)
        for cx, cy, cz in pts + drift:
            prob[max(0, int(cx) - 2):int(cx) + 2,
                 max(0, int(cy) - 2):int(cy) + 2,
                 max(0, int(cz) - 1):int(cz) + 1] = 1.0
        tree.save_seg_prob(t, prob)

    params, state = FFN().init(jax.random.PRNGKey(0))
    coords = track_timelapse(
        tmp_path, str(tmp_path / "manual_vol1" / "*.tif"),
        (params, state), voxel_size=(1, 1, 2.0), interpolation_factor=2,
        t_range=(1, 5), miss_frame=[3],
        config=TrackingConfig(beta=3.0, lambda_=3.0), verbose=False)
    assert set(coords) == {1, 2, 3, 4, 5}
    for t in coords:
        assert np.all(np.isfinite(coords[t]))
    # the missed frame carries the previous coordinates forward
    np.testing.assert_array_equal(coords[3], coords[2])


def test_interpolate_preserves_cells_and_voxels(tmp_path):
    """The second atlas build re-derives box_shape from the CORRECTED
    segmentation (boundary recalc can grow a cell past its proofed bbox;
    a stale box would silently clip it).  On a clean scene every label
    and every foreground voxel must survive interpolate()."""
    from t3dct.engine.transformer import CoordsToImageTransformer
    seg = np.zeros((40, 24, 6), np.int32)
    seg[4:14, 8:16, 1:5] = 1
    seg[14:24, 8:16, 1:5] = 2          # touches cell 1
    seg[30:36, 4:10, 1:5] = 3
    tr = CoordsToImageTransformer(tmp_path, (1.0, 1.0, 2.0))
    tr.load_segmentation_array(seg)
    tr.interpolate(interpolation_factor=2, smooth_sigma=1.0)
    out = tr.auto_corrected_segmentation
    assert set(np.unique(out)) == {0, 1, 2, 3}
    assert (out > 0).sum() == (seg > 0).sum()
