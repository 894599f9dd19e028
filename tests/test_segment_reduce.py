"""Per-label reductions vs scipy.ndimage goldens."""

import numpy as np
import scipy.ndimage as ndi

from t3dct.ops.segment_reduce import (center_of_mass, label_counts,
                                      find_objects_bounds,
                                      topq_mean_intensity)


def _labeled_volume(seed=0, shape=(20, 24, 6), n=7):
    rng = np.random.RandomState(seed)
    lab = np.zeros(shape, np.int32)
    for i in range(1, n + 1):
        cx, cy, cz = rng.randint(3, shape[0] - 3), rng.randint(
            3, shape[1] - 3), rng.randint(1, shape[2] - 1)
        lab[cx - 2:cx + 2, cy - 2:cy + 2, max(0, cz - 1):cz + 1] = i
    w = rng.rand(*shape).astype(np.float32) + 0.1
    return lab, w


def test_center_of_mass_weighted():
    lab, w = _labeled_volume()
    max_labels = 9  # includes two absent labels
    got = np.asarray(center_of_mass(w, lab, max_labels))
    want = np.asarray(ndi.center_of_mass(w, lab, range(1, max_labels + 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, equal_nan=True)
    assert np.isnan(got[-1]).all()  # absent label -> NaN like scipy


def test_center_of_mass_binary():
    lab, _ = _labeled_volume(1)
    got = np.asarray(center_of_mass((lab > 0).astype(np.float32), lab, 7))
    want = np.asarray(ndi.center_of_mass(lab > 0, lab, range(1, 8)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, equal_nan=True)


def test_label_counts():
    lab, _ = _labeled_volume(2)
    got = np.asarray(label_counts(lab, 10))
    want = np.bincount(lab.ravel(), minlength=11)
    np.testing.assert_array_equal(got, want[:11])


def test_find_objects_bounds():
    lab, _ = _labeled_volume(3)
    mins, maxs = find_objects_bounds(lab, 9)
    mins, maxs = np.asarray(mins), np.asarray(maxs)
    slices = ndi.find_objects(lab, max_label=9)
    for i, sl in enumerate(slices):
        if sl is None:
            assert mins[i, 0] > maxs[i, 0]
        else:
            for d in range(3):
                assert mins[i, d] == sl[d].start
                assert maxs[i, d] == sl[d].stop - 1


def test_topq_mean_intensity():
    rng = np.random.RandomState(4)
    lab = np.zeros((30, 30), np.int32)
    lab[2:12, 2:12] = 1
    lab[15:28, 15:28] = 2
    raw = rng.rand(30, 30).astype(np.float32) * 100
    got = np.asarray(topq_mean_intensity(raw, lab, 3, discard_ratio=0.1))
    for label in (1, 2):
        vals = raw[lab == label]
        thr = np.percentile(vals, 90)
        want = vals[vals > thr].mean()
        np.testing.assert_allclose(got[label - 1], want, rtol=1e-5)
    assert np.isnan(got[2])


def test_topq_mean_intensity_small_and_odd_counts():
    """Value-threshold semantics (reference trackerlite.py:195-197) for
    counts where a rank-based cutoff goes wrong: ceil(n*0.9) kept one
    voxel too few at n=15 and NOTHING at n=5 (NaN activity for a real
    cell)."""
    rng = np.random.RandomState(7)
    for n in (5, 15, 25, 1):
        raw = np.zeros((1, 64), np.float32)
        lab = np.zeros((1, 64), np.int32)
        raw[0, :n] = rng.rand(n).astype(np.float32) * 100
        lab[0, :n] = 1
        got = np.asarray(topq_mean_intensity(raw, lab, 1,
                                             discard_ratio=0.1))[0]
        vals = raw[lab == 1]
        thr = np.percentile(vals, 90)
        keep = vals[vals > thr]
        if len(keep) == 0:           # n=1: reference's mean of empty = NaN
            assert np.isnan(got)
        else:
            np.testing.assert_allclose(got, keep.mean(), rtol=1e-5)
