"""Golden tests: EDT vs scipy, peak_local_max vs maximum_filter construction,
connected components vs scipy.ndimage.label."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from t3dct.ops.edt import distance_transform_edt
from t3dct.ops.peaks import peak_local_max_mask
from t3dct.ops.connected import label_components, label_components_raw


def _random_mask(shape, p, seed):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) < p)


@pytest.mark.parametrize("shape,sampling,seed", [
    ((20, 20), (1.0, 1.0), 0),
    ((20, 20), (1.0, 9.2), 1),
    ((16, 18, 8), (1.0, 1.0, 1.0), 2),
    ((16, 18, 8), (1.0, 1.0, 9.2), 3),
])
def test_edt_matches_scipy(shape, sampling, seed):
    mask = _random_mask(shape, 0.7, seed)
    got = np.asarray(distance_transform_edt(mask, sampling))
    want = ndi.distance_transform_edt(mask, sampling=sampling)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edt_all_foreground():
    # no background voxel: scipy returns distance to nearest zero = inf-ish;
    # scipy actually returns the distance to the border? No: scipy gives
    # each voxel distance to nearest zero; with none, result is large.
    mask = np.ones((5, 5), bool)
    got = np.asarray(distance_transform_edt(mask, (1.0, 1.0)))
    assert np.all(got > 100)  # stays "infinite", no NaN
    assert not np.any(np.isnan(got))


def test_peaks_two_blobs():
    img = np.zeros((30, 30), np.float32)
    img[8, 8] = 10.0
    img[22, 22] = 8.0
    img = ndi.gaussian_filter(img, 2.0)
    mask = np.asarray(peak_local_max_mask(img, min_distance=5))
    coords = np.argwhere(mask)
    assert len(coords) == 2
    assert {tuple(c) for c in coords} == {(8, 8), (22, 22)}


def test_peaks_exclude_border():
    img = np.zeros((20, 20), np.float32)
    img[1, 1] = 5.0
    img[10, 10] = 3.0
    img = ndi.gaussian_filter(img, 1.0)
    m_excl = np.asarray(peak_local_max_mask(img, min_distance=3))
    assert m_excl[1, 1] == False  # noqa: E712 — peak in border zone removed
    assert m_excl[10, 10] == True  # noqa: E712
    m_incl = np.asarray(peak_local_max_mask(img, min_distance=3,
                                            exclude_border=0))
    assert m_incl[1, 1] == True  # noqa: E712


def _compare_labelings(got, want):
    """Labelings equal up to a permutation of label ids."""
    assert (got > 0).sum() == (want > 0).sum()
    assert got.max() == want.max()
    # consistent partition: each got-label maps to exactly one want-label
    for g in range(1, got.max() + 1):
        vals = np.unique(want[got == g])
        assert len(vals) == 1


@pytest.mark.parametrize("shape,p,conn,seed", [
    ((30, 30), 0.4, 2, 0),
    ((30, 30), 0.55, 1, 1),
    ((12, 14, 10), 0.3, 3, 2),
    ((12, 14, 10), 0.45, 1, 3),
])
def test_connected_components_vs_scipy(shape, p, conn, seed):
    mask = _random_mask(shape, p, seed)
    got = np.asarray(label_components(mask, connectivity=conn,
                                      max_labels=512))
    structure = ndi.generate_binary_structure(len(shape), conn)
    want, _ = ndi.label(mask, structure=structure)
    _compare_labelings(got, want)


def test_connected_snake():
    # long winding path: stresses the pointer-jumping convergence
    mask = np.zeros((20, 20), bool)
    for i in range(20):
        mask[i, :] = True if i % 2 == 0 else False
        if i % 2 == 1:
            mask[i, 0 if (i // 2) % 2 else -1] = True
    got = np.asarray(label_components(mask, connectivity=1, max_labels=8))
    want, n = ndi.label(mask, structure=ndi.generate_binary_structure(2, 1))
    assert got.max() == n == 1


def test_label_raw_ids_consistent():
    mask = _random_mask((25, 25), 0.5, 7)
    raw = np.asarray(label_components_raw(mask, connectivity=2))
    want, _ = ndi.label(mask, structure=ndi.generate_binary_structure(2, 2))
    _compare_labelings_raw = raw.copy()
    # same partition structure
    for g in np.unique(raw[raw > 0]):
        vals = np.unique(want[raw == g])
        assert len(vals) == 1
