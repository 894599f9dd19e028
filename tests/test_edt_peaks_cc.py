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


@pytest.mark.parametrize("shape,sampling,seed", [
    ((20, 20), (1.0, 1.0), 0),
    ((20, 20), (1.0, 9.2), 1),
    ((16, 18, 8), (1.0, 1.0, 9.2), 3),
])
def test_edt_windowed_matches_scipy(shape, sampling, seed):
    """O(L*W) windowed passes: exact wherever true distances stay below the
    window (dense random masks keep distances tiny)."""
    mask = _random_mask(shape, 0.7, seed)
    want = ndi.distance_transform_edt(mask, sampling=sampling)
    W = int(np.ceil(want.max())) + 1
    got = np.asarray(distance_transform_edt(mask, sampling, window=W))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edt_windowed_saturates_beyond_window():
    # single background voxel in a long line: distances past the window
    # saturate instead of going exact — documented semantics
    mask = np.ones((1, 64), bool)
    mask[0, 0] = False
    got = np.asarray(distance_transform_edt(mask, (1.0, 1.0), window=8))
    np.testing.assert_allclose(got[0, 1:9], np.arange(1, 9), atol=1e-4)
    assert np.all(got[0, 20:] > 100)


def test_edt_prob_windowed_matches_dense():
    from t3dct.ops.stardist_gt import edt_prob
    import jax.numpy as jnp
    lab = np.zeros((8, 24, 24), np.int32)
    lab[2:6, 3:12, 4:13] = 1
    lab[1:7, 14:21, 10:20] = 2
    dense = np.asarray(edt_prob(jnp.asarray(lab), max_labels=4,
                                anisotropy=(2.0, 1.0, 1.0)))
    win = np.asarray(edt_prob(jnp.asarray(lab), max_labels=4,
                              anisotropy=(2.0, 1.0, 1.0), window=12))
    np.testing.assert_allclose(win, dense, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,sampling,seed", [
    ((30, 30), (1.0, 1.0), 4),
    ((24, 18, 9), (1.0, 1.0, 9.2), 5),
    ((64, 40), (2.0, 1.0), 6),
])
def test_edt_envelope_matches_scipy(shape, sampling, seed):
    """Exact O(L) lower-envelope pass (VERDICT r2 #6) vs scipy."""
    mask = _random_mask(shape, 0.7, seed)
    got = np.asarray(distance_transform_edt(mask, sampling,
                                            method="envelope"))
    want = ndi.distance_transform_edt(mask, sampling=sampling)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_edt_envelope_matches_scipy_1024():
    """Parity at zebrafish line length (xy = 1024), sparse background —
    long propagation distances exercise the envelope numerics."""
    rng = np.random.RandomState(9)
    mask = np.ones((1024, 1024), bool)
    ij = rng.randint(0, 1024, size=(60, 2))
    mask[ij[:, 0], ij[:, 1]] = False
    got = np.asarray(distance_transform_edt(mask, (1.0, 1.0),
                                            method="envelope"))
    want = ndi.distance_transform_edt(mask, sampling=(1.0, 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_edt_envelope_all_foreground_line():
    """Lines with no background voxel stay saturated, no NaN."""
    mask = np.ones((6, 12), bool)
    mask[0, 3] = False          # one line has background, others none
    got = np.asarray(distance_transform_edt(mask, (1.0, 1.0),
                                            method="envelope"))
    assert not np.any(np.isnan(got))
    want = ndi.distance_transform_edt(mask, sampling=(1.0, 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edt_envelope_large_physical_distances():
    """Regression: the envelope pass's finite 'infinity' was a fixed 1e9
    with outputs > 5e8 mapped to INF — genuinely large finite squared
    distances (L * w > ~22k, e.g. coarse physical sampling) were silently
    clamped/saturated while the dense pass returned the exact answer.
    The sentinel now scales with the achievable bound."""
    mask = np.ones((4, 1024), bool)
    mask[:, 0] = False                      # distances up to 1023 * 30
    sampling = (1.0, 30.0)                  # (L*w)^2 ~ 9.4e8 > 5e8
    got = np.asarray(distance_transform_edt(mask, sampling,
                                            method="envelope"))
    want = ndi.distance_transform_edt(mask, sampling=sampling)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-3)
    dense = np.asarray(distance_transform_edt(mask, sampling,
                                              method="dense"))
    np.testing.assert_allclose(got, dense, rtol=1e-3)
