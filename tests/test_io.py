"""Host IO contracts: HDF5 (T, C, Z, Y, X) datasets, TIFF t-range
discovery, percentile normalization, results-tree round trips, prefetcher
ordering and error propagation."""

import numpy as np
import pytest

from t3dct.io.imageio import (load_2d_slices_at_time, get_t_range,
                              percentile_normalize, load_image,
                              save_label_slices)
from t3dct.io.artifacts import ResultsTree
from t3dct.io.prefetch import VolumePrefetcher


@pytest.fixture
def h5file(tmp_path):
    import h5py
    path = tmp_path / "rec.h5"
    rng = np.random.RandomState(0)
    data = (rng.rand(4, 2, 5, 16, 18) * 1000).astype(np.uint16)  # T C Z Y X
    with h5py.File(path, "w") as f:
        f.create_dataset("default", data=data)
    return path, data


def test_h5_loading(h5file):
    path, data = h5file
    spec = {"h5_file": str(path), "channel": 1}
    x = load_2d_slices_at_time(spec, t=3, do_normalize=False)
    np.testing.assert_array_equal(x, data[2, 1])
    assert get_t_range(spec) == (4, 1)
    xn = load_2d_slices_at_time(spec, t=1, do_normalize=True)
    assert xn.dtype == np.float32 and xn.max() <= 1.5


def test_h5_rejects_wrong_extension(tmp_path):
    with pytest.raises(AssertionError):
        load_2d_slices_at_time({"h5_file": str(tmp_path / "x.txt"),
                                "channel": 0}, t=1)


def test_percentile_normalize_matches_csbdeep_formula():
    rng = np.random.RandomState(1)
    x = rng.rand(10, 12, 3) * 5000
    got = percentile_normalize(x)
    mi, ma = np.percentile(x, 1), np.percentile(x, 99.8)
    np.testing.assert_allclose(got, (x - mi) / (ma - mi + 1e-20), rtol=1e-5)


def test_fast_percentiles_exact_vs_numpy():
    """The counting-sort path must reproduce np.percentile's linear
    interpolation bit-for-bit on integer volumes (it feeds the on-device
    normalization scalars of every pipeline driver)."""
    from t3dct.io.imageio import fast_percentiles
    rng = np.random.RandomState(7)
    qs = (0.0, 1.0, 37.5, 50.0, 99.8, 100.0)
    cases = [
        rng.randint(0, 65536, size=100_000).astype(np.uint16),
        rng.randint(0, 256, size=9973).astype(np.uint8),
        rng.randint(0, 5, size=1000).astype(np.uint16),   # heavy ties
        np.array([3], np.uint16),                          # n == 1
        np.array([7, 7, 7, 7], np.uint16),                 # constant
        np.array([0, 65535], np.uint16),                   # extremes
        rng.randint(0, 1 << 18, size=5000).astype(np.int32),
    ]
    for x in cases:
        got = fast_percentiles(x, qs)
        want = np.percentile(x, qs)
        np.testing.assert_array_equal(got, want)
    # wide-range / float / negative input falls back to np.percentile
    for x in (rng.randn(1000).astype(np.float32),
              np.array([-1, 5, 9], np.int32),
              (rng.randint(0, 1 << 30, size=64)).astype(np.int64)):
        np.testing.assert_array_equal(fast_percentiles(x, qs),
                                      np.percentile(x, qs))


def test_fast_percentiles_fuzz_lerp_ulp():
    """Random (n, q) fuzz against np.percentile: numpy's _lerp switches
    to b - (b-a)*(1-t) when t >= 0.5 — lerping only from the a side
    differs in the last f64 ulp for some (n, q) and fails bit-identity
    (review round 5; 27/5000 cases diverged before the fix)."""
    from t3dct.io.imageio import fast_percentiles
    rng = np.random.RandomState(0)
    for _ in range(3000):
        n = rng.randint(1, 40)
        x = rng.randint(0, rng.choice([5, 100, 65536]),
                        size=n).astype(np.uint16)
        q = float(rng.rand() * 100)
        assert fast_percentiles(x, q)[0] == np.percentile(x, q), (n, q)


def test_fast_percentiles_invalid_q_raises():
    """q outside [0, 100] must raise like np.percentile does — never
    fabricate out-of-range values on the integer fast path."""
    import pytest

    from t3dct.io.imageio import fast_percentiles
    for q in (-0.1, 100.5, (1.0, 101.0)):
        with pytest.raises(ValueError):
            fast_percentiles(np.array([3, 7], np.uint16), q)


def test_percentile_normalize_integer_path_matches_float_path():
    """The integer fast path of percentile_normalize must agree with the
    partition path it replaces (same f32 scalars, same arithmetic)."""
    rng = np.random.RandomState(3)
    x = rng.randint(0, 4096, size=(8, 50, 60)).astype(np.uint16)
    got = percentile_normalize(x)
    want = percentile_normalize(x.astype(np.float32))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=2e-7, atol=2e-7)


def test_tiff_t_range_and_missing(tmp_path):
    vol = (np.random.RandomState(2).rand(8, 10, 3) * 255).astype(np.uint8)
    for t in (2, 3, 5):
        save_label_slices(vol, tmp_path, "img_t%03i_z%04i.tif", t,
                          use_8_bit=True, compression=None)
    pattern = str(tmp_path / "img_t%03i_z*.tif")
    assert get_t_range(pattern) == (5, 2)
    with pytest.raises(FileNotFoundError):
        load_2d_slices_at_time(pattern, t=4)
    x = load_2d_slices_at_time(pattern, t=3, do_normalize=False)
    assert x.shape == (3, 8, 10)   # (z, h, w)


def test_load_image_directory(tmp_path):
    vol = (np.random.RandomState(3).rand(6, 9, 4) * 255).astype(np.uint8)
    save_label_slices(vol, tmp_path / "d", "s_%01i_z%04i.tif", 0,
                      use_8_bit=True, compression=None)
    got = load_image(str(tmp_path / "d"))
    np.testing.assert_array_equal(got, vol)


def test_results_tree_roundtrip(tmp_path):
    tree = ResultsTree(tmp_path)
    tree.make_dirs()
    coords = np.random.RandomState(4).rand(7, 3)
    tree.save_seg_coords(2, coords)
    np.testing.assert_array_equal(tree.load_seg_coords(2), coords)
    prob = np.random.RandomState(5).rand(4, 5, 3).astype(np.float32)
    tree.save_seg_prob(2, prob)
    np.testing.assert_array_equal(tree.load_seg_prob(2), prob)
    tree.save_coords_real(2, coords * 2)
    np.testing.assert_array_equal(tree.load_coords_real(2), coords * 2)
    path = tree.export_coordinates_csv({1: coords, 2: coords * 2})
    lines = path.read_text().strip().split("\n")
    assert lines[0] == "t,cell,x,y,z"
    assert len(lines) == 1 + 2 * 7
    acts = np.random.RandomState(6).rand(3, 7)
    apath = tree.export_activities_csv(acts)
    assert len(apath.read_text().strip().split("\n")) == 4


def test_prefetcher_order_and_error():
    def load(t):
        if t == 4:
            raise FileNotFoundError("t=4 missing")
        return t * 10

    got = list(VolumePrefetcher(load, [1, 2, 3], depth=2))
    assert got == [(1, 10), (2, 20), (3, 30)]

    pf = VolumePrefetcher(load, [3, 4, 5], depth=1)
    it = iter(pf)
    assert next(it) == (3, 30)
    with pytest.raises(FileNotFoundError):
        list(it)


def test_imwrite_volume_roundtrip(tmp_path):
    from t3dct.io.imageio import imread_volume, imwrite_volume
    vol = (np.random.RandomState(3).rand(4, 9, 7) * 60000).astype(np.uint16)
    imwrite_volume(tmp_path / "v.tif", vol)
    np.testing.assert_array_equal(imread_volume(tmp_path / "v.tif"), vol)
    imwrite_volume(tmp_path / "c.tif", vol, compression="tiff_lzw")
    np.testing.assert_array_equal(imread_volume(tmp_path / "c.tif"), vol)


def test_save_recording_h5_roundtrip(tmp_path):
    from t3dct.io.imageio import (get_t_range, load_2d_slices_at_time,
                                  save_recording_h5)
    rec = (np.random.RandomState(4).rand(3, 5, 8, 6) * 60000
           ).astype(np.uint16)                      # (T, Z, Y, X)
    h5 = tmp_path / "rec.h5"
    save_recording_h5(h5, rec)
    spec = {"h5_file": str(h5), "dset": "default", "channel": 0}
    assert get_t_range(spec) == (3, 1)
    got = load_2d_slices_at_time(spec, t=2, do_normalize=False)
    np.testing.assert_array_equal(got, rec[1])


def test_prefetcher_parallel_workers():
    """workers>1: ordered delivery, in-order first-error propagation, all
    loads issued concurrently up to the window."""
    import threading
    import time

    from t3dct.io.prefetch import VolumePrefetcher

    seen = []
    lock = threading.Lock()

    def load(t):
        with lock:
            seen.append(t)
        time.sleep(0.01 * ((t * 7) % 3))      # scramble completion order
        if t == 4:
            raise FileNotFoundError(t)
        return t * 10

    got = list(VolumePrefetcher(load, [1, 2, 3], depth=2, workers=3))
    assert got == [(1, 10), (2, 20), (3, 30)]

    it = iter(VolumePrefetcher(load, [2, 3, 4, 5], depth=1, workers=2))
    assert next(it) == (2, 20)
    assert next(it) == (3, 30)
    with pytest.raises(FileNotFoundError):
        next(it)


def test_quantize_u8_formula_and_native_parity(monkeypatch):
    """io.imageio.quantize_u8 (the transport='u8' wire format):
    round_half_up(clip((x-mi)/(ma-mi)*255, 0, 255)) in f32, with the
    native LUT pass and the numpy LUT fallback bit-identical."""
    import t3dct.native.tiff as nt
    from t3dct.io.imageio import quantize_u8

    rng = np.random.default_rng(3)
    x = rng.integers(0, 50000, (7, 33, 41)).astype(np.uint16)
    mi, ma = 120.0, 43210.5
    got = quantize_u8(x, mi, ma)
    assert got.dtype == np.uint8 and got.shape == x.shape

    # brute-force reference in f32 (same op order as the LUT build)
    q = np.clip((x.astype(np.float32) - np.float32(mi))
                * (np.float32(255.0) / (np.float32(ma) - np.float32(mi)
                                        + np.float32(1e-20))),
                np.float32(0), np.float32(255))
    ref = (q + np.float32(0.5)).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)

    # clipping: below mi -> 0, above ma -> 255
    edges = np.array([0, 100, 43211, 65535], np.uint16)
    qe = quantize_u8(edges, mi, ma)
    assert qe[0] == 0 and qe[1] == 0 and qe[-1] == 255

    # numpy fallback (native disabled) is bit-identical
    monkeypatch.setattr(nt, "quantize_u8_native", lambda *a: None)
    np.testing.assert_array_equal(quantize_u8(x, mi, ma), got)

    with pytest.raises(TypeError, match="uint16"):
        quantize_u8(x.astype(np.float32), mi, ma)
