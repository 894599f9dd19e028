"""Native TIFF codec: roundtrips against PIL (incl. LZW decode), threaded
volume loads, and the imageio integration."""

import numpy as np
import pytest
from PIL import Image

from t3dct.native.tiff import (native_available, tiff_read,
                               tiff_read_volume, tiff_write, tiff_info)
from t3dct.io.imageio import imread, imread_stack

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _rand16(shape, seed):
    return (np.random.RandomState(seed).rand(*shape) * 60000
            ).astype(np.uint16)


def test_native_read_pil_written_uncompressed(tmp_path):
    img = _rand16((37, 53), 0)
    Image.fromarray(img).save(tmp_path / "a.tif")
    got = tiff_read(tmp_path / "a.tif")
    np.testing.assert_array_equal(got, img)
    assert tiff_info(tmp_path / "a.tif") == (53, 37, 16)


def test_native_read_pil_written_lzw(tmp_path):
    img = _rand16((64, 48), 1)
    # LZW-compress like the pipeline's label writer
    Image.fromarray(img).save(tmp_path / "b.tif", compression="tiff_lzw")
    got = tiff_read(tmp_path / "b.tif")
    np.testing.assert_array_equal(got, img)


def test_native_read_8bit_lzw(tmp_path):
    img = (np.random.RandomState(2).rand(30, 40) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "c.tif", compression="tiff_lzw")
    got = tiff_read(tmp_path / "c.tif")
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, img)


def test_native_write_pil_read(tmp_path):
    img = _rand16((41, 29), 3)
    assert tiff_write(tmp_path / "d.tif", img)
    with Image.open(tmp_path / "d.tif") as f:
        got = np.asarray(f)
    np.testing.assert_array_equal(got, img)
    img8 = (img % 256).astype(np.uint8)
    assert tiff_write(tmp_path / "e.tif", img8)
    with Image.open(tmp_path / "e.tif") as f:
        np.testing.assert_array_equal(np.asarray(f), img8)


def test_threaded_volume_load(tmp_path):
    vol = _rand16((12, 25, 33), 4)
    paths = []
    for z in range(12):
        p = tmp_path / f"z{z:03d}.tif"
        Image.fromarray(vol[z]).save(p, compression="tiff_lzw")
        paths.append(str(p))
    got = tiff_read_volume(paths, n_threads=4)
    np.testing.assert_array_equal(got, vol)


def test_imageio_integration(tmp_path):
    vol = _rand16((5, 20, 22), 5)
    paths = []
    for z in range(5):
        p = tmp_path / f"s{z:02d}.tif"
        Image.fromarray(vol[z]).save(p)
        paths.append(str(p))
    np.testing.assert_array_equal(imread(paths[0]), vol[0])
    np.testing.assert_array_equal(imread_stack(paths), vol)


def test_native_lzw_write_pil_and_native_read(tmp_path):
    from t3dct.native.tiff import tiff_write_volume
    img = _rand16((401, 168), 6)            # crosses 9->10->11 bit widths
    assert tiff_write(tmp_path / "f.tif", img, lzw=True)
    with Image.open(tmp_path / "f.tif") as f:
        np.testing.assert_array_equal(np.asarray(f), img)
    np.testing.assert_array_equal(tiff_read(tmp_path / "f.tif"), img)

    # structured 8-bit: deep dictionary + table resets
    lab = np.repeat((np.arange(401 * 168) % 151).astype(np.uint8),
                    1).reshape(401, 168)
    assert tiff_write(tmp_path / "g.tif", lab, lzw=True)
    with Image.open(tmp_path / "g.tif") as f:
        got = np.asarray(f)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, lab)

    # threaded batch writer
    vol = np.stack([img, np.full_like(img, 7),
                    np.zeros_like(img)])[:, :64, :48]
    paths = [str(tmp_path / f"w{z}.tif") for z in range(3)]
    assert tiff_write_volume(paths, vol, lzw=True, n_threads=3)
    for z, p in enumerate(paths):
        with Image.open(p) as f:
            np.testing.assert_array_equal(np.asarray(f), vol[z])


def test_save_label_slices_native_roundtrip(tmp_path):
    from t3dct.io.imageio import load_2d_slices_at_time, save_label_slices
    rng = np.random.RandomState(7)
    lab = (rng.rand(40, 30, 6) * 200).astype(np.int32)   # (x, y, z)
    save_label_slices(lab, tmp_path, "lab_t%03i_z%04i.tif", 3,
                      use_8_bit=False, compression="tiff_lzw")
    got = load_2d_slices_at_time(str(tmp_path / "lab_t%03i_z*.tif"), t=3,
                                 do_normalize=False)      # (z, y', x')
    np.testing.assert_array_equal(got.transpose(1, 2, 0), lab)


def test_read_volume_rejects_mismatched_slice(tmp_path):
    """Regression: the volume reader sizes its buffer from the FIRST
    slice; a stray different-shaped TIFF in the glob used to be decoded
    at its own dimensions into the fixed-stride slot (heap overflow) —
    it must fail cleanly (-> None, PIL fallback) instead."""
    from t3dct.native.tiff import tiff_read_volume, tiff_write
    rng = np.random.RandomState(1)
    small = (rng.rand(32, 24) * 60000).astype(np.uint16)
    big = (rng.rand(64, 80) * 60000).astype(np.uint16)
    p1, p2 = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    assert tiff_write(p1, small) and tiff_write(p2, big)
    assert tiff_read_volume([p1, p2]) is None
    # same-shaped volume still reads
    p3 = str(tmp_path / "c.tif")
    assert tiff_write(p3, small)
    vol = tiff_read_volume([p1, p3])
    np.testing.assert_array_equal(vol[0], small)


def test_read_rejects_truncated_file(tmp_path):
    """Corrupt/truncated TIFFs must return an error (PIL fallback), not
    read out of bounds."""
    from t3dct.native.tiff import tiff_read, tiff_write
    img = (np.arange(32 * 24) % 251).astype(np.uint16).reshape(32, 24)
    p = str(tmp_path / "t.tif")
    assert tiff_write(p, img)
    data = open(p, "rb").read()
    for cut in (10, len(data) // 2, len(data) - 4):
        q = str(tmp_path / f"cut{cut}.tif")
        open(q, "wb").write(data[:cut])
        assert tiff_read(q) is None or cut == len(data) - 4


def test_read_rejects_absurd_dimensions(tmp_path):
    """A corrupt header with a huge width must be rejected by the
    dimension sanity guard, not drive a giant host allocation."""
    import struct
    from t3dct.native.tiff import tiff_read, tiff_write
    img = (np.arange(24 * 16) % 251).astype(np.uint16).reshape(24, 16)
    p = str(tmp_path / "dim.tif")
    assert tiff_write(p, img)
    data = bytearray(open(p, "rb").read())
    ifd = struct.unpack_from("<I", data, 4)[0]
    n = struct.unpack_from("<H", data, ifd)[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", data, e)[0]
        if tag == 256:                                   # ImageWidth
            struct.pack_into("<HI", data, e + 2, 4, 1)   # type LONG
            struct.pack_into("<I", data, e + 8, 0x7FFFFFF0)
    q = str(tmp_path / "dim_bad.tif")
    open(q, "wb").write(bytes(data))
    assert tiff_read(q) is None


def test_hist_u16_matches_bincount():
    """The C histogram must agree with np.bincount for every tail-loop
    remainder (n % 4) and on empty/constant input."""
    from t3dct.native.tiff import hist_u16, native_available
    if not native_available():
        import pytest
        pytest.skip("native codec unavailable")
    rng = np.random.RandomState(11)
    for n in (0, 1, 2, 3, 4, 5, 7, 1000, 1003):
        x = rng.randint(0, 65536, size=n).astype(np.uint16)
        got = hist_u16(x)
        assert got is not None
        np.testing.assert_array_equal(
            got, np.bincount(x, minlength=65536).astype(np.uint64))
    x = np.full(37, 65535, np.uint16)                  # max-value ties
    np.testing.assert_array_equal(
        hist_u16(x), np.bincount(x, minlength=65536).astype(np.uint64))
    assert hist_u16(np.zeros(4, np.uint8)) is None     # wrong dtype
