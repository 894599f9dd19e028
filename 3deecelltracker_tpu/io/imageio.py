"""TIFF/HDF5 volume loading and label saving.

Honors the reference's user data contracts (SURVEY Appendix A):
- per-(t) TIFF globs ``"*t%03d*.tif"`` of 2-D z slices
  (``stardistwrapper.py:50-72``),
- legacy per-(t,z) patterns ``"raw_t%04i_z%04i.tif"`` (``tracker.py:113``),
- HDF5 dataset of shape (T, C, Z, Y, X) addressed by
  ``{"h5_file": ..., "channel": ..., "dset": "default"}``,
- directory-of-slices volumes (``preprocess.py:59-82``),
- output TIFF series ``track_results_t%06i_z%04i.tif`` with LZW
  (``coord_image_transformer.py:561-583``).

Implemented with PIL + h5py (the reference additionally used tifffile;
PIL covers single-page grayscale TIFFs, which is the data contract here).
"""

from __future__ import annotations

import os
import re
from glob import glob
from pathlib import Path
from typing import Dict, List, Tuple, Union

import numpy as np
from PIL import Image

PathPattern = Union[str, Dict]


def imread(path: str) -> np.ndarray:
    if str(path).lower().endswith((".tif", ".tiff")):
        try:
            from ..native.tiff import tiff_read
            out = tiff_read(path)
            if out is not None:
                return out
        except Exception:
            pass
    with Image.open(path) as img:
        return np.asarray(img)


def imread_volume(path: str) -> np.ndarray:
    """Read a (multi-page) TIFF as a volume: (n_pages, h, w[, c]), or the
    plain 2-D/3-D array for single-page files — the ``tifffile.imread``
    role for the reference's per-volume training files
    (``stardistwrapper.py:173-175``)."""
    with Image.open(path) as img:
        n = getattr(img, "n_frames", 1)
        if n == 1:
            return np.asarray(img)
        img.seek(0)
        first = np.asarray(img)
        out = np.empty((n,) + first.shape, first.dtype)
        out[0] = first
        for i in range(1, n):
            img.seek(i)
            out[i] = np.asarray(img)
        return out


def imwrite_volume(path: str, vol: np.ndarray,
                   compression: str = None) -> None:
    """Write a (z, h, w) volume as one multi-page TIFF (the tifffile
    ``imwrite`` role — e.g. for creating per-volume StarDist training
    files readable by ``imread_volume`` / ``load_training_images``).
    ``compression``: None or 'tiff_lzw'."""
    vol = np.asarray(vol)
    if vol.ndim == 2:
        vol = vol[None]
    frames = [Image.fromarray(z) for z in vol]
    kwargs = {"compression": compression} if compression else {}
    frames[0].save(str(path), save_all=True, append_images=frames[1:],
                   **kwargs)


def save_recording_h5(h5_file: str, volumes, dset: str = "default",
                      n_channels: int = 1) -> None:
    """Write a recording as the (T, C, Z, Y, X) HDF5 dataset layout that
    ``load_2d_slices_at_time`` / ``get_t_range`` consume (the reference
    only READS this layout, ``stardistwrapper.py:62-70``; the writer is an
    extension so TIFF recordings can be converted once and streamed from a
    single file).  ``volumes``: array or sequence of (z, y, x) volumes, or
    (T, C, Z, Y, X) directly."""
    import h5py

    arr = np.asarray(volumes)
    if arr.ndim == 4:                     # (T, Z, Y, X) -> single channel
        arr = arr[:, None]
    if arr.ndim != 5:
        raise ValueError(f"expected (T,[C,]Z,Y,X), got shape {arr.shape}")
    with h5py.File(str(h5_file), "w") as f:
        f.create_dataset(dset, data=arr, chunks=(1, 1) + arr.shape[2:],
                         compression="gzip", compression_opts=1)


def imread_stack(paths: List[str]) -> np.ndarray:
    """Stack 2-D slices into (z, h, w); native threaded decode when
    available (grayscale TIFF), PIL otherwise."""
    if paths and str(paths[0]).lower().endswith((".tif", ".tiff")):
        try:
            from ..native.tiff import tiff_read_volume
            out = tiff_read_volume(list(paths))
            if out is not None:
                return out
        except Exception:
            pass
    with Image.open(paths[0]) as img:
        first = np.asarray(img)
    out = np.empty((len(paths),) + first.shape, first.dtype)
    out[0] = first
    for i, p in enumerate(paths[1:], 1):
        with Image.open(p) as img:
            out[i] = np.asarray(img)
    return out


def fast_percentiles(x: np.ndarray, qs) -> np.ndarray:
    """``np.percentile(x, qs)`` (linear interpolation) via an exact
    counting sort for small-range non-negative integer arrays.

    On megavoxel uint16 microscopy volumes the partition-based numpy
    path costs ~50 ms/volume of host CPU — the dominant *compute* cost
    of the shipped pipeline's prefetch thread on a 1-core host (see
    scripts/host_profile.json).  A 65536-bin ``bincount`` + cumulative
    sum reproduces numpy's sorted-order lerp bit-for-bit (the k-th
    smallest value is recovered exactly from the cumulative histogram)
    at ~20x less cost.  Falls back to ``np.percentile`` for float or
    wide-range input.  Reference semantics: csbdeep normalize percentiles
    at ``stardistwrapper.py:71``."""
    qs_arr = np.atleast_1d(np.asarray(qs, np.float64))
    if np.any((qs_arr < 0.0) | (qs_arr > 100.0)):
        raise ValueError("Percentiles must be in the range [0, 100]")
    if x.dtype == np.bool_:
        x = x.view(np.uint8)
    if not np.issubdtype(x.dtype, np.integer) or x.size == 0:
        return np.percentile(x, qs_arr)
    flat = x.ravel()
    if flat.dtype not in (np.uint8, np.uint16):
        lo, hi = flat.min(), flat.max()
        if lo < 0 or hi >= (1 << 20):        # bincount table too large
            return np.percentile(x, qs_arr)
    counts = None
    if flat.dtype == np.uint16:
        from ..native.tiff import hist_u16
        counts = hist_u16(flat)              # C histogram, GIL released
    if counts is None:
        counts = np.bincount(flat)
    csum = np.cumsum(counts)
    n = int(flat.size)
    out = np.empty(qs_arr.shape, np.float64)
    for i, q in enumerate(qs_arr):
        pos = q / 100.0 * (n - 1)
        k = int(np.floor(pos))
        d = pos - k
        vk = float(np.searchsorted(csum, k + 1, side="left"))
        if d > 0.0:
            vk1 = float(np.searchsorted(csum, min(k + 2, n), side="left"))
            # numpy's _lerp, bit-for-bit: a + (b-a)*t, but recomputed
            # from the b side as b - (b-a)*(1-t) when t >= 0.5 (numpy
            # lib/_function_base_impl.py _lerp) — without the switch the
            # two forms differ in the last f64 ulp for some (n, q)
            diff = vk1 - vk
            lerp = vk + diff * d
            if d >= 0.5:
                lerp = vk1 - diff * (1.0 - d)
            vk = lerp
        out[i] = vk
    return out


def quantize_u8(x: np.ndarray, mi: float, ma: float) -> np.ndarray:
    """8-bit transport quantization of a raw uint16 volume against its
    normalization percentiles:
    ``round_half_up(clip((x - mi)/(ma - mi)*255, 0, 255))``.

    The opt-in ``transport="u8"`` pipeline path ships this over the
    host->device link (HALF the bytes of raw uint16 — the largest
    remaining transfer through a remote TPU) and the device normalizes
    with ``norm_minmax=(0, 255)``.  LOSSY vs the reference's unclipped
    csbdeep normalize: values outside the [pmin, pmax] percentile range
    clip, and the in-range signal quantizes to 1/255 steps — accuracy is
    validated per-recipe (BASELINE.md), never silently defaulted.

    Uses the native LUT pass when available; the numpy fallback builds
    the identical f32 LUT, so both paths are bit-identical."""
    from ..native.tiff import quantize_u8_native
    if x.dtype != np.uint16:
        raise TypeError(f"transport quantization expects raw uint16 "
                        f"volumes, got {x.dtype}")
    out = quantize_u8_native(x, float(mi), float(ma))
    if out is not None:
        return out
    v = np.arange(65536, dtype=np.float32)
    scale = np.float32(255.0) / (np.float32(ma) - np.float32(mi)
                                 + np.float32(1e-20))
    q = np.clip((v - np.float32(mi)) * scale, np.float32(0.0),
                np.float32(255.0))
    lut = (q + np.float32(0.5)).astype(np.uint8)
    return lut[np.ascontiguousarray(x)]


def transport_encode(x: np.ndarray, transport: str):
    """THE raw-volume wire format shared by every driver loader
    (``predict_and_save`` and the device-handoff ``segment_and_track``):
    returns ``(x, mi, ma)`` where the device normalizes ``x`` with
    ``norm_minmax=(mi, ma)``.

    ``"u16"`` (default): the raw volume rides lossless; ``(mi, ma)`` are
    its exact 1/99.8 percentiles (csbdeep normalize semantics,
    stardistwrapper.py:71).  ``"u8"``: :func:`quantize_u8` against those
    same percentiles — HALF the upload bytes, LOSSY (clips outside
    [p1, p99.8], 1/255 steps; accuracy validated per recipe, BASELINE.md)
    — and ``(mi, ma) = (0, 255)``.  One definition so the two drivers'
    on-device normalization can never desynchronize."""
    if transport not in ("u16", "u8"):
        raise ValueError(f"transport must be 'u16' or 'u8', got "
                         f"{transport!r}")
    mi, ma = fast_percentiles(x, (1.0, 99.8))
    if transport == "u8":
        x = quantize_u8(x, float(mi), float(ma))
        mi, ma = 0.0, 255.0
    return x, float(mi), float(ma)


def percentile_normalize(x: np.ndarray, pmin: float = 1.0,
                         pmax: float = 99.8,
                         eps: float = 1e-20,
                         axis=None) -> np.ndarray:
    """csbdeep.utils.normalize semantics (``stardistwrapper.py:71``);
    ``axis`` limits the percentile reduction (e.g. (0, 1, 2) normalizes
    each channel of a (z, y, x, c) volume independently)."""
    if axis is None and np.issubdtype(x.dtype, np.integer):
        # exact counting-sort percentiles on the raw integers, cast to
        # f32 scalars to keep the arithmetic (and output dtype) f32 as
        # with the partition path below
        mi, ma = np.float32(fast_percentiles(x, (pmin, pmax)))
        return (x.astype(np.float32, copy=False) - mi) / (ma - mi + eps)
    x = x.astype(np.float32, copy=False)
    mi = np.percentile(x, pmin, axis=axis, keepdims=axis is not None)
    ma = np.percentile(x, pmax, axis=axis, keepdims=axis is not None)
    return (x - mi) / (ma - mi + eps)


def load_image(folder_path: str) -> np.ndarray:
    """3-D volume from a folder of 2-D slices, (x, y, z) layout
    (``preprocess.py:59-82``)."""
    files = sorted(
        os.path.join(folder_path, f) for f in os.listdir(folder_path))
    img = imread_stack(files)          # (z, x, y)
    return img.transpose(1, 2, 0)      # (x, y, z)


def load_2d_slices_at_time(images_path: PathPattern, t: int,
                           do_normalize: bool = True) -> np.ndarray:
    """All 2-D slices at time t as a (z, y, x) stack
    (``stardistwrapper.py:50-72``)."""
    if isinstance(images_path, str):
        ext = os.path.splitext(images_path)[1]
        if ext not in (".tif", ".tiff"):
            raise AssertionError(
                "Only TIFF sequences or HDF5 datasets are supported")
        paths = sorted(glob(images_path % t))
        if len(paths) == 0:
            raise FileNotFoundError(f"No image at time {t} was found")
        x = imread_stack(paths)
    elif isinstance(images_path, dict):
        ext = os.path.splitext(images_path["h5_file"])[1]
        if ext not in (".h5", ".hdf5"):
            raise AssertionError(
                "Only TIFF sequences or HDF5 datasets are supported")
        import h5py
        with h5py.File(images_path["h5_file"], "r") as f:
            dset = images_path.get("dset", "default")
            x = f[dset][t - 1, images_path["channel"], :, :, :]
    else:
        raise ValueError(
            "images_path should be a str (TIFF) or dict (HDF5)")
    if do_normalize:
        return percentile_normalize(x)
    return x


def get_t_range(images_path: PathPattern) -> Tuple[int, int]:
    """(largest, smallest) time index (``stardistwrapper.py:114-137``)."""
    if isinstance(images_path, str):
        p = Path(images_path)
        filenames = glob(str(p.parent / ("*t*" + p.suffix)))
        assert len(filenames) > 0, f"No image files found near {p}"
        numbers = [int(re.findall(r"t(\d+)", Path(f).name)[0])
                   for f in filenames]
        return max(numbers), min(numbers)
    elif isinstance(images_path, dict):
        import h5py
        with h5py.File(images_path["h5_file"], "r") as f:
            t_max = f[images_path.get("dset", "default")].shape[0]
        return t_max, 1
    raise ValueError("images_path should be a str (TIFF) or dict (HDF5)")


def read_image_ts(vol: int, path_pattern: str, z_range: Tuple[int, int]
                  ) -> np.ndarray:
    """Legacy per-(t, z) loader (``tracker.py:113-133``): (x, y, z)."""
    slices = [imread(path_pattern % (vol, z))
              for z in range(z_range[0], z_range[1])]
    return np.stack(slices, axis=2)


def save_label_slices(labels_xyz: np.ndarray, out_dir: Union[str, Path],
                      name_pattern: str, t: int,
                      use_8_bit: bool = True,
                      compression: str = "tiff_lzw") -> None:
    """Write a labeled (x, y, z) volume as per-z TIFFs
    (``coord_image_transformer.py:561-583``)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    dtype = np.uint8 if use_8_bit else np.uint16
    arr = np.asarray(labels_xyz).astype(dtype)
    paths = [str(out / (name_pattern % (t, z)))
             for z in range(1, arr.shape[2] + 1)]
    if compression in (None, "tiff_lzw"):
        # native threaded writer: C LZW with the GIL released (~5x PIL on
        # this host, and the saver threads overlap encode with transfers)
        from ..native.tiff import tiff_write_volume
        if tiff_write_volume(paths, np.ascontiguousarray(
                arr.transpose(2, 0, 1)), lzw=compression == "tiff_lzw"):
            return
    for z, path in enumerate(paths):
        with Image.fromarray(arr[:, :, z]) as img:
            img.save(path, compression=compression)


def save_volume_slices(labels_xyz: np.ndarray, out_dir: Union[str, Path],
                       name_pattern: str) -> None:
    """Write per-z TIFFs with a z-only pattern (``auto_vol1_z%04i.tif``,
    stardistwrapper.py:140-146)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(labels_xyz)
    dtype = np.uint8 if arr.max() <= 255 else np.uint16
    arr = arr.astype(dtype)
    paths = [str(out / (name_pattern % z))
             for z in range(1, arr.shape[2] + 1)]
    from ..native.tiff import tiff_write_volume
    if tiff_write_volume(paths, np.ascontiguousarray(arr.transpose(2, 0, 1)),
                         lzw=False):
        return
    for z, path in enumerate(paths):
        with Image.fromarray(arr[:, :, z]) as img:
            img.save(path)
