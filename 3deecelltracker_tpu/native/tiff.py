"""ctypes bindings for the native TIFF codec (tiff_codec.cc).

The native loader decodes a whole z-stack with a thread pool — the host-side
bottleneck when feeding the serial tracking recurrence (SURVEY §7 hard part
e).  Falls back to PIL transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "_tiff_codec.so"
_SRC = _HERE / "tiff_codec.cc"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(_SO), str(_SRC), "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.t3dct_tiff_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.t3dct_tiff_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16)]
        lib.t3dct_tiff_read_volume.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.t3dct_tiff_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.t3dct_tiff_write_lzw.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.t3dct_tiff_write_volume.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.t3dct_hist_u16.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint64)]
        lib.t3dct_quantize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_longlong,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8)]
        return lib
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def tiff_info(path: str) -> Optional[Tuple[int, int, int]]:
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    b = ctypes.c_int()
    if lib.t3dct_tiff_info(str(path).encode(), ctypes.byref(w),
                           ctypes.byref(h), ctypes.byref(b)):
        return None
    # dimension sanity: a corrupt header must not drive a giant (or
    # negative) host allocation in the read paths — 2^26 pixels/slice
    # (8192^2, 128 MB uint16) is far beyond any microscopy slice here
    if not (0 < w.value and 0 < h.value
            and w.value * h.value <= (1 << 26)):
        return None
    return w.value, h.value, b.value


def tiff_read(path: str) -> Optional[np.ndarray]:
    """Decode one grayscale TIFF natively; None -> caller falls back."""
    info = tiff_info(path)
    if info is None:
        return None
    w, h, bits = info
    out = np.empty((h, w), np.uint16)
    lib = _get_lib()
    if lib.t3dct_tiff_read(str(path).encode(),
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_uint16))):
        return None
    return out.astype(np.uint8) if bits == 8 else out


def tiff_read_volume(paths: List[str],
                     n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode a z-stack of same-shape slices in parallel -> (z, h, w)."""
    lib = _get_lib()
    if lib is None or not paths:
        return None
    info = tiff_info(paths[0])
    if info is None:
        return None
    w, h, bits = info
    n = len(paths)
    out = np.empty((n, h, w), np.uint16)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.t3dct_tiff_read_volume(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), w, h,
        n_threads)
    if rc:
        return None
    return out.astype(np.uint8) if bits == 8 else out


def hist_u16(x: np.ndarray) -> Optional[np.ndarray]:
    """Exact 65536-bin histogram of a uint16 array at memory bandwidth
    (GIL released); None -> caller falls back to np.bincount."""
    lib = _get_lib()
    if lib is None or x.dtype != np.uint16:
        return None
    flat = np.ascontiguousarray(x).ravel()
    counts = np.empty(65536, np.uint64)
    rc = lib.t3dct_hist_u16(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_longlong(flat.size),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return None if rc else counts


def quantize_u8_native(x: np.ndarray, mi: float,
                       ma: float) -> Optional[np.ndarray]:
    """round_half_up(clip((x - mi)/(ma - mi)*255, 0, 255)) of a uint16
    array, one LUT pass at memory bandwidth (GIL released); None ->
    caller falls back to the bit-identical numpy LUT
    (``io.imageio.quantize_u8``)."""
    lib = _get_lib()
    if lib is None or x.dtype != np.uint16:
        return None
    flat = np.ascontiguousarray(x)
    out = np.empty(flat.shape, np.uint8)
    rc = lib.t3dct_quantize_u8(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_longlong(flat.size),
        ctypes.c_float(mi), ctypes.c_float(ma),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return None if rc else out


def tiff_write(path: str, img: np.ndarray, lzw: bool = False) -> bool:
    """Write a 2-D uint8/uint16 grayscale TIFF (uncompressed or LZW)."""
    lib = _get_lib()
    if lib is None or img.ndim != 2:
        return False
    bits = 8 if img.dtype == np.uint8 else 16
    buf = np.ascontiguousarray(img, np.uint16)
    fn = lib.t3dct_tiff_write_lzw if lzw else lib.t3dct_tiff_write
    rc = fn(str(path).encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            img.shape[1], img.shape[0], bits)
    return rc == 0


def tiff_write_volume(paths: List[str], vol: np.ndarray,
                      lzw: bool = True, n_threads: int = 0) -> bool:
    """Write a (z, h, w) stack of uint8/uint16 slices in parallel (the
    label-output hot path: LZW encode in C with the GIL released, so the
    pipeline's saver threads overlap encode with transfers)."""
    lib = _get_lib()
    if lib is None or vol.ndim != 3 or len(paths) != vol.shape[0]:
        return False
    bits = 8 if vol.dtype == np.uint8 else 16
    buf = np.ascontiguousarray(vol, np.uint16)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.t3dct_tiff_write_volume(
        arr, len(paths),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        vol.shape[2], vol.shape[1], bits, 5 if lzw else 1, n_threads)
    return rc == 0
