"""Golden tests for box/gaussian filters and LCN vs scipy.ndimage."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from t3dct.ops import box_sum, box_mean, gaussian_filter, lcn, normalize_image


@pytest.fixture
def vol():
    rng = np.random.RandomState(42)
    return (rng.rand(20, 23, 9) * 100).astype(np.float32)


def _scipy_box(x, size, mode):
    filt = np.ones(size) / np.prod(size)
    return ndi.convolve(x, filt, mode=mode)


@pytest.mark.parametrize("size", [(3, 3, 1), (27, 27, 1), (5, 4, 3)])
def test_box_mean_reflect(vol, size):
    got = np.asarray(box_mean(vol, size, mode="reflect"))
    want = _scipy_box(vol, size, "reflect")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("size", [(3, 3, 1), (7, 7, 3)])
def test_box_mean_zero(vol, size):
    got = np.asarray(box_mean(vol, size, mode="zero"))
    want = _scipy_box(vol, size, "constant")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_box_sum_ones():
    x = np.ones((8, 8, 4), np.float32)
    got = np.asarray(box_sum(x, (3, 3, 3), mode="reflect"))
    np.testing.assert_allclose(got, 27.0, rtol=1e-6)


@pytest.mark.parametrize("sigma", [2.0, (2.0, 2.0, 0.3), (2.5, 1.0, 0.0)])
def test_gaussian_vs_scipy_reflect(vol, sigma):
    got = np.asarray(gaussian_filter(vol, sigma, mode="reflect"))
    want = ndi.gaussian_filter(vol, sigma, mode="reflect")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_gaussian_vs_scipy_constant(vol):
    # watershed.py:40,91 use mode='constant'
    got = np.asarray(gaussian_filter(vol, (2, 2, 0.3), mode="zero"))
    want = ndi.gaussian_filter(vol, (2, 2, 0.3), mode="constant")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def _lcn_reference(img3d, noise_level, filter_size, pad_mode):
    """Host float64 LCN mirroring preprocess.py:85-167 semantics."""
    filt = np.ones(filter_size)
    vol = filt.size
    if pad_mode == "reflect":
        conv = lambda x: ndi.convolve(x, filt / vol, mode="reflect")
        avg = conv(img3d)
        std = np.sqrt(conv(np.square(img3d - avg)))
    else:  # zero padding, divide by the full window volume (Conv3D 'same')
        conv = lambda x: ndi.convolve(x, filt, mode="constant") / vol
        avg = conv(img3d)
        std = np.sqrt(conv(np.square(img3d - avg)))
    return (img3d - avg) / (std + noise_level)


@pytest.mark.parametrize("padding", ["zero", "reflect"])
def test_lcn_golden(vol, padding):
    got = np.asarray(lcn(vol, 5.0, (7, 7, 1), padding=padding))
    want = _lcn_reference(vol.astype(np.float64), 5.0, (7, 7, 1), padding)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_normalize_image_median_clip(vol):
    got = np.asarray(normalize_image(vol, 5.0, (7, 7, 1)))
    x = vol.astype(np.float64) - np.median(vol)
    x[x < 0] = 0
    want = _lcn_reference(x, 5.0, (7, 7, 1), "zero")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
