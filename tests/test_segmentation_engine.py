"""End-to-end U-Net segmentation engine on a synthetic volume."""

import numpy as np
import jax
import pytest

from t3dct.config import SegmentationConfig
from t3dct.engine.segmentation import UNetSegmenter
from t3dct.models.unet3d import UNet3D


@pytest.fixture(scope="module")
def tiny_unet():
    # small tile for fast CPU tests; architecture is variant-a style
    model = UNet3D(variant="a", tile_shape=(32, 32, 8), pool=(2, 2, 1),
                   down_filters=((4, 4), (4, 8)),
                   up_filters=((8, 8), (4, 4)),
                   head_filters=(4,), activation="leaky_relu")
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def synth_volume(shape=(48, 52, 10), seed=0):
    """Bright gaussian blobs on noise, uint16-ish range."""
    rng = np.random.RandomState(seed)
    img = rng.rand(*shape) * 200
    centers = [(12, 12, 4), (12, 38, 5), (34, 16, 4), (36, 40, 6)]
    xx, yy, zz = np.mgrid[:shape[0], :shape[1], :shape[2]]
    for cx, cy, cz in centers:
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * 3.0) ** 2
        img += 8000 * np.exp(-d2 / 30.0)
    return img.astype(np.float32), centers


def test_segment_runs_and_caches(tmp_path, tiny_unet):
    model, params, state = tiny_unet
    img, centers = synth_volume()
    cfg = SegmentationConfig(noise_level=20.0, min_size=10, z_xy_ratio=3.0,
                             shrink=(4, 4, 2))
    seg = UNetSegmenter(model, params, state, cfg, img.shape, max_cells=64)

    cache = tmp_path / "unet_cache" / "t000001.npy"
    probs1 = np.asarray(seg.predict_cellregions(img, cache))
    assert cache.exists()
    probs2 = np.asarray(seg.predict_cellregions(img, cache))
    # cache round trip is float16-quantized
    np.testing.assert_allclose(probs1, probs2, atol=2e-3)
    assert probs1.shape == img.shape


def test_segment_untrained_raises_or_finds(tiny_unet):
    """With an untrained net the guard rails must behave like the
    reference's (tracker.py:637-643): either everything is background
    (ValueError) or a valid instance segmentation comes out."""
    model, params, state = tiny_unet
    img, centers = synth_volume()
    cfg = SegmentationConfig(noise_level=20.0, min_size=10, z_xy_ratio=3.0,
                             shrink=(4, 4, 2))
    seg = UNetSegmenter(model, params, state, cfg, img.shape, max_cells=64)
    try:
        res = seg.segment(img)
    except ValueError as e:
        assert "No cell" in str(e)
        return
    n = int(res.segmentation_auto.max())
    assert n >= 1
    assert res.l_center_coordinates.shape == (n, 3)
    np.testing.assert_allclose(
        res.r_coordinates_segment[:, 2],
        res.l_center_coordinates[:, 2] * 3.0, rtol=1e-5)
    assert res.image_gcn.max() <= 1.0


def test_segment_with_oracle_probabilities(tiny_unet):
    """Bypass the net: drive watershed with ideal probabilities and verify
    instance counts + centers."""
    model, params, state = tiny_unet
    img, centers = synth_volume()
    cfg = SegmentationConfig(noise_level=20.0, min_size=10, z_xy_ratio=3.0,
                             shrink=(4, 4, 2))
    seg = UNetSegmenter(model, params, state, cfg, img.shape, max_cells=64)
    # oracle probability: 1 inside blobs, 0 outside
    xx, yy, zz = np.mgrid[:img.shape[0], :img.shape[1], :img.shape[2]]
    prob = np.zeros(img.shape, np.float32)
    for cx, cy, cz in centers:
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * 3.0) ** 2
        prob[d2 < 25] = 1.0
    labels, com, min_size, cell_num = seg._watershed(prob,
                                                     method="min_size")
    labels = np.asarray(labels)
    n = int(labels.max())
    assert n == len(centers)
    got_centers = np.asarray(com)[:n]
    want = np.array(centers, np.float64)
    # each found center within 2 voxels of a true center
    d = np.linalg.norm(got_centers[:, None, :2] - want[None, :, :2], axis=2)
    assert (d.min(axis=1) < 2.5).all()


def test_adaptive_min_size_cell_num_workflow(tiny_unet, monkeypatch):
    """Reference workflow parity (tracker.py:681-683): segmenting with
    method='min_size' learns cell_num, enabling later method='cell_num'
    segmentation; with no learned value, method='cell_num' raises a
    clear error instead of deleting every cell."""
    import jax.numpy as jnp
    model, params, state = tiny_unet
    img, centers = synth_volume()
    cfg = SegmentationConfig(noise_level=20.0, min_size=10, z_xy_ratio=3.0,
                             shrink=(4, 4, 2))
    seg = UNetSegmenter(model, params, state, cfg, img.shape, max_cells=64)
    # synthetic prob map with 4 clean blobs (skip the untrained net)
    xx, yy, zz = np.mgrid[:img.shape[0], :img.shape[1], :img.shape[2]]
    prob = np.zeros(img.shape, np.float32)
    for cx, cy, cz in centers:
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * 3.0) ** 2
        prob = np.maximum(prob, np.where(d2 < 30.0, 0.95, 0.0))
    monkeypatch.setattr(seg, "predict_cellregions",
                        lambda image_raw, cache_path=None: jnp.asarray(prob))

    with pytest.raises(ValueError, match="cell_num"):
        seg.segment(img, method="cell_num")

    r1 = seg.segment(img, method="min_size")
    n1 = int(r1.segmentation_auto.max())
    assert n1 >= 3
    assert seg.config.cell_num == n1        # learned (tracker.py:683)

    r2 = seg.segment(img, method="cell_num")
    assert int(r2.segmentation_auto.max()) == n1
    assert seg.config.min_size > 0          # learned under 'cell_num'
