"""StarDist GT generation goldens + a short training run."""

import numpy as np
import jax.numpy as jnp
import pytest

from t3dct.config import StarDistConfig
from t3dct.models.train_stardist import (TrainStarDist3D, augmenter,
                                         random_fliprot)
from t3dct.ops.rays import rays_golden_spiral
from t3dct.ops.stardist_gt import star_dist3d, edt_prob


def test_star_dist3d_sphere():
    """Ray distances from the center of a ball == its radius."""
    shape = (21, 21, 21)
    zz, yy, xx = np.mgrid[:21, :21, :21]
    r = 7
    lab = ((zz - 10) ** 2 + (yy - 10) ** 2 + (xx - 10) ** 2 <= r * r
           ).astype(np.int32)
    rays = jnp.asarray(rays_golden_spiral(16))
    d = np.asarray(star_dist3d(jnp.asarray(lab), rays, max_dist=15))
    center = d[10, 10, 10]
    # unit-step marching quantizes to ~±1 voxel
    assert np.all(np.abs(center - r) <= 1.5), center
    # background voxels -> 0
    assert d[0, 0, 0].max() == 0


def test_star_dist3d_stops_at_other_label():
    lab = np.zeros((9, 9, 9), np.int32)
    lab[:, :, 0:4] = 1
    lab[:, :, 4:9] = 2
    rays = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, -1.0]], np.float32))
    d = np.asarray(star_dist3d(jnp.asarray(lab), rays, max_dist=8))
    # voxel (4,4,2) of label 1: +x ray exits at x=4 (label 2) -> dist 1
    assert d[4, 4, 2, 0] == 1
    # -x ray exits at x=-1 -> dist 2
    assert d[4, 4, 2, 1] == 2


def test_edt_prob_peaks_at_core():
    lab = np.zeros((15, 15, 15), np.int32)
    lab[3:12, 3:12, 3:12] = 1
    p = np.asarray(edt_prob(jnp.asarray(lab), max_labels=4))
    assert p.max() == pytest.approx(1.0)
    assert p[7, 7, 7] == pytest.approx(1.0)
    assert p[3, 3, 3] < 0.5
    assert p[0, 0, 0] == 0.0
    # touching cells: boundary voxels between labels have low prob
    lab2 = lab.copy()
    lab2[3:12, 3:12, 8:12] = 2
    p2 = np.asarray(edt_prob(jnp.asarray(lab2), max_labels=4))
    assert p2[7, 7, 7] < p[7, 7, 7] + 1e-6
    assert p2[7, 7, 8] < 0.6


def test_random_fliprot_keeps_pairing():
    rng = np.random.RandomState(0)
    img = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)
    lab = (img > 10).astype(np.int32)
    for _ in range(5):
        i2, l2 = random_fliprot(img, lab, rng)
        np.testing.assert_array_equal(l2, (i2 > 10).astype(np.int32))


def _tiny_cfg(patch):
    return StarDistConfig(n_rays=8, grid=(1, 2, 2),
                          anisotropy=(2.0, 1.0, 1.0),
                          unet_n_filter_base=4, net_conv_after_unet=8,
                          train_patch_size=patch)


def test_foreground_patch_sampling(tmp_path):
    """``foreground_prob=1`` guarantees foreground in every patch
    (stardist's train_foreground_only; see TrainStarDist3D docstring) even
    when the labels occupy a tiny corner a uniform sampler mostly misses."""
    shape = (8, 64, 64)
    lab = np.zeros(shape, np.int32)
    lab[2:5, 2:6, 2:6] = 1
    img = lab.astype(np.float32)
    cfg = _tiny_cfg((8, 16, 16))
    tr = TrainStarDist3D(cfg, basedir=tmp_path / "fg", max_dist=6, seed=0,
                         foreground_prob=1.0)
    for _ in range(25):
        xp, yp = tr._sample_patch([img], [lab])
        assert yp.shape == (8, 16, 16)
        assert (yp > 0).any()
    # the uniform sampler (foreground_prob=0) misses the corner most draws
    tr0 = TrainStarDist3D(cfg, basedir=tmp_path / "fg0", max_dist=6,
                          seed=0, foreground_prob=0.0)
    hits = sum(bool((tr0._sample_patch([img], [lab])[1] > 0).any())
               for _ in range(25))
    assert hits < 25


def test_background_reg_penalizes_offforeground_dist(tmp_path):
    """``background_reg`` adds reg*mean((1-prob_gt)*|dist|) to the loss
    (stardist's train_background_reg)."""
    import jax
    cfg = _tiny_cfg((8, 16, 16))
    tr0 = TrainStarDist3D(cfg, basedir=tmp_path / "a", max_dist=6, seed=0,
                          background_reg=0.0)
    tr1 = TrainStarDist3D(cfg, basedir=tmp_path / "b", max_dist=6, seed=0,
                          background_reg=0.5)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 16, 16).astype(np.float32))
    prob_gt = jnp.zeros((1, 8, 8, 8), jnp.float32)      # all background
    dist_gt = jnp.zeros((1, 8, 8, 8, 8), jnp.float32)
    l0 = float(tr0._loss(tr0.params, x, prob_gt, dist_gt))
    l1 = float(tr1._loss(tr1.params, x, prob_gt, dist_gt))
    # same params/seed; the only difference is the reg term, and the
    # linear dist head is nonzero at init
    _, dist = tr0.net.apply(tr0.params, x[..., None])
    assert float(jnp.abs(dist).mean()) > 0
    assert l1 > l0
    # the reg rides inside loss_dist, so the composite delta carries the
    # dist_loss_weight factor (stardist weights the whole masked dist
    # loss, reg included, by train_loss_weights[1])
    np.testing.assert_allclose(
        l1 - l0,
        tr0.dist_loss_weight * 0.5 * float(jnp.abs(dist).mean()),
        rtol=1e-4)


@pytest.mark.slow
def test_stardist_training_reduces_loss(tmp_path):
    rng = np.random.RandomState(1)
    shape = (16, 32, 32)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    lab = np.zeros(shape, np.int32)
    img = rng.rand(*shape).astype(np.float32) * 0.1
    for i, (cz, cy, cx) in enumerate([(8, 8, 8), (8, 8, 24), (8, 24, 16)]):
        d2 = ((zz - cz) * 2) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2
        lab[d2 < 30] = i + 1
        img += np.exp(-d2 / 40)
    cfg = StarDistConfig(n_rays=16, grid=(1, 2, 2),
                         anisotropy=(2.0, 1.0, 1.0),
                         unet_n_filter_base=8, net_conv_after_unet=16,
                         train_patch_size=(16, 32, 32))
    tr = TrainStarDist3D(cfg, basedir=tmp_path, max_dist=12, seed=0,
                         learning_rate=1e-3)
    losses = tr.train([img], [lab], epochs=2, steps_per_epoch=15,
                      verbose=False)
    assert losses[-1] < losses[0]
    assert (tmp_path / "stardist" / "weights.npz").exists()

    # trained model should detect blobs better than chance
    from t3dct.engine.stardist import StarDist3D
    model = StarDist3D.load(tmp_path / "stardist")
    probs, dists, points, valid, prob_map = model.predict_sparse(
        img, prob_thresh=0.3)
    assert prob_map.shape == (16, 16, 16)   # grid resolution


def test_sharded_training_matches_local():
    """Data-parallel StarDist training over an 8-way mesh produces the
    same loss trajectory as single-device (deterministic sampling)."""
    from t3dct.parallel.mesh import make_mesh
    import jax

    rng = np.random.RandomState(7)
    shape = (8, 16, 16)
    lab = np.zeros(shape, np.int32)
    lab[2:6, 4:10, 4:10] = 1
    img = (lab > 0).astype(np.float32) + rng.rand(*shape).astype(
        np.float32) * 0.1
    cfg = StarDistConfig(n_rays=8, grid=(1, 2, 2),
                         anisotropy=(2.0, 1.0, 1.0),
                         unet_n_filter_base=4, net_conv_after_unet=8,
                         train_patch_size=shape)
    mesh = make_mesh(8, 1)
    tr_local = TrainStarDist3D(cfg, basedir="/tmp/sd_a", max_dist=6,
                               seed=0, batch_size=8)
    tr_shard = TrainStarDist3D(cfg, basedir="/tmp/sd_b", max_dist=6,
                               seed=0, batch_size=8, mesh=mesh)
    l1 = tr_local.train([img], [lab], epochs=1, steps_per_epoch=3,
                        verbose=False)
    l2 = tr_shard.train([img], [lab], epochs=1, steps_per_epoch=3,
                        verbose=False)
    np.testing.assert_allclose(l1, l2, rtol=1e-3)
