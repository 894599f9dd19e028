"""U-Net trainer: patch division parity, augmentation invariants, and a
short training run that must reduce loss on synthetic blobs."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t3dct.models.train_unet import (TrainingUNet3D, divide_img,
                                     augment_batch)
from t3dct.models.unet3d import UNet3D


def _divide_img_reference(img, unet_siz):
    """Direct port of unet3d.py:282-307 for parity checking."""
    x_siz, y_siz, z_siz = img.shape
    x_input, y_input, z_input = unet_siz
    img_list = []
    for i, j, k in itertools.product(range(x_siz * 2 // x_input),
                                     range(y_siz * 2 // y_input),
                                     range(z_siz * 2 // z_input)):
        idx_x = i * x_input // 2 if i * x_input // 2 + x_input <= x_siz \
            else x_siz - x_input
        idx_y = j * y_input // 2 if j * y_input // 2 + y_input <= y_siz \
            else y_siz - y_input
        idx_z = k * z_input // 2 if k * z_input // 2 + z_input <= z_siz \
            else z_siz - z_input
        img_list.append(img[idx_x:idx_x + x_input, idx_y:idx_y + y_input,
                            idx_z:idx_z + z_input])
    return np.expand_dims(np.array(img_list), axis=4)


def test_divide_img_parity():
    rng = np.random.RandomState(0)
    img = rng.rand(50, 44, 10).astype(np.float32)
    got = divide_img(img, (32, 32, 8))
    want = _divide_img_reference(img, (32, 32, 8))
    np.testing.assert_array_equal(got, want)


def test_augment_shared_transform():
    """Image and label must receive the SAME transform; z layers too."""
    rng = np.random.RandomState(1)
    img = rng.rand(2, 24, 24, 3, 1).astype(np.float32)
    # label = thresholded image -> after identical warping, high-image
    # regions should still coincide with label-1 regions
    lab = (img > 0.8).astype(np.int32)
    out_img, out_lab = augment_batch(jax.random.PRNGKey(0),
                                     jnp.asarray(img), jnp.asarray(lab))
    out_img, out_lab = np.asarray(out_img), np.asarray(out_lab)
    assert out_img.shape == img.shape and out_lab.shape == lab.shape
    # where the warped label is 1 the warped image must be high on average
    sel = out_lab > 0
    if sel.sum() > 10:
        assert out_img[sel].mean() > out_img.mean() + 0.1
    # z layers share the transform: correlation between warped z-layers'
    # label masks and image peaks is consistent across z
    for z in range(3):
        s = out_lab[0, :, :, z, 0] > 0
        if s.sum() > 3:
            assert out_img[0, :, :, z, 0][s].mean() > \
                out_img[0, :, :, z, 0].mean()


@pytest.mark.slow
def test_unet_training_reduces_loss(tmp_path):
    rng = np.random.RandomState(2)
    shape = (48, 48, 8)
    xx, yy, zz = np.mgrid[:shape[0], :shape[1], :shape[2]]
    label = np.zeros(shape, np.int32)
    img = rng.rand(*shape) * 50
    for cx, cy in [(12, 12), (12, 36), (36, 12), (36, 36)]:
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - 4) * 4) ** 2
        label[d2 < 30] = 1
        img += 3000 * np.exp(-d2 / 40)
    model = UNet3D(variant="a", tile_shape=(24, 24, 8), pool=(2, 2, 1),
                   down_filters=((4, 4), (4, 8)), up_filters=((8, 8), (4, 4)),
                   head_filters=(4,))
    tr = TrainingUNet3D(noise_level=10.0, folder_path=tmp_path, model=model,
                        batch_size=4)
    tr.load_dataset_arrays(img, label, img, label)
    tr.preprocess()
    assert tr.train_subimage.shape[1:4] == (24, 24, 8)
    losses = tr.train(iteration=3, steps_per_epoch=10, verbose=False)
    assert len(losses) == 3
    assert losses[-1] < losses[0] * 1.05  # trending down or flat, not up
    assert (tmp_path / "models" / "weights_training_step1.npz").exists()
    tr.select_weights(1)
    assert (tmp_path / "models" / "unet3_pretrained.npz").exists()

    # the notebook-facing inspection figures (train_unet.ipynb /
    # reference unet3d.py draw_* methods) must render on Agg
    import matplotlib
    matplotlib.use("Agg")
    tr.draw_dataset(path=tmp_path / "ds.png")
    tr.draw_norm_dataset(path=tmp_path / "norm.png")
    tr.draw_divided_train_data(n=4, path=tmp_path / "div.png")
    tr.draw_prediction(path=tmp_path / "pred.png")
    for f in ("ds.png", "norm.png", "div.png", "pred.png"):
        assert (tmp_path / f).exists()
    import matplotlib.pyplot as plt
    plt.close("all")


@pytest.mark.slow
def test_unet_training_sharded_matches_local(tmp_path):
    """Mesh-sharded U-Net training matches single-device (same seeds)."""
    from t3dct.parallel.mesh import make_mesh

    rng = np.random.RandomState(5)
    shape = (32, 32, 8)
    img = rng.rand(*shape).astype(np.float32) * 100
    label = (img > 70).astype(np.int32)
    model = UNet3D(variant="a", tile_shape=(16, 16, 8), pool=(2, 2, 1),
                   down_filters=((4, 4),), up_filters=((4, 4),),
                   head_filters=(4,))
    mesh = make_mesh(2, 4)
    runs = []
    for m in (None, mesh):
        tr = TrainingUNet3D(noise_level=10.0,
                            folder_path=tmp_path / f"m{m is not None}",
                            model=model, batch_size=4, mesh=m)
        tr.load_dataset_arrays(img, label, img, label)
        tr.preprocess()
        runs.append(tr.train(iteration=2, steps_per_epoch=4,
                             verbose=False))
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-3)


def test_augment_labels_survive_float_noise():
    """Regression: bilinear label interpolation in f32 produced values
    like 0.99999994 on mathematically-constant regions, and the int
    truncation (the reference's own cast semantics, unet3d.py:336-342,
    where scipy's f64 interpolation is noise-free) zeroed 1-6% of
    interior label pixels per batch.  An all-ones label volume must
    survive ANY affine with reflect boundary exactly."""
    import jax
    lab = np.ones((2, 32, 32, 4, 1), np.int32)
    img = np.ones((2, 32, 32, 4, 1), np.float32)
    for seed in range(4):
        _, out = augment_batch(jax.random.PRNGKey(seed), img, lab)
        assert int((np.asarray(out) == 0).sum()) == 0
