"""Legacy retrain_unet workflow: boundary removal + retraining loop +
weight selection (tracker.py:923-1044)."""

import numpy as np
import jax
import pytest

from t3dct.engine.legacy import Tracker
from t3dct.io.imageio import save_label_slices
from t3dct.models.unet3d import UNet3D
from tests.test_legacy_tracker import _volume_at, SHAPE, Z_XY_RATIO, \
    Z_SCALING


def test_remove_2d_boundary(tmp_path):
    tracker = Tracker(volume_num=1, siz_xyz=(12, 12, 2), z_xy_ratio=1,
                      z_scaling=1, noise_level=1, min_size=1, beta_tk=1,
                      lambda_tk=1, maxiter_tk=2, folder_path=str(tmp_path),
                      image_name="r%i_%i.tif", unet_model_file="u.npz",
                      ffn_model_file="f.npz")
    lab = np.zeros((12, 12, 2), np.int32)
    lab[2:6, 2:6, :] = 1
    lab[2:6, 6:10, :] = 2    # touching along y
    out = tracker._remove_2d_boundary(lab)
    # touching interface removed on both sides
    assert np.all(out[2:6, 5, :] == 0)
    assert np.all(out[2:6, 6, :] == 0)
    # cores survive
    assert np.all(out[3:5, 3, :] == 1)


@pytest.mark.slow
def test_retrain_and_select(tmp_path):
    tracker = Tracker(
        volume_num=1, siz_xyz=SHAPE, z_xy_ratio=Z_XY_RATIO,
        z_scaling=Z_SCALING, noise_level=20, min_size=20,
        beta_tk=50.0, lambda_tk=0.1, maxiter_tk=5,
        folder_path=str(tmp_path), image_name="raw_t%03i_z%03i.tif",
        unet_model_file="unet.npz", ffn_model_file="ffn.npz",
        shrink=(4, 4, 2), max_cells=64)
    img, lab, _ = _volume_at(1)
    save_label_slices(img.astype(np.uint16), tracker.paths.raw_image,
                      "raw_t%03i_z%03i.tif", 1, use_8_bit=False,
                      compression=None)
    save_label_slices(lab, tracker.paths.manual_segmentation_vol1,
                      "manual_z%03i_x%03i.tif", 0, use_8_bit=True,
                      compression=None)
    model = UNet3D(variant="a", tile_shape=(24, 24, 8), pool=(2, 2, 1),
                   down_filters=((4, 4),), up_filters=((4, 4),),
                   head_filters=(4,))
    params, state = model.init(jax.random.PRNGKey(0))
    tracker.load_unet_arrays(model, params, state)
    # save initial weights like load_unet would
    from t3dct.utils.checkpoint import save_pytree
    import os
    save_pytree((params, state), os.path.join(tracker.paths.unet_weights,
                                              "weights_initial.npz"))
    tracker.load_manual_seg()
    losses = tracker.retrain_unet(iteration=2, steps_per_epoch=8,
                                  verbose=False)
    assert len(losses) == 3
    # at least one improvement checkpoint written in 2 epochs from scratch
    import glob
    ckpts = glob.glob(os.path.join(tracker.paths.unet_weights,
                                   "unet_weights_retrain_step*.npz"))
    if ckpts:
        step = int(sorted(ckpts)[0].split("step")[-1].split(".")[0])
        tracker.select_unet_weights(step)
        assert os.path.exists(os.path.join(tracker.paths.unet_weights,
                                           "unet3_retrained.npz"))
    tracker.select_unet_weights(0)   # restore initial works


@pytest.mark.slow
def test_precompute_segmentation(tmp_path):
    tracker = Tracker(
        volume_num=2, siz_xyz=SHAPE, z_xy_ratio=Z_XY_RATIO,
        z_scaling=Z_SCALING, noise_level=20, min_size=20,
        beta_tk=50.0, lambda_tk=0.1, maxiter_tk=5,
        folder_path=str(tmp_path), image_name="raw_t%03i_z%03i.tif",
        unet_model_file="unet.npz", ffn_model_file="ffn.npz",
        shrink=(4, 4, 2), max_cells=64)
    for t in (1, 2):
        img, lab, _ = _volume_at(t)
        from t3dct.io.imageio import save_label_slices
        save_label_slices(img.astype(np.uint16), tracker.paths.raw_image,
                          "raw_t%03i_z%03i.tif", t, use_8_bit=False,
                          compression=None)
    model = UNet3D(variant="a", tile_shape=(24, 24, 8), pool=(2, 2, 1),
                   down_filters=((4, 4),), up_filters=((4, 4),),
                   head_filters=(4,))
    params, state = model.init(jax.random.PRNGKey(0))
    tracker.load_unet_arrays(model, params, state)
    tracker.precompute_segmentation()
    import os
    assert os.path.exists(os.path.join(tracker.paths.unet_cache,
                                       "t000001.npy"))
    assert os.path.exists(os.path.join(tracker.paths.unet_cache,
                                       "t000002.npy"))
