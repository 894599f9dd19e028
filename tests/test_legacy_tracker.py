"""Legacy Tracker facade: full end-to-end run on synthetic moving cells
(reference workflow: segment_vol1 -> load_manual_seg -> interpolate_seg ->
cal_subregions -> initiate_tracking -> track -> save_coordinates)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t3dct.engine.legacy import (Tracker, get_reference_vols,
                                 get_remote_vols, get_tracking_path)
from t3dct.io.imageio import save_label_slices
from t3dct.models.train_ffn import TrainFFN
from t3dct.models.train_unet import TrainingUNet3D
from t3dct.models.unet3d import UNet3D

SHAPE = (48, 48, 8)
Z_XY_RATIO = 2.0
Z_SCALING = 2
CENTERS0 = np.array([[12, 12, 4], [12, 36, 4], [36, 12, 4], [36, 36, 4]],
                    np.float32)
DRIFT = np.array([[1.5, 0.5, 0], [-1.0, 1.0, 0], [0.5, -1.5, 0],
                  [-0.5, -0.5, 0]], np.float32)


def _volume_at(t):
    """Raw volume + label volume with cells drifted by (t-1)*DRIFT."""
    centers = CENTERS0 + (t - 1) * DRIFT
    xx, yy, zz = np.mgrid[:SHAPE[0], :SHAPE[1], :SHAPE[2]]
    img = np.random.RandomState(t).rand(*SHAPE) * 100
    lab = np.zeros(SHAPE, np.int32)
    for i, (cx, cy, cz) in enumerate(centers):
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * Z_XY_RATIO) ** 2
        img += 8000 * np.exp(-d2 / 18.0)
        lab[d2 < 16] = i + 1
    return img.astype(np.float32), lab, centers


def test_reference_vols():
    assert get_reference_vols(False, 7) == [6]
    assert get_reference_vols(5, 4) == [1, 2, 3]
    assert get_reference_vols(5, 30, adjacent=True) == list(range(25, 30))
    remote = get_reference_vols(5, 30, adjacent=False)
    assert remote == get_remote_vols(5, 30)
    assert len(remote) <= 6 and max(remote) < 30


def test_tracking_path():
    assert "SingleMode" in get_tracking_path(False, False, "x")
    assert "EnsembleAdjctMode" in get_tracking_path(True, 5, "x")
    assert "EnsembleDstrbtMode" in get_tracking_path(False, 5, "x")


@pytest.mark.slow
def test_legacy_tracker_end_to_end(tmp_path):
    folder = str(tmp_path)
    tracker = Tracker(
        volume_num=3, siz_xyz=SHAPE, z_xy_ratio=Z_XY_RATIO,
        z_scaling=Z_SCALING, noise_level=20, min_size=20,
        beta_tk=50.0, lambda_tk=0.1, maxiter_tk=10,
        folder_path=folder, image_name="raw_t%03i_z%03i.tif",
        unet_model_file="unet.npz", ffn_model_file="ffn.npz",
        shrink=(4, 4, 2), max_cells=64)

    # ---- write raw data + manual vol-1 labels
    for t in (1, 2, 3):
        img, lab, _ = _volume_at(t)
        save_label_slices(img.astype(np.uint16), tracker.paths.raw_image,
                          "raw_t%03i_z%03i.tif", t, use_8_bit=False,
                          compression=None)
    _, lab1, _ = _volume_at(1)
    save_label_slices(lab1, tracker.paths.manual_segmentation_vol1,
                      "manual_z%03i_x%03i.tif", 0, use_8_bit=True,
                      compression=None)

    # ---- train a tiny U-Net on vol 1
    model = UNet3D(variant="a", tile_shape=(24, 24, 8), pool=(2, 2, 1),
                   down_filters=((4, 4), (4, 8)), up_filters=((8, 8), (4, 4)),
                   head_filters=(4,))
    img1, _, _ = _volume_at(1)
    trainer = TrainingUNet3D(noise_level=20, folder_path=tmp_path / "train",
                             model=model, batch_size=4)
    trainer.load_dataset_arrays(img1, lab1, img1, lab1)
    trainer.preprocess()
    trainer.train(iteration=4, steps_per_epoch=15, verbose=False)
    tracker.load_unet_arrays(model, trainer.params, trainer.bn_state)

    # ---- train a small FFN on the vol-1 point cloud (real frame)
    centers_real = CENTERS0 * np.array([1, 1, Z_XY_RATIO])
    # FFN needs a denser cloud to be meaningful; augment with jitter copies
    rng = np.random.RandomState(0)
    cloud = np.concatenate([centers_real + rng.randn(4, 3) * 2
                            for _ in range(8)])
    np.savetxt(tmp_path / "pts.txt", cloud)
    ffn_tr = TrainFFN("ffn", points1_path=str(tmp_path / "pts.txt"),
                      basedir=tmp_path / "ffn", seed=0)
    ffn_tr.train(num_epochs=1, iteration=80, verbose=False)
    tracker.load_ffn_arrays(ffn_tr.params, ffn_tr.bn_state)

    # ---- reference workflow
    tracker.segment_vol1()
    assert tracker.segresult.segmentation_auto.max() >= 3
    tracker.load_manual_seg()
    tracker.interpolate_seg()
    # notebook-facing inspection figures (tracker.py:212-262, 430-441)
    import matplotlib
    matplotlib.use("Agg")
    anim_seg = tracker.draw_segresult(percentile_high=99.8)
    assert anim_seg is not None
    tracker.draw_manual_seg1()
    fig_tk, ax_tk = tracker.subplots_tracking()
    assert len(ax_tk) == 6
    import matplotlib.pyplot as plt
    plt.close("all")
    assert tracker.cell_num_t0 == 4
    tracker.cal_subregions()
    tracker.initiate_tracking()
    tracker.track(from_volume=2)

    assert len(tracker.history.r_tracked_coordinates) == 3
    # tracked real coords at t=3 should follow the true drifted centers
    true3 = (CENTERS0 + 2 * DRIFT) * np.array([1, 1, Z_XY_RATIO])
    got3 = tracker.history.r_tracked_coordinates[-1]
    err = np.linalg.norm(got3 - true3, axis=1)
    assert np.median(err) < 3.0, f"tracking error too large: {err}"

    # artifacts
    tracker.save_coordinates()
    assert os.path.exists(os.path.join(tracker.paths.track_information,
                                       "tracked_coordinates.csv"))
    assert os.path.exists(os.path.join(
        tracker.paths.track_results, "track_results_t000002_z0001.tif"))
    # unet cache populated
    assert os.path.exists(os.path.join(tracker.paths.unet_cache,
                                       "t000002.npy"))

    # ---- ensemble mode over the same data/models (trim-mean fan-in,
    # per-volume boundary reset, EnsembleDstrbtMode results dir).
    # ensemble=3 with only 2 available reference volumes at t=3 also
    # exercises the padded member axis (members replicated to the
    # constant configured size, trim-mean over the REAL members only —
    # the ramp every 20-member worm4-style run goes through)
    tracker_e = Tracker(
        volume_num=3, siz_xyz=SHAPE, z_xy_ratio=Z_XY_RATIO,
        z_scaling=Z_SCALING, noise_level=20, min_size=20,
        beta_tk=50.0, lambda_tk=0.1, maxiter_tk=10,
        folder_path=folder, image_name="raw_t%03i_z%03i.tif",
        unet_model_file="unet.npz", ffn_model_file="ffn.npz",
        shrink=(4, 4, 2), max_cells=64, ensemble=3)
    tracker_e.load_unet_arrays(model, trainer.params, trainer.bn_state)
    tracker_e.load_ffn_arrays(ffn_tr.params, ffn_tr.bn_state)
    tracker_e.segment_vol1()
    tracker_e.load_manual_seg()
    tracker_e.interpolate_seg()
    tracker_e.initiate_tracking()
    tracker_e.track(from_volume=2)
    got3e = tracker_e.history.r_tracked_coordinates[-1]
    err_e = np.linalg.norm(got3e - true3, axis=1)
    assert np.median(err_e) < 4.0, f"ensemble tracking error: {err_e}"
    # ensemble mode resets boundary flags every volume
    assert tracker_e.cells_on_boundary.sum() == 0
    assert "EnsembleDstrbtMode" in tracker_e.paths.track_results

    # per-member x per-rep diagnostic grid (one row per reference volume)
    import matplotlib
    matplotlib.use("Agg")
    grid_path = os.path.join(folder, "pred_grid.png")
    fig = tracker_e.draw_prediction_grid(3, path=grid_path)
    assert os.path.exists(grid_path)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_correction_render_transfer_dtypes():
    """``legacy_correction_and_render`` transfer slimming: the uint8 label
    render is bitwise equal to the int32 one, and float16 weight maps
    (the h2d default in ``track_one_vol``/``match``) stay within a
    fraction of a voxel of the float32 result."""
    from t3dct.engine.legacy import legacy_correction_and_render
    from t3dct.ops.subregions import build_subregion_atlas

    _, lab, centers = _volume_at(1)
    n = int(lab.max())
    atlas = build_subregion_atlas(jnp.asarray(lab), n_cells=n,
                                  box_shape=(10, 10, 6),
                                  interpolation_factor=Z_SCALING)
    img2, _, _ = _volume_at(2)
    weights32 = (img2 / img2.max()).astype(np.float32)
    tracked_t0 = (centers * np.array([1, 1, Z_XY_RATIO])).astype(np.float32)
    i_disp0 = np.zeros((n, 3), np.int32)
    include = np.ones((n,), bool)

    r32, i32, lab32 = jax.device_get(legacy_correction_and_render(
        atlas, weights32, i_disp0, include, tracked_t0,
        Z_XY_RATIO, Z_SCALING, max_repetition=5))
    r8, i8, lab8 = jax.device_get(legacy_correction_and_render(
        atlas, weights32, i_disp0, include, tracked_t0,
        Z_XY_RATIO, Z_SCALING, max_repetition=5, labels_u8=True))
    assert lab8.dtype == np.uint8 and lab32.dtype != np.uint8
    np.testing.assert_array_equal(lab32.astype(np.uint8), lab8)
    np.testing.assert_array_equal(r32, r8)

    r16, _, _ = jax.device_get(legacy_correction_and_render(
        atlas, weights32.astype(np.float16), i_disp0, include, tracked_t0,
        Z_XY_RATIO, Z_SCALING, max_repetition=5))
    assert np.max(np.abs(r16 - r32)) < 0.5
