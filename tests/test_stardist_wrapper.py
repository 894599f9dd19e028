"""Wrapper-parity helpers around the StarDist workflow
(engine/stardist.py: load_training_images / save_arrays_to_folder /
save_auto_seg_vol1 / fill_label_holes / print_dict, viz.plot_img_label_*,
io.imageio.imread_volume) — reference ``stardistwrapper.py:140-211,284-329``.
"""

import numpy as np
from PIL import Image

from t3dct.engine.stardist import (fill_label_holes, load_training_images,
                                   print_dict, save_arrays_to_folder,
                                   save_auto_seg_vol1)
from t3dct.io.imageio import imread_volume


def _write_volume_tiff(path, vol):
    frames = [Image.fromarray(z) for z in vol]
    frames[0].save(path, save_all=True, append_images=frames[1:])


def test_imread_volume_multipage(tmp_path):
    vol = (np.random.RandomState(0).rand(5, 8, 9) * 60000).astype(np.uint16)
    _write_volume_tiff(tmp_path / "v.tif", vol)
    got = imread_volume(tmp_path / "v.tif")
    np.testing.assert_array_equal(got, vol)
    # single-page stays 2-D
    Image.fromarray(vol[0]).save(tmp_path / "s.tif")
    assert imread_volume(tmp_path / "s.tif").shape == (8, 9)


def test_fill_label_holes():
    lbl = np.zeros((5, 7, 7), np.int32)
    lbl[1:4, 1:6, 1:6] = 1
    lbl[2, 3, 3] = 0          # hole fully interior in 3D
    lbl[0, 0, 6] = 2
    filled = fill_label_holes(lbl)
    assert filled[2, 3, 3] == 1
    assert filled[0, 0, 6] == 2
    assert (filled == 0).sum() == (lbl == 0).sum() - 1


def test_load_training_images_single_volume(tmp_path, capsys):
    img_dir, lbl_dir = tmp_path / "imgs", tmp_path / "lbls"
    img_dir.mkdir(), lbl_dir.mkdir()
    rng = np.random.RandomState(1)
    img = (rng.rand(4, 16, 16) * 60000).astype(np.uint16)
    lbl = np.zeros((4, 16, 16), np.int32)
    lbl[1:3, 4:8, 4:8] = 1
    _write_volume_tiff(img_dir / "t001.tif", img)
    _write_volume_tiff(lbl_dir / "t001.tif", lbl.astype(np.uint16))

    X, Y, X_trn, Y_trn, X_val, Y_val, n_channel = load_training_images(
        str(img_dir / "*.tif"), str(lbl_dir / "*.tif"),
        max_projection=True, plot=False)
    out = capsys.readouterr().out
    assert "only one training data" in out
    assert n_channel == 1
    assert len(X) == 2 and len(X_trn) == 1 and len(X_val) == 1
    # normalized to ~[0, 1] by the 1/99.8 percentiles
    assert -0.2 < X[0].min() < 0.2 and 0.8 < X[0].max() < 1.2
    assert Y[0].max() == 1


def test_load_training_images_split(tmp_path):
    img_dir, lbl_dir = tmp_path / "imgs", tmp_path / "lbls"
    img_dir.mkdir(), lbl_dir.mkdir()
    rng = np.random.RandomState(2)
    for i in range(7):
        img = (rng.rand(2, 8, 8) * 60000).astype(np.uint16)
        lbl = (rng.rand(2, 8, 8) > 0.8).astype(np.uint16)
        _write_volume_tiff(img_dir / f"t{i:03d}.tif", img)
        _write_volume_tiff(lbl_dir / f"t{i:03d}.tif", lbl)
    X, Y, X_trn, Y_trn, X_val, Y_val, _ = load_training_images(
        str(img_dir / "*.tif"), str(lbl_dir / "*.tif"), plot=False)
    # seeded 15% split: max(1, round(0.15*7)) = 1 validation volume
    assert len(X) == 7 and len(X_val) == 1 and len(X_trn) == 6


def test_save_arrays_and_auto_seg(tmp_path):
    arrays = [np.arange(6).reshape(2, 3), np.ones((3, 3))]
    save_arrays_to_folder(arrays, tmp_path / "coords")
    got = np.load(tmp_path / "coords" / "coords0001.npy")
    np.testing.assert_array_equal(got, arrays[0])
    assert (tmp_path / "coords" / "coords0002.npy").exists()

    labels_xyz = np.zeros((8, 8, 3), np.int32)
    labels_xyz[2:4, 2:4, 1] = 300          # forces uint16
    save_auto_seg_vol1(labels_xyz, tmp_path / "res")
    from glob import glob
    files = sorted(glob(str(tmp_path / "res" / "auto_vol1" / "*.tif")))
    assert len(files) == 3
    z1 = np.asarray(Image.open(files[1]))
    assert z1[2, 2] == 300

    print_dict({"a": 1})   # smoke


def test_plot_img_label_helpers(tmp_path):
    from t3dct import viz
    img = np.random.RandomState(0).rand(4, 16, 16).astype(np.float32)
    lbl = np.zeros((4, 16, 16), np.int32)
    lbl[1:3, 4:8, 4:8] = 1
    viz.plot_img_label_center_slice(img, lbl, path=tmp_path / "c.png")
    viz.plot_img_label_max_projection(img, lbl, path=tmp_path / "m.png")
    viz.plot_img_label_max_projection_xz(img, lbl, scale_z=2,
                                         path=tmp_path / "x.png")
    for f in ("c.png", "m.png", "x.png"):
        assert (tmp_path / f).stat().st_size > 0
