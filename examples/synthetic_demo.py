"""Self-contained end-to-end demo on synthetic data (no downloads):
generates a synthetic 3D+T recording of drifting cells, trains small
StarDist3D + FFN models, segments, tracks, and extracts activities.

Run:  python examples/synthetic_demo.py --out /tmp/t3dct_demo
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
from pathlib import Path

import numpy as np

from t3dct.config import StarDistConfig, TrackingConfig
from t3dct.engine import StarDist3D, predict_and_save, track_timelapse
from t3dct.engine.tracker import TrackerLite
from t3dct.coordinates import Coordinates
from t3dct.io.imageio import save_label_slices
from t3dct.io.artifacts import ResultsTree
from t3dct.models.train_ffn import TrainFFN
from t3dct.models.train_stardist import TrainStarDist3D

SHAPE_ZYX = (16, 64, 64)
Z_RATIO = 2.0
N_VOLS = 6
N_CELLS = 8


def make_volume(t, centers0, drift, rng):
    centers = centers0 + (t - 1) * drift
    zz, yy, xx = np.mgrid[:SHAPE_ZYX[0], :SHAPE_ZYX[1], :SHAPE_ZYX[2]]
    img = rng.rand(*SHAPE_ZYX) * 0.1
    lab = np.zeros(SHAPE_ZYX, np.int32)
    for i, (cz, cy, cx) in enumerate(centers):
        d2 = ((zz - cz) * Z_RATIO) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2
        img += np.exp(-d2 / 18.0)
        lab[d2 < 16] = i + 1
    return img.astype(np.float32), lab


from t3dct.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/t3dct_demo")
    ap.add_argument("--h5", action="store_true",
                    help="exercise the HDF5 recording contract: pack the "
                         "synthetic volumes into one (T, C, Z, Y, X) h5 "
                         "and drive the whole pipeline through the "
                         '{"h5_file", "channel"} images_path dict '
                         "(reference track_stardist_single_mode-h5.ipynb)")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    raw_dir = out / "raw"
    results = out / "results"
    images_path = str(raw_dir / "raw_t%03i_z*.tif")

    rng = np.random.RandomState(0)
    centers0 = np.stack([np.full(N_CELLS, 8.0),
                         rng.uniform(10, 54, N_CELLS),
                         rng.uniform(10, 54, N_CELLS)], 1).astype(np.float32)
    drift = np.stack([np.zeros(N_CELLS),
                      rng.uniform(-0.7, 0.7, N_CELLS),
                      rng.uniform(-0.7, 0.7, N_CELLS)], 1).astype(np.float32)

    print("== generating synthetic recording")
    vols = []
    for t in range(1, N_VOLS + 1):
        img, lab = make_volume(t, centers0, drift, np.random.RandomState(t))
        img16 = (img / img.max() * 40000).astype(np.uint16)
        if args.h5:              # one recording.h5, no unread TIFF series
            vols.append(img16)
        else:
            save_label_slices(img16.transpose(1, 2, 0), raw_dir,
                              "raw_t%03i_z%04i.tif", t, use_8_bit=False,
                              compression=None)
    if args.h5:
        from t3dct.io.imageio import save_recording_h5
        save_recording_h5(out / "recording.h5", vols)
        images_path = {"h5_file": str(out / "recording.h5"), "channel": 0}
        print(f"== packed recording into {out / 'recording.h5'}")
    img1, lab1 = make_volume(1, centers0, drift, np.random.RandomState(1))
    img1n = (img1 - np.percentile(img1, 1)) / \
        (np.percentile(img1, 99.8) - np.percentile(img1, 1))

    print("== training StarDist3D")
    cfg = StarDistConfig(n_rays=16, grid=(1, 2, 2),
                         anisotropy=(Z_RATIO, 1, 1),
                         unet_n_filter_base=8, net_conv_after_unet=16,
                         train_patch_size=SHAPE_ZYX, prob_thresh=0.2)
    TrainStarDist3D(cfg, basedir=out / "sd_models", max_dist=10,
                    learning_rate=3e-3).train([img1n], [lab1], epochs=8,
                                              steps_per_epoch=30)
    model = StarDist3D.load(out / "sd_models" / "stardist")
    model.max_candidates = 64
    model.render_box = (9, 17, 17)

    print("== segmenting all volumes")
    predict_and_save(images_path, model, results)

    print("== 'manual' correction (using ground truth labels)")
    save_label_slices(lab1.transpose(1, 2, 0), results / "manual_vol1",
                      "manual_vol1_t%04i_z%04i.tif", 0, use_8_bit=True,
                      compression=None)

    print("== training FFN")
    cloud = np.concatenate([
        centers0[:, [1, 2, 0]] * np.array([1, 1, Z_RATIO])
        + np.random.RandomState(k).randn(N_CELLS, 3) * 2
        for k in range(8)])
    np.savetxt(out / "pts.txt", cloud)
    ffn = TrainFFN("ffn", points1_path=str(out / "pts.txt"),
                   basedir=out / "ffn")
    ffn.train(num_epochs=1, iteration=200, verbose=False)

    print("== tracking")
    coords = track_timelapse(
        results, str(results / "manual_vol1" / "*.tif"),
        (ffn.params, ffn.bn_state),
        voxel_size=(1, 1, Z_RATIO), interpolation_factor=2,
        t_range=(1, N_VOLS), grid=cfg.grid,
        config=TrackingConfig(beta=10.0, lambda_=3.0),
        images_path=images_path, save_figures=True)
    ResultsTree(results).export_coordinates_csv(coords)

    print("== activities")
    vol1 = Coordinates.from_real(coords[1], 2, (1, 1, Z_RATIO))
    tracker = TrackerLite(results, (ffn.params, ffn.bn_state), vol1)
    acts = tracker.activities(images_path, do_normalize=False)
    ResultsTree(results).export_activities_csv(acts)

    # cell ids get relabeled in raster order during interpolation; recover
    # the id permutation by nearest-neighbor assignment at t=1
    true1 = centers0[:, [1, 2, 0]] * np.array([1, 1, Z_RATIO])
    d1 = np.linalg.norm(coords[1][:, None, :] - true1[None, :, :], axis=2)
    assign = d1.argmin(axis=1)           # tracked id -> true id
    trueT = (centers0 + (N_VOLS - 1) * drift)[:, [1, 2, 0]] * \
        np.array([1, 1, Z_RATIO])
    err = np.linalg.norm(coords[N_VOLS] - trueT[assign], axis=1)
    print(f"median tracking error at t={N_VOLS}: {np.median(err):.2f} "
          "(real units)")
    print(f"artifacts under {results}")


if __name__ == "__main__":
    main()
