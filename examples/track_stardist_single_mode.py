"""v1.0 single-mode tracking (reference
Examples/use_stardist/track_stardist_single_mode.ipynb as a script).

Data contract (SURVEY Appendix A): all 3-D images in one directory, each
volume a stack of 2-D TIFF slices, filenames embedding time via a printf
pattern (e.g. "worm1_t%03i_z*.tif"); or an HDF5 dict
{"h5_file": path, "channel": c, "dset": "default"}.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

from t3dct.config import TrackingConfig
from t3dct.engine import load_stardist_model, predict_and_save, \
    track_timelapse
from t3dct.io.imageio import get_t_range
from t3dct.io.artifacts import ResultsTree


from t3dct.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help='e.g. "raw/worm1_t%%03i_z*.tif"')
    ap.add_argument("--results", default="results")
    ap.add_argument("--stardist-model", default="stardist")
    ap.add_argument("--stardist-basedir", default="stardist_models")
    ap.add_argument("--ffn-weights", required=True,
                    help=".npz from TrainFFN")
    ap.add_argument("--voxel-size", nargs=3, type=float,
                    default=[1, 1, 9.2])
    ap.add_argument("--interpolation-factor", type=int, default=10)
    ap.add_argument("--beta", type=float, default=3.0)
    ap.add_argument("--lambda", dest="lambda_", type=float, default=3.0)
    ap.add_argument("--skip-segmentation", action="store_true",
                    help="seg/ artifacts already exist")
    args = ap.parse_args()

    model = load_stardist_model(args.stardist_model, args.stardist_basedir)

    # --- cell 10: segment everything into results/seg
    if not args.skip_segmentation:
        predict_and_save(args.images, model, args.results)
        print("Now manually correct results/auto_vol1 into "
              "results/manual_vol1 (e.g. with ITK-SNAP), then re-run "
              "with --skip-segmentation.")
        return

    # --- cells 15-30: interpolate vol-1 labels, track, save artifacts
    t_max, t_min = get_t_range(args.images)
    coords = track_timelapse(
        args.results, f"{args.results}/manual_vol1/*.tif",
        args.ffn_weights,
        voxel_size=tuple(args.voxel_size),
        interpolation_factor=args.interpolation_factor,
        t_range=(t_min, t_max), grid=model.config.grid,
        config=TrackingConfig(beta=args.beta, lambda_=args.lambda_),
        images_path=args.images, save_figures=True)
    ResultsTree(args.results).export_coordinates_csv(coords)
    print(f"Tracked {len(coords)} volumes.")


if __name__ == "__main__":
    main()
