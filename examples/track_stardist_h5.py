"""v1.0 tracking from an HDF5 recording (reference
Examples/use_stardist/track_stardist_single_mode-h5.ipynb as a script).

Data contract (SURVEY Appendix A, ``stardistwrapper.py:50-72``): one HDF5
dataset of shape (Time, Channel, Depth, Height, Width); the images_path
is the dict ``{"h5_file": <path>, "channel": <int>, "dset": "default"}``.
``t3dct.io.imageio.save_recording_h5`` writes this layout from a volume
iterator if you need to convert a TIFF series.

Run:
  python examples/track_stardist_h5.py \
      --h5 recording.h5 --channel 0 \
      --stardist-model stardist_worm4 --ffn-weights ffn.npz \
      --results ./results
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

from t3dct.config import TrackingConfig
from t3dct.engine import load_stardist_model, predict_and_save, \
    track_timelapse
from t3dct.io.artifacts import ResultsTree
from t3dct.io.imageio import get_t_range
from t3dct.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5", required=True, help="HDF5 recording (TCZYX)")
    ap.add_argument("--channel", type=int, default=0)
    ap.add_argument("--dset", default="default")
    ap.add_argument("--results", default="results")
    ap.add_argument("--stardist-model", default="stardist")
    ap.add_argument("--stardist-basedir", default="stardist_models")
    ap.add_argument("--ffn-weights", required=True)
    ap.add_argument("--voxel-size", nargs=3, type=float,
                    default=[1, 1, 1])
    ap.add_argument("--interpolation-factor", type=int, default=1)
    ap.add_argument("--beta", type=float, default=3.0)
    ap.add_argument("--lambda", dest="lambda_", type=float, default=3.0)
    ap.add_argument("--ensemble", type=int, default=0,
                    help="ensemble member count (0 = single mode)")
    ap.add_argument("--skip-segmentation", action="store_true")
    args = ap.parse_args()

    images_path = {"h5_file": args.h5, "channel": args.channel,
                   "dset": args.dset}
    model = load_stardist_model(args.stardist_model, args.stardist_basedir)

    if not args.skip_segmentation:
        predict_and_save(images_path, model, args.results)
        print("Now manually correct results/auto_vol1 into "
              "results/manual_vol1 (e.g. with ITK-SNAP), then re-run "
              "with --skip-segmentation.")
        return

    t_max, t_min = get_t_range(images_path)
    cfg = TrackingConfig(beta=args.beta, lambda_=args.lambda_,
                         ensemble=bool(args.ensemble),
                         sampling_number=args.ensemble or 20)
    coords = track_timelapse(
        args.results, f"{args.results}/manual_vol1/*.tif",
        args.ffn_weights,
        voxel_size=tuple(args.voxel_size),
        interpolation_factor=args.interpolation_factor,
        t_range=(t_min, t_max), grid=model.config.grid,
        config=cfg, images_path=images_path, save_figures=True)
    ResultsTree(args.results).export_coordinates_csv(coords)
    print(f"Tracked {len(coords)} volumes from {args.h5}.")


if __name__ == "__main__":
    main()
