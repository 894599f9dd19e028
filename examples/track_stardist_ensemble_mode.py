"""v1.0 ensemble-mode tracking (reference
Examples/use_stardist/track_stardist_ensemble_mode.ipynb as a script):
each volume is predicted from up to --ensemble historical reference
volumes and combined with a 10%-trimmed mean.

On a multi-chip mesh the ensemble members fan out over the data axis
(parallel/ensemble.py); on one chip they run as a single vmapped batch.
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
    ap.add_argument("--images", required=True)
    ap.add_argument("--results", default="results")
    ap.add_argument("--stardist-model", default="stardist")
    ap.add_argument("--stardist-basedir", default="stardist_models")
    ap.add_argument("--ffn-weights", required=True)
    ap.add_argument("--voxel-size", nargs=3, type=float,
                    default=[1, 1, 9.2])
    ap.add_argument("--interpolation-factor", type=int, default=10)
    ap.add_argument("--ensemble", type=int, default=20)
    ap.add_argument("--adjacent", action="store_true")
    ap.add_argument("--skip-segmentation", action="store_true")
    args = ap.parse_args()

    model = load_stardist_model(args.stardist_model, args.stardist_basedir)
    if not args.skip_segmentation:
        predict_and_save(args.images, model, args.results)
        print("Correct auto_vol1 -> manual_vol1, then re-run with "
              "--skip-segmentation.")
        return

    t_max, t_min = get_t_range(args.images)
    coords = track_timelapse(
        args.results, f"{args.results}/manual_vol1/*.tif",
        args.ffn_weights,
        voxel_size=tuple(args.voxel_size),
        interpolation_factor=args.interpolation_factor,
        t_range=(t_min, t_max), grid=model.config.grid,
        config=TrackingConfig(ensemble=True,
                              sampling_number=args.ensemble,
                              adjacent=args.adjacent),
        images_path=args.images, save_figures=True)
    ResultsTree(args.results).export_coordinates_csv(coords)


if __name__ == "__main__":
    main()
