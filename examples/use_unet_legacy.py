"""Legacy v0.4 U-Net workflow (reference
Examples/use_unet/single_mode_worm1-clear.ipynb /
ensemble_mode_worm4-clear.ipynb as a script).

Folder layout (created automatically, tracker.py:738-753):
    <folder>/data/               raw per-(t,z) TIFFs named by --image-name
    <folder>/models/             unet + ffn .npz checkpoints
    <folder>/manual_vol1/        proofed vol-1 label slices (user input)
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

from t3dct.engine.legacy import Tracker


from t3dct.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", required=True)
    ap.add_argument("--image-name", default="raw_t%04i_z%04i.tif")
    ap.add_argument("--volume-num", type=int, required=True)
    ap.add_argument("--siz-xyz", nargs=3, type=int, required=True)
    ap.add_argument("--z-xy-ratio", type=float, default=9.2)
    ap.add_argument("--z-scaling", type=int, default=10)
    ap.add_argument("--noise-level", type=float, default=200)
    ap.add_argument("--min-size", type=int, default=100)
    ap.add_argument("--beta", type=float, default=300)
    ap.add_argument("--lambda", dest="lambda_", type=float, default=0.1)
    ap.add_argument("--maxiter", type=int, default=20)
    ap.add_argument("--unet-model", default="unet3_pretrained.npz")
    ap.add_argument("--ffn-model", default="ffn_model.npz")
    ap.add_argument("--ensemble", type=int, default=0,
                    help="0 = single mode; N = N-member ensemble")
    ap.add_argument("--adjacent", action="store_true")
    ap.add_argument("--retrain", type=int, default=0,
                    help="retrain U-Net for N epochs on manual vol 1")
    ap.add_argument("--skip-segmentation", action="store_true",
                    help="manual_vol1/ proofread labels already exist")
    args = ap.parse_args()

    tracker = Tracker(
        volume_num=args.volume_num, siz_xyz=tuple(args.siz_xyz),
        z_xy_ratio=args.z_xy_ratio, z_scaling=args.z_scaling,
        noise_level=args.noise_level, min_size=args.min_size,
        beta_tk=args.beta, lambda_tk=args.lambda_, maxiter_tk=args.maxiter,
        folder_path=args.folder, image_name=args.image_name,
        unet_model_file=args.unet_model, ffn_model_file=args.ffn_model,
        ensemble=args.ensemble or False, adjacent=args.adjacent)

    tracker.load_unet()
    tracker.load_ffn()
    # two-phase workflow, as in the reference notebooks: segmentation
    # first, then the user proofreads auto_vol1/ into manual_vol1/ before
    # tracking can start
    if not args.skip_segmentation:
        tracker.segment_vol1()       # writes auto_vol1/ for proofreading
        print("Now manually correct auto_vol1/ into manual_vol1/ (e.g. "
              "with ITK-SNAP), then re-run with --skip-segmentation.")
        return
    tracker.load_manual_seg()        # reads manual_vol1/
    if args.retrain:
        val_losses = tracker.retrain_unet(iteration=args.retrain)
        # checkpoints exist only at val-improvement steps; pick the best
        # step (the notebook has the user choose it from the printed
        # losses) — step 0 restores the initial weights if nothing beat
        # the pre-retrain loss
        import numpy as np
        best = int(np.argmin(val_losses))
        tracker.select_unet_weights(best)
    tracker.interpolate_seg()
    tracker.cal_subregions()
    tracker.initiate_tracking()
    tracker.track(from_volume=2)
    tracker.save_coordinates()


if __name__ == "__main__":
    main()
