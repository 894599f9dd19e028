"""Train the FFN matcher (reference Examples FFN training notebook /
ffn.py:148-222): from a CSV/txt point cloud or a proofed label volume."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

from t3dct.models.train_ffn import TrainFFN


from t3dct.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-name", default="ffn_model")
    ap.add_argument("--points", help="txt/CSV of (n, 3) cell positions")
    ap.add_argument("--segmentation",
                    help='glob of proofed vol-1 label slices, e.g. '
                         '"results/manual_vol1/*.tif"')
    ap.add_argument("--voxel-size", nargs=3, type=float, default=[1, 1, 1])
    ap.add_argument("--basedir", default="ffn_models")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--iterations", type=int, default=5000)
    args = ap.parse_args()

    trainer = TrainFFN(args.model_name, points1_path=args.points,
                       segmentation1_path=args.segmentation,
                       voxel_size=tuple(args.voxel_size),
                       basedir=args.basedir)
    trainer.train(num_epochs=args.epochs, iteration=args.iterations)


if __name__ == "__main__":
    main()
