"""Train StarDist3D (reference Examples/use_stardist training notebook).

Expects pairs of 3-D TIFF volumes: --train-images / --train-labels globs
with matching filenames (stardistwrapper.load_training_images contract).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
from glob import glob

import numpy as np

from t3dct.engine.stardist import configure
from t3dct.io.imageio import imread, percentile_normalize
from t3dct.models.train_stardist import TrainStarDist3D


from t3dct.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-images", required=True)
    ap.add_argument("--train-labels", required=True)
    ap.add_argument("--basedir", default="stardist_models")
    ap.add_argument("--model-name", default="stardist")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--steps-per-epoch", type=int, default=100)
    args = ap.parse_args()

    xs = sorted(glob(args.train_images))
    ys = sorted(glob(args.train_labels))
    assert len(xs) > 0 and len(xs) == len(ys), "image/label mismatch"
    X = [percentile_normalize(imread(p).astype(np.float32)) for p in xs]
    Y = [imread(p).astype(np.int32) for p in ys]

    cfg = configure(Y, n_channel=1)
    print("config:", cfg)
    trainer = TrainStarDist3D(cfg, basedir=args.basedir,
                              model_name=args.model_name)
    trainer.train(X, Y, epochs=args.epochs,
                  steps_per_epoch=args.steps_per_epoch)
    print(f"saved model to {args.basedir}/{args.model_name}")


if __name__ == "__main__":
    main()
