"""Train StarDist3D (reference Examples/use_stardist training notebook).

Expects pairs of 3-D TIFF volumes: --train-images / --train-labels globs
with matching filenames (stardistwrapper.load_training_images contract).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

from t3dct.engine.stardist import configure, load_training_images
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

    # multi-page 3-D volumes + hole filling + seeded 15% val split — the
    # reference's own loader contract (stardistwrapper.py:168-211); a
    # plain imread() would read only the first TIFF page of each volume
    (X, Y, X_trn, Y_trn, X_val, Y_val,
     n_channel) = load_training_images(args.train_images,
                                       args.train_labels, plot=False)

    cfg = configure(Y, n_channel=n_channel)
    print("config:", cfg)
    trainer = TrainStarDist3D(cfg, basedir=args.basedir,
                              model_name=args.model_name)
    trainer.train(X_trn, Y_trn, epochs=args.epochs,
                  steps_per_epoch=args.steps_per_epoch,
                  X_val=X_val, Y_val=Y_val)

    # the reference workflow's final step: tune prob/nms thresholds on
    # the validation volumes and persist them in the model folder
    # (stardist 2_training.ipynb optimize_thresholds)
    model_dir = f"{args.basedir}/{args.model_name}"
    from t3dct.engine.metrics import optimize_thresholds
    from t3dct.engine.stardist import StarDist3D
    model = StarDist3D.load(model_dir)
    optimize_thresholds(model, X_val, Y_val)
    model.save(model_dir)
    print(f"saved model (with optimized thresholds) to {model_dir}")


if __name__ == "__main__":
    main()
