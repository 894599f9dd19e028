"""Sweep StarDist training recipes on THE bench scene and measure
detection quality, to pick bench.py's recipe constants.

Context: the r4 bench model (8x30 steps, prob_fg_weight=64, no
background reg) finds 111/150 cells at t=1 (scripts/real_seg_track.json)
and collapses to ~35 detections when trained 16+ epochs (NMS merges
neighbors on background dist overshoot).  The trainer now carries the
reference stardist's `train_background_reg` + `train_foreground_only`
semantics (models/train_stardist.py); this sweep measures whether they
let a longer budget raise recall without collapse.

Writes scripts/sd_recipe_tune.json: one record per recipe with
detections / GT-matched count (radius 6 scaled units) / median
nearest-detection error at t=1 and t=N_VOLS, plus train wall time.

Run on the TPU (each recipe trains 240-960 steps, ~1-5 min each).
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (enables the compilation cache on import)

RADIUS = 6.0            # scaled units; bench cells are >= 9 apart in yx


def evaluate(model, img_raw, centers_zyx):
    """Detections vs GT centers for one volume (zyx model frame)."""
    mi, ma = np.percentile(img_raw, [1.0, 99.8])
    (_, details), _ = model._finalize_instances(
        model._predict_instances_device(
            img_raw, return_labels=False, norm_minmax=(float(mi),
                                                       float(ma))))
    pts = details["points"].astype(np.float32)
    scale = np.array([bench.VOXEL_SIZE[2], 1.0, 1.0], np.float32)
    if len(pts) == 0:
        return {"n_det": 0, "n_matched": 0, "med_err": float("inf")}
    d = np.linalg.norm((pts[:, None] - centers_zyx[None]) * scale, axis=2)
    per_gt = d.min(axis=0)
    return {"n_det": int(len(pts)),
            "n_matched": int((per_gt <= RADIUS).sum()),
            "med_err": round(float(np.median(per_gt)), 3)}


def main():
    from t3dct.config import StarDistConfig
    from t3dct.engine.stardist import StarDist3D
    from t3dct.io.imageio import (load_2d_slices_at_time,
                                  percentile_normalize)
    from t3dct.models.train_stardist import TrainStarDist3D

    work = Path(tempfile.mkdtemp(prefix="t3dct_tune_"))
    raw_dir = work / "raw"
    raw_dir.mkdir(parents=True)
    images_path, centers_by_t, lab1 = bench.make_recording(raw_dir)
    img1 = load_2d_slices_at_time(images_path, t=1, do_normalize=False)
    img1n = percentile_normalize(img1.astype(np.float32))
    imgN = load_2d_slices_at_time(images_path, t=bench.N_VOLS,
                                  do_normalize=False)

    patch = (bench.Z, min(96, bench.Y), min(96, bench.X))
    recipes = [
        # name, epochs, fg_weight, background_reg, foreground_prob
        ("r3-control-8ep-w64", 8, 64.0, 0.0, 0.0),
        ("reg-8ep-w64", 8, 64.0, 1e-4, 0.9),
        ("reg-16ep-w64", 16, 64.0, 1e-4, 0.9),
        ("reg-32ep-w64", 32, 64.0, 1e-4, 0.9),
        ("reg-32ep-w16", 32, 16.0, 1e-4, 0.9),
    ]
    results = []
    for name, epochs, w, reg, fgp in recipes:
        cfg = StarDistConfig(n_rays=96, grid=bench.GRID,
                             anisotropy=(9.2, 1.0, 1.0),
                             train_patch_size=patch,
                             prob_thresh=bench.SD_PROB_THRESH)
        tr = TrainStarDist3D(cfg, basedir=work / f"sd_{name}",
                             max_dist=12, learning_rate=3e-3,
                             prob_fg_weight=w, background_reg=reg,
                             foreground_prob=fgp)
        t0 = time.perf_counter()
        losses = tr.train([img1n], [lab1],
                          epochs=epochs, steps_per_epoch=bench.SD_STEPS,
                          verbose=False)
        train_s = time.perf_counter() - t0
        model = StarDist3D.load(work / f"sd_{name}" / "stardist")
        model.max_candidates = 256
        model.render_box = (9, 33, 33)
        rec = {"recipe": name, "epochs": epochs, "fg_weight": w,
               "background_reg": reg, "foreground_prob": fgp,
               "train_s": round(train_s, 1),
               "final_loss": round(losses[-1], 4),
               "t1": evaluate(model, img1, centers_by_t[1]),
               "tN": evaluate(model, imgN, centers_by_t[bench.N_VOLS])}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = Path(__file__).parent / "sd_recipe_tune.json"
    # NOTE: the committed sd_recipe_tune.json holds the round-4 sweep in a
    # richer shape (per-recipe no_prefilter vs lmax_prefilter evals from
    # before/after the sparse_candidates local-max prefilter landed);
    # re-running overwrites it with current-default (prefilter-on) evals
    out.write_text(json.dumps({"recipes": results}, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
