"""Tracking-on-REAL-StarDist-artifacts measurement (VERDICT r2 weak #7).

``bench.py`` replaces the seg/ artifacts with ground-truth-derived
coords + gaussian prob maps before timing the tracking stage, because a
random-init StarDist cannot produce the converging inputs the PR-GLS EM
needs.  This script closes the disclosed gap end-to-end instead: it
trains a small StarDist3D on the bench scene's vol-1 ground-truth labels
(exactly the ``examples/synthetic_demo.py`` recipe at worm1 scale),
segments the whole recording with THAT model, and runs the identical
``track_timelapse`` measurement on the model's actual artifacts — so the
benched tracking consumes real segmentation output (seg misses/splits
and all), matching what the e2e tests exercise.

Run on the TPU:  python scripts/bench_real_seg.py
Writes scripts/real_seg_track.json; results recorded in BASELINE.md.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench                                       # noqa: E402
from bench import (GRID, N_VOLS, Z, bench_track,
                   make_recording)                 # noqa: E402

EPOCHS = bench.SD_EPOCHS        # the bench training recipe (module-level
                                # so the CPU smoke harness can shrink it)
PROB_THRESH = bench.SD_PROB_THRESH


def train_real_model(raw_dir: Path, lab1, out: Path):
    """The bench's trained model (same scene, same recipe, shared weight
    cache under ~/.cache/t3dct/bench — a fresh train lands there too)."""
    t0 = time.perf_counter()
    model, train_s = bench.get_trained_model(raw_dir, lab1)
    if train_s == 0.0:
        train_s = time.perf_counter() - t0      # cache load time
    return model, train_s


def main():
    from t3dct.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    print("devices:", jax.devices(), flush=True)

    work = Path(tempfile.mkdtemp(prefix="t3dct_realseg_"))
    raw_dir = work / "raw"
    raw_dir.mkdir(parents=True)
    results = work / "results"
    images_path, centers_by_t, lab1 = make_recording(raw_dir)

    model, train_s = train_real_model(raw_dir, lab1, work)
    print(f"StarDist trained in {train_s:.0f} s", flush=True)

    from t3dct.engine.stardist import predict_and_save
    t0 = time.perf_counter()
    predict_and_save(images_path, model, results)
    seg_s = time.perf_counter() - t0

    # how well did the real segmentation do? (centers found per volume)
    n_cells = {t: int(np.load(results / "seg" / ("coords%06d.npy" % t))
                      .shape[0]) for t in (1, N_VOLS)}
    print(f"real seg: {n_cells} cells found (GT "
          f"{centers_by_t[1].shape[0]})", flush=True)
    if min(n_cells.values()) == 0:
        raise RuntimeError(
            f"trained model found no cells ({n_cells}) — raise EPOCHS "
            f"or lower PROB_THRESH (={PROB_THRESH}); tracking on empty "
            "point sets would be meaningless")

    # the identical tracking measurement bench.py runs — but on the real
    # artifacts this time (no write_gt_seg_artifacts overwrite)
    track_per_vol, med_err, _ = bench_track(results, lab1)

    out = {"train_s": round(train_s, 1),
           "seg_wall_s_all_vols": round(seg_s, 1),
           "cells_found_t1": n_cells[1],
           "cells_found_tN": n_cells[N_VOLS],
           "cells_gt": int(centers_by_t[1].shape[0]),
           "track_ms_per_vol": round(track_per_vol * 1e3, 1),
           "tracking_median_err_vs_model_coords": round(med_err, 2)}
    out_p = Path(__file__).parent / "real_seg_track.json"
    out_p.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
