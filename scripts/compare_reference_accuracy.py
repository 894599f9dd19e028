"""Accuracy parity vs the REFERENCE tracking code on shared synthetic data.

The north-star accuracy criterion (BASELINE.json) is "cell-matching
accuracy equal to the TF reference on the worm1 demo".  The demo data is
not in this container (zero egress), but the reference CODE runs here
(TF CPU, scripts/measure_reference_baseline.py shims) — so this script
validates matching parity end-to-end on a synthetic worm1-scale
recording instead:

1. generate seg/ coordinate artifacts for T volumes of ~150 drifting
   cells (same generator as bench.py),
2. train THIS framework's FFN briefly on the vol-1 cloud,
3. copy the trained weights into the reference's TF ``FFN`` Keras model
   (Dense/BatchNorm layer mapping inverted from utils/keras_import),
4. run BOTH tracking recurrences over the same artifacts:
   - reference: ``initial_matching_ffn`` + ``simple_match`` +
     ``prgls_with_two_ref`` exactly as
     ``trackerlite.py:70-109 predict_cell_positions`` composes them
     (float64 NumPy/TF),
   - this framework: ``engine.tracker.TrackerLite.predict_cell_positions``
     (padded fixed shapes, f32 TPU/CPU path),
5. report per-volume coordinate deviation and the fraction of cells
   whose ground-truth assignment agrees at the final volume.

Run:  python scripts/compare_reference_accuracy.py
The results are recorded in BASELINE.md ("Accuracy parity" section).
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from scripts.measure_reference_baseline import install_shims  # noqa: E402

T_VOLS = 21
N_CELLS = 150
VOXEL_SIZE = (1.0, 1.0, 9.2)
INTERP = 10
Z, Y, X = 24, 401, 168


def make_seg_artifacts(results: Path):
    """GT-derived seg/coords artifacts from THE shared drifting-cell
    generator (``bench.make_drifting_centers`` — the benchmarked
    workload); jittered centers saved (y, x, z) on disk."""
    from bench import make_drifting_centers

    gt_by_t = make_drifting_centers(n_vols=T_VOLS, n_cells=N_CELLS,
                                    shape=(Z, Y, X))
    jrng = np.random.RandomState(1)
    (results / "seg").mkdir(parents=True, exist_ok=True)
    for t in range(1, T_VOLS + 1):
        pts = gt_by_t[t] + jrng.randn(*gt_by_t[t].shape).astype(
            np.float32) * 0.25
        np.save(results / "seg" / ("coords%06d.npy" % t),
                pts[:, [1, 2, 0]])            # (y, x, z) raw frame
    return gt_by_t


def copy_weights_to_tf(ffn_tf, params, state):
    """Our FFN pytree -> the reference Keras model (ffn.py:225-265):
    feat_layer1 = [Dense(61->512, no bias), BN, LeakyReLU];
    combine_feat2 = [Dense(1024->512, no bias), BN, LeakyReLU];
    pred = [Dense(512->1, sigmoid)]."""
    def bn_weights(p, s):
        return [np.asarray(p["scale"]), np.asarray(p["bias"]),
                np.asarray(s["mean"]), np.asarray(s["var"])]

    ffn_tf.feat_layer1.layers[0].set_weights([np.asarray(
        params["feat"]["w"])])
    ffn_tf.feat_layer1.layers[1].set_weights(
        bn_weights(params["feat_bn"], state["feat_bn"]))
    ffn_tf.combine_feat2.layers[0].set_weights([np.asarray(
        params["comb"]["w"])])
    ffn_tf.combine_feat2.layers[1].set_weights(
        bn_weights(params["comb_bn"], state["comb_bn"]))
    ffn_tf.pred.layers[0].set_weights([np.asarray(params["pred"]["w"]),
                                       np.asarray(params["pred"]["b"])])


def reference_recurrence(results: Path, confirmed_vol1_real, ffn_tf):
    """trackerlite.py:70-109 predict_cell_positions, single mode
    (t1 = t2 - 1, confirmed chained), run with the reference's own
    functions."""
    from CellTracker.ffn import initial_matching_ffn, normalize_points
    from CellTracker.trackerlite import prgls_with_two_ref, simple_match

    def seg_real(t):
        raw = np.load(results / "seg" / ("coords%06d.npy" % t))
        return raw * np.array([1.0, 1.0, VOXEL_SIZE[2]])

    coords = {1: np.asarray(confirmed_vol1_real, np.float64)}
    for t2 in range(2, T_VOLS + 1):
        print(f"reference recurrence t={t2}", flush=True)
        seg1 = seg_real(t2 - 1)
        seg2 = seg_real(t2)
        confirmed = coords[t2 - 1]
        conf_n, (mean, scale) = normalize_points(confirmed,
                                                 return_para=True)
        seg2_n = (seg2 - mean) / scale
        seg1_n = (seg1 - mean) / scale
        matching = initial_matching_ffn(ffn_tf, seg1_n, seg2_n, 20)
        prob, _ = simple_match(matching)
        tracked_n, _ = prgls_with_two_ref(prob, seg2_n, seg1_n, conf_n,
                                          beta=3.0, lambda_=3.0)
        coords[t2] = tracked_n * scale + mean
    return coords


def our_recurrence(results: Path, confirmed_vol1_real, ffn_weights,
                   m_step_refine: int = 0):
    from t3dct.coordinates import Coordinates
    from t3dct.engine.tracker import TrackerLite

    coord1 = Coordinates.from_real(np.asarray(confirmed_vol1_real,
                                              np.float32),
                                   INTERP, VOXEL_SIZE)
    tracker = TrackerLite(results, ffn_weights, coord1,
                          m_step_refine=m_step_refine)
    coords = {1: np.asarray(coord1.real)}
    conf = coord1
    for t2 in range(2, T_VOLS + 1):
        print(f"our recurrence t={t2}", flush=True)
        conf = tracker.predict_cell_positions(t2 - 1, t2,
                                              confirmed_coord_t1=conf)
        coords[t2] = np.asarray(conf.real)
    return coords


def main():
    install_shims()
    sys.path.insert(0, "/root/reference")
    # ~a dozen distinct compiles through the tunnel at 10-30 s each
    # without this (CLAUDE.md compile-cache rule)
    from t3dct.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    work = Path(tempfile.mkdtemp(prefix="t3dct_parity_"))
    results = work / "results"
    gt_by_t = make_seg_artifacts(results)

    # ---- train our FFN on the vol-1 cloud --------------------------------
    import t3dct  # noqa: F401  (registers the import alias)
    from t3dct.models.train_ffn import TrainFFN

    cloud = np.load(results / "seg" / "coords000001.npy") * \
        np.array([1.0, 1.0, VOXEL_SIZE[2]])
    pts_file = work / "pts.txt"
    np.savetxt(pts_file, cloud)
    trainer = TrainFFN("parity_ffn", points1_path=str(pts_file),
                       basedir=work / "ffn", seed=0)
    print("training FFN...", flush=True)
    trainer.train(num_epochs=1, iteration=600, verbose=False)
    print("FFN trained", flush=True)

    # ---- same weights into the reference's TF model ----------------------
    from CellTracker.ffn import FFN as RefFFN
    ffn_tf = RefFFN()
    ffn_tf.build(input_shape=(None, 122))
    ffn_tf(np.zeros((1, 122), np.float32))   # build the lazy inner layers
    copy_weights_to_tf(ffn_tf, trainer.params, trainer.bn_state)

    import os
    m_step_refine = int(os.environ.get("T3DCT_M_STEP_REFINE", "0"))
    confirmed1 = cloud
    ours = our_recurrence(results, confirmed1,
                          (trainer.params, trainer.bn_state),
                          m_step_refine=m_step_refine)
    refs = reference_recurrence(results, confirmed1, ffn_tf)

    # ---- compare ---------------------------------------------------------
    report = {}
    devs = []
    for t in range(2, T_VOLS + 1):
        d = np.linalg.norm(ours[t] - refs[t], axis=1)
        devs.append(d)
    all_d = np.concatenate(devs)
    # single-step deviation (t=2: both sides start from identical
    # confirmed coordinates) vs accumulated deviation at the end
    report["single_step_median_deviation"] = float(np.median(devs[0]))
    report["final_t_median_deviation"] = float(np.median(devs[-1]))
    report["median_deviation_real_units"] = float(np.median(all_d))
    report["p95_deviation_real_units"] = float(np.percentile(all_d, 95))
    report["max_deviation_real_units"] = float(all_d.max())
    tN = T_VOLS
    gt = gt_by_t[tN][:, [1, 2, 0]] * np.array([1.0, 1.0, VOXEL_SIZE[2]])
    assign_ours = np.linalg.norm(ours[tN][:, None] - gt[None],
                                 axis=2).argmin(1)
    assign_refs = np.linalg.norm(refs[tN][:, None] - gt[None],
                                 axis=2).argmin(1)
    report["assignment_agreement_tN"] = float(
        (assign_ours == assign_refs).mean())
    err_ours = np.linalg.norm(
        ours[tN] - gt[assign_ours], axis=1)
    err_refs = np.linalg.norm(
        refs[tN] - gt[assign_refs], axis=1)
    report["our_median_err_vs_gt_tN"] = float(np.median(err_ours))
    report["ref_median_err_vs_gt_tN"] = float(np.median(err_refs))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
