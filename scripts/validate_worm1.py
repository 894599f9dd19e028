"""One-command real-data validation runbook (VERDICT r2 #7).

The north-star accuracy criterion (BASELINE.json) — cell-matching
accuracy equal to the TF reference on the worm1 demo — is blocked only
by data: this container has zero egress, so the OSF demo recording
(reference README.md:67-69) and the pretrained model folders cannot be
downloaded.  The moment they are mounted, THIS script runs the whole
comparison:

  python scripts/validate_worm1.py \
      --images "/data/worm1/raw/worm1_t%03i_z*.tif" \
      --stardist-dir /data/models/stardist_worm1 \
      --ffn /data/models/ffn_worm1.h5 \
      --results /tmp/worm1_results

Steps (mirroring Examples/use_stardist/track_stardist_single_mode.ipynb
cells 6-30):
  1. load the StarDist3D model folder — either the reference's
     stardist-0.8 format (config.json + thresholds.json + weights_*.h5,
     imported bit-faithfully via utils/keras_import, arch="keras") or
     this framework's (weights.npz),
  2. ``predict_and_save`` every volume into results/seg,
  3. vol-1 proofreading: uses results/manual_vol1 if present, else falls
     back to the auto segmentation (flagged in the report),
  4. ``track_timelapse`` (this framework, single mode),
  5. the reference's OWN tracking recurrence (TF 2.21 in-container:
     ``CellTracker.trackerlite`` composition, float64) over the SAME seg
     artifacts with the SAME FFN weights (.h5 loaded into the
     reference's Keras FFN, or .npz weights copied into it),
  6. report: per-volume coordinate deviation, GT-free assignment
     agreement (do both recurrences keep identical cell identities), and
     — if the demo's published tracking coords are present
     (``--reference-coords`` dir of coords*.npy) — accuracy vs those.

Segmentation-parity caveat: the stardist C++ package is not installed
here, so the REFERENCE side consumes this framework's seg artifacts too
(seg parity is validated separately: utils/keras_import forward
agreement <= 1e-5 vs TF, and the NMS/render golden tests).

Smoke-tested end-to-end on synthetic stand-in directories by
tests/test_validate_worm1.py.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def run_validation(images_path, results_dir, stardist_dir, ffn_weights,
                   voxel_size=(1.0, 1.0, 9.2), interpolation_factor=10,
                   beta=3.0, lambda_=3.0, t_range=None,
                   with_reference=True, reference_coords=None,
                   max_candidates=None, render_box=None) -> dict:
    import t3dct  # noqa: F401
    from t3dct.engine.stardist import (StarDist3D, load_stardist_keras_dir,
                                       predict_and_save)
    from t3dct.engine.pipeline import track_timelapse
    from t3dct.config import TrackingConfig
    from t3dct.io.imageio import get_t_range
    from t3dct.io.artifacts import ResultsTree
    from t3dct.utils import enable_compilation_cache

    enable_compilation_cache()
    results_dir = Path(results_dir)
    report = {}

    # ---- 1. model ---------------------------------------------------------
    stardist_dir = Path(stardist_dir)
    if (stardist_dir / "weights.npz").exists():
        model = StarDist3D.load(stardist_dir)
        report["stardist_format"] = "t3dct"
    else:
        model = load_stardist_keras_dir(stardist_dir)
        report["stardist_format"] = "keras"
    if max_candidates is not None:
        model.max_candidates = int(max_candidates)
    if render_box is not None:
        model.render_box = tuple(render_box)
    report["thresholds"] = dict(model._thresholds)

    # ---- 2. segment -------------------------------------------------------
    t_max, t_min = get_t_range(images_path)
    if t_range is not None:
        t_min, t_max = t_range
    tree = ResultsTree(results_dir)
    have_seg = all((tree.seg_dir / f"coords{t:06d}.npy").exists()
                   for t in range(t_min, t_max + 1))
    if not have_seg:
        predict_and_save(images_path, model, results_dir,
                         volumes=list(range(t_min, t_max + 1)))
    report["volumes"] = [t_min, t_max]

    # ---- 3. vol-1 labels --------------------------------------------------
    manual_glob = results_dir / "manual_vol1" / "*.tif"
    if list((results_dir / "manual_vol1").glob("*.tif")):
        report["vol1_labels"] = "manual"
    else:
        manual_glob = results_dir / "auto_vol1" / "*.tif"
        report["vol1_labels"] = "auto (no manual_vol1 found)"

    # ---- 4. track (this framework) ---------------------------------------
    ours = track_timelapse(
        results_dir, str(manual_glob), ffn_weights,
        voxel_size=tuple(voxel_size),
        interpolation_factor=int(interpolation_factor),
        t_range=(t_min, t_max), grid=tuple(model.config.grid),
        config=TrackingConfig(beta=beta, lambda_=lambda_),
        images_path=images_path, verbose=True)

    # ---- 5. reference recurrence over the same artifacts ------------------
    if with_reference:
        refs = _reference_recurrence(
            results_dir, ffn_weights, ours[t_min],
            voxel_size, t_min, t_max, beta, lambda_)
        devs = [np.linalg.norm(ours[t] - refs[t], axis=1)
                for t in range(t_min + 1, t_max + 1)]
        all_d = np.concatenate(devs)
        report["median_deviation_real_units"] = float(np.median(all_d))
        report["p95_deviation_real_units"] = float(
            np.percentile(all_d, 95))
        report["final_t_median_deviation"] = float(np.median(devs[-1]))
        # identity agreement: nearest segmented cell at final t
        seg_n = tree.load_seg_coords(t_max) * np.array(
            [1.0, 1.0, voxel_size[2]])
        a_o = np.linalg.norm(ours[t_max][:, None] - seg_n[None],
                             axis=2).argmin(1)
        a_r = np.linalg.norm(refs[t_max][:, None] - seg_n[None],
                             axis=2).argmin(1)
        report["assignment_agreement_final_t"] = float(
            (a_o == a_r).mean())

    # ---- 6. vs published reference coords (if provided) -------------------
    if reference_coords:
        errs_by_t = []
        for t in range(t_min, t_max + 1):
            f = Path(reference_coords) / f"coords{t:06d}.npy"
            if not f.exists():
                continue
            pub = np.load(f) * np.array([1.0, 1.0, voxel_size[2]])
            if pub.shape == ours[t].shape:
                errs_by_t.append(np.linalg.norm(ours[t] - pub, axis=1))
        if errs_by_t:
            e = np.concatenate(errs_by_t)
            report["vs_published_median_real_units"] = float(np.median(e))
            report["vs_published_p95_real_units"] = float(
                np.percentile(e, 95))

    out = results_dir / "validate_worm1_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"report written to {out}")
    return report


def _reference_recurrence(results_dir, ffn_weights, confirmed1_real,
                          voxel_size, t_min, t_max, beta, lambda_):
    """The reference's own v1.0 composition (trackerlite.py:70-109) run
    in-container (TF CPU, float64) over the seg/ artifacts."""
    from scripts.measure_reference_baseline import install_shims
    install_shims()
    sys.path.insert(0, "/root/reference")
    from CellTracker.ffn import FFN as RefFFN, initial_matching_ffn, \
        normalize_points
    from CellTracker.trackerlite import prgls_with_two_ref, simple_match

    ffn_tf = RefFFN()
    ffn_tf.build(input_shape=(None, 122))
    ffn_tf(np.zeros((1, 122), np.float32))
    if isinstance(ffn_weights, (str, Path)) and \
            str(ffn_weights).endswith(".h5"):
        try:
            ffn_tf.load_weights(str(ffn_weights))
        except Exception:
            # legacy full-model file: import through our reader, then copy
            from t3dct.utils.keras_import import import_ffn
            from scripts.compare_reference_accuracy import \
                copy_weights_to_tf
            params, state = import_ffn(ffn_weights)
            copy_weights_to_tf(ffn_tf, params, state)
    else:
        from scripts.compare_reference_accuracy import copy_weights_to_tf
        from t3dct.utils.checkpoint import load_pytree
        if isinstance(ffn_weights, (str, Path)):
            from t3dct.models.ffn import FFN
            import jax
            template = FFN().init(jax.random.PRNGKey(0))
            params, state = load_pytree(template, ffn_weights)
        else:
            params, state = ffn_weights
        copy_weights_to_tf(ffn_tf, params, state)

    results_dir = Path(results_dir)
    vz = np.array([1.0, 1.0, voxel_size[2]])

    def seg_real(t):
        return np.load(results_dir / "seg" / ("coords%06d.npy" % t)) * vz

    coords = {t_min: np.asarray(confirmed1_real, np.float64)}
    for t2 in range(t_min + 1, t_max + 1):
        print(f"reference recurrence t={t2}", end="\r", flush=True)
        seg1 = seg_real(t2 - 1)
        seg2 = seg_real(t2)
        confirmed = coords[t2 - 1]
        conf_n, (mean, scale) = normalize_points(confirmed,
                                                 return_para=True)
        matching = initial_matching_ffn(ffn_tf, (seg1 - mean) / scale,
                                        (seg2 - mean) / scale, 20)
        prob, _ = simple_match(matching)
        tracked_n, _ = prgls_with_two_ref(
            prob, (seg2 - mean) / scale, (seg1 - mean) / scale, conf_n,
            beta=beta, lambda_=lambda_)
        coords[t2] = tracked_n * scale + mean
    print()
    return coords


def main():
    ap = argparse.ArgumentParser(
        description="worm1-demo accuracy validation vs the TF reference")
    ap.add_argument("--images", required=True,
                    help='TIFF pattern, e.g. "raw/worm1_t%%03i_z*.tif"')
    ap.add_argument("--results", required=True)
    ap.add_argument("--stardist-dir", required=True,
                    help="reference stardist model folder or t3dct save dir")
    ap.add_argument("--ffn", required=True,
                    help="FFN weights (.h5 reference / .npz TrainFFN)")
    ap.add_argument("--voxel-size", nargs=3, type=float,
                    default=[1.0, 1.0, 9.2])
    ap.add_argument("--interpolation-factor", type=int, default=10)
    ap.add_argument("--beta", type=float, default=3.0)
    ap.add_argument("--lambda", dest="lambda_", type=float, default=3.0)
    ap.add_argument("--t-range", nargs=2, type=int, default=None)
    ap.add_argument("--no-reference", action="store_true",
                    help="skip the in-container TF reference recurrence")
    ap.add_argument("--reference-coords", default=None,
                    help="dir of published coords*.npy to score against")
    args = ap.parse_args()
    run_validation(args.images, args.results, args.stardist_dir, args.ffn,
                   voxel_size=tuple(args.voxel_size),
                   interpolation_factor=args.interpolation_factor,
                   beta=args.beta, lambda_=args.lambda_,
                   t_range=tuple(args.t_range) if args.t_range else None,
                   with_reference=not args.no_reference,
                   reference_coords=args.reference_coords)


if __name__ == "__main__":
    main()
