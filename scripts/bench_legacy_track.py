"""Legacy Tracker wall before/after the fused device programs
(VERDICT r2 #3): times the OLD host-loop composition (the retained
step-by-step methods, ~40 RPCs/volume) against the shipped fused
``track_one_vol`` (~4 RPCs/volume) on the same synthetic scene.

Run on the TPU:  python scripts/bench_legacy_track.py
Results recorded in BASELINE.md.
"""

import json
import sys
import tempfile
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

import t3dct  # noqa: F401,E402
from t3dct.utils import enable_compilation_cache  # noqa: E402

SHAPE = (160, 280, 20)          # (x, y, z) pipeline frame
Z_RATIO, Z_SCALING = 3.0, 3
N_CELLS = 100
N_VOLS = 10


def build_scene():
    rng = np.random.RandomState(0)
    centers = []
    while len(centers) < N_CELLS:
        c = np.array([rng.uniform(10, SHAPE[0] - 10),
                      rng.uniform(10, SHAPE[1] - 10),
                      rng.uniform(3, SHAPE[2] - 3)])
        if all(np.linalg.norm((c - o) * [1, 1, Z_RATIO]) > 9
               for o in centers):
            centers.append(c)
    centers0 = np.asarray(centers)
    xx, yy, zz = np.mgrid[:SHAPE[0], :SHAPE[1], :SHAPE[2]].astype(
        np.float32)

    def volume(t):
        c = centers0 + 0.8 * np.sin(
            0.5 * t + np.arange(N_CELLS)[:, None] * np.array([1, 2, 0.2]))
        prob = np.zeros(SHAPE, np.float32)
        lab = np.zeros(SHAPE, np.int32)
        for i, (cx, cy, cz) in enumerate(c):
            x0, x1 = int(max(cx - 6, 0)), int(min(cx + 7, SHAPE[0]))
            y0, y1 = int(max(cy - 6, 0)), int(min(cy + 7, SHAPE[1]))
            z0, z1 = int(max(cz - 3, 0)), int(min(cz + 4, SHAPE[2]))
            d2 = ((xx[x0:x1, y0:y1, z0:z1] - cx) ** 2
                  + (yy[x0:x1, y0:y1, z0:z1] - cy) ** 2
                  + ((zz[x0:x1, y0:y1, z0:z1] - cz) * Z_RATIO) ** 2)
            prob[x0:x1, y0:y1, z0:z1] = np.maximum(
                prob[x0:x1, y0:y1, z0:z1], np.exp(-d2 / 8.0))
            lab[x0:x1, y0:y1, z0:z1][d2 < 9.0] = i + 1
        seg_real = (c + rng.randn(N_CELLS, 3) * 0.15) * \
            np.array([1, 1, Z_RATIO])
        return prob, lab, seg_real

    return volume


def old_track_one_vol(tr, target_volume, segresult):
    """The pre-fusion host-loop composition (round-2 track_one_vol
    body), built from the retained step-by-step methods."""
    from t3dct.engine.legacy import (REP_NUM_PRGLS, get_reference_vols)
    from t3dct.ops.trim import trim_mean
    from t3dct.io.imageio import save_label_slices
    tr.segresult = segresult
    source_vols = get_reference_vols(tr.ensemble, target_volume,
                                     adjacent=tr.adjacent)
    preds = []
    for sv in source_vols:
        C_t, BETA_t, inter_list = tr._fit_ffn_prgls(
            REP_NUM_PRGLS, tr.history.r_segmented_coordinates[sv - 1])
        pred = tr.history.r_tracked_coordinates[sv - 1].copy()
        for C, beta, inter in zip(C_t, BETA_t, inter_list):
            pred = tr._predict_one_rep(pred, inter, beta, C)
        preds.append(pred)
    mean = np.asarray(trim_mean(jnp.asarray(np.stack(preds)), 0.1,
                                axis=0)) if len(preds) > 1 else preds[0]
    cells_bd = tr._get_cells_onBoundary(mean, tr.ensemble)
    tr.cells_on_boundary[cells_bd] = 1
    r_disp, i_disp = tr._accurate_correction(tr.cells_on_boundary, mean)
    tr.tracked_labels = tr._transform_motion_to_image(
        tr.cells_on_boundary, i_disp)
    save_label_slices(tr.tracked_labels, tr.paths.track_results,
                      "old_track_results_t%06i_z%04i.tif", target_volume,
                      tr.use_8_bit)
    if tr.ensemble:
        tr.cells_on_boundary = np.zeros(tr.cell_num_t0, int)
    tr.history.r_displacements.append(r_disp)
    tr.history.r_segmented_coordinates.append(
        segresult.r_coordinates_segment)
    tr.history.r_tracked_coordinates.append(
        tr.r_coordinates_tracked_t0 + r_disp)


def make_tracker(work, ensemble):
    from t3dct.engine.legacy import Tracker
    from t3dct.models.ffn import FFN
    tr = Tracker(volume_num=N_VOLS, siz_xyz=SHAPE, z_xy_ratio=Z_RATIO,
                 z_scaling=Z_SCALING, noise_level=20, min_size=20,
                 beta_tk=300.0, lambda_tk=0.1, maxiter_tk=20,
                 folder_path=str(work), image_name="raw_t%03i_z%03i.tif",
                 unet_model_file="unet.npz", ffn_model_file="ffn.npz",
                 ensemble=ensemble, max_cells=128)
    tr.load_ffn_arrays(*FFN().init(jax.random.PRNGKey(0)))
    return tr


def run_mode(volume_fn, mode_fn, work, ensemble, label):
    prob1, lab1, seg1 = volume_fn(1)
    tr = make_tracker(work, ensemble)
    tr.segmentation_manual_relabels = lab1
    tr.interpolate_seg()
    tr.r_coordinates_segment_t0 = seg1
    tr.segresult = types.SimpleNamespace(r_coordinates_segment=seg1)
    tr.initiate_tracking()

    segresults = {}
    for t in range(2, N_VOLS + 1):
        prob, _, seg = volume_fn(t)
        segresults[t] = types.SimpleNamespace(
            r_coordinates_segment=seg, image_cell_bg=prob,
            image_gcn=(prob * 30000 / 65536.0).astype(np.float32))
    # warm-up (compiles + first-execute program loads through the tunnel)
    # on t=2 AND t=3: in ensemble mode t=2 has a single reference volume
    # and takes the single-source program — the vmapped member program
    # first compiles at t=3, which must stay out of the timed region
    mode_fn(tr, 2, segresults[2])
    mode_fn(tr, 3, segresults[3])
    t0 = time.perf_counter()
    for t in range(4, N_VOLS + 1):
        mode_fn(tr, t, segresults[t])
    per_vol = (time.perf_counter() - t0) / (N_VOLS - 3) * 1e3
    print(f"{label}: {per_vol:.0f} ms/volume", flush=True)
    return per_vol, tr.history.r_tracked_coordinates[-1]


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    volume_fn = build_scene()
    results = {}
    for ensemble, tag in ((False, "single"), (3, "ensemble3")):
        work = Path(tempfile.mkdtemp(prefix=f"t3dct_legacy_bench_{tag}_"))
        new_ms, new_last = run_mode(
            volume_fn, lambda tr, t, s: tr.track_one_vol(t, segresult=s),
            work / "new", ensemble, f"{tag} fused")
        old_ms, old_last = run_mode(
            volume_fn, old_track_one_vol, work / "old", ensemble,
            f"{tag} host-loop")
        dev = float(np.median(np.linalg.norm(new_last - old_last, axis=1)))
        results[tag] = {"fused_ms_per_vol": round(new_ms, 1),
                        "host_loop_ms_per_vol": round(old_ms, 1),
                        "speedup": round(old_ms / new_ms, 2),
                        "median_coord_dev_fused_vs_host": round(dev, 4)}
        print(tag, results[tag], flush=True)

    out = Path(__file__).parent / "legacy_track_bench.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
