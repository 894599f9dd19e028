"""Legacy Tracker wall before/after the fused device programs
(VERDICT r2 #3): times the OLD host-loop composition (the retained
step-by-step methods, ~40 RPCs/volume) against the shipped fused
``track_one_vol`` (~4 RPCs/volume) on the same synthetic scene.

Run on the TPU:
  python scripts/bench_legacy_track.py            # worm1-like scene
  python scripts/bench_legacy_track.py --worm4    # reference headline
      # demo config (ensemble_mode_worm4-clear.ipynb cell 4): 20-member
      # ensemble over a (168, 401, 128) isotropic volume, beta_tk=1000,
      # lambda_tk=1e-5, maxiter_tk=10 — fused path only (the host loop
      # at this scale is timed over 2 volumes to bound the wait)
Results recorded in BASELINE.md.
"""

import json
import sys
import tempfile
import time
import types
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

import t3dct  # noqa: F401,E402
from t3dct.utils import enable_compilation_cache  # noqa: E402


@dataclass
class Scene:
    shape: Tuple[int, int, int]     # (x, y, z) pipeline frame
    z_ratio: float
    z_scaling: int
    n_cells: int
    n_vols: int
    beta_tk: float
    lambda_tk: float
    maxiter_tk: int
    max_cells: int
    cell_r: float = 3.0             # fg radius (real units)


WORM1 = Scene(shape=(160, 280, 20), z_ratio=3.0, z_scaling=3,
              n_cells=100, n_vols=10, beta_tk=300.0, lambda_tk=0.1,
              maxiter_tk=20, max_cells=128)
# ensemble_mode_worm4-clear.ipynb cell 4: siz_xyz=(168, 401, 128),
# z_xy_ratio=1, z_scaling=1, beta_tk=1000, lambda_tk=1e-5,
# maxiter_tk=10, ensemble=20, volume_num=80
WORM4 = Scene(shape=(168, 401, 128), z_ratio=1.0, z_scaling=1,
              n_cells=150, n_vols=8, beta_tk=1000.0, lambda_tk=1e-5,
              maxiter_tk=10, max_cells=192, cell_r=4.0)


def build_centers(sc: Scene):
    rng = np.random.RandomState(0)
    centers = []
    while len(centers) < sc.n_cells:
        c = np.array([rng.uniform(10, sc.shape[0] - 10),
                      rng.uniform(10, sc.shape[1] - 10),
                      rng.uniform(3, sc.shape[2] - 3)])
        if all(np.linalg.norm((c - o) * [1, 1, sc.z_ratio]) > 3 * sc.cell_r
               for o in centers):
            centers.append(c)
    return np.asarray(centers), rng


def build_gt(sc: Scene, t: int):
    """True cell centers at volume ``t`` in REAL units (the unjittered
    motion model of ``build_scene``)."""
    centers0, _ = build_centers(sc)
    c = centers0 + 0.8 * np.sin(
        0.5 * t + np.arange(sc.n_cells)[:, None] * np.array([1, 2, 0.2]))
    return c * np.array([1, 1, sc.z_ratio])


def build_scene(sc: Scene):
    centers0, rng = build_centers(sc)
    rx = int(2 * sc.cell_r)
    rz = max(int(2 * sc.cell_r / sc.z_ratio), 1)

    def volume(t):
        c = centers0 + 0.8 * np.sin(
            0.5 * t + np.arange(sc.n_cells)[:, None]
            * np.array([1, 2, 0.2]))
        prob = np.zeros(sc.shape, np.float32)
        lab = np.zeros(sc.shape, np.int32)
        for i, (cx, cy, cz) in enumerate(c):
            x0, x1 = int(max(cx - rx, 0)), int(min(cx + rx + 1,
                                                   sc.shape[0]))
            y0, y1 = int(max(cy - rx, 0)), int(min(cy + rx + 1,
                                                   sc.shape[1]))
            z0, z1 = int(max(cz - rz, 0)), int(min(cz + rz + 1,
                                                   sc.shape[2]))
            xx, yy, zz = np.mgrid[x0:x1, y0:y1, z0:z1].astype(np.float32)
            d2 = ((xx - cx) ** 2 + (yy - cy) ** 2
                  + ((zz - cz) * sc.z_ratio) ** 2)
            prob[x0:x1, y0:y1, z0:z1] = np.maximum(
                prob[x0:x1, y0:y1, z0:z1],
                np.exp(-d2 / (sc.cell_r ** 2)))
            lab[x0:x1, y0:y1, z0:z1][d2 < sc.cell_r ** 2] = i + 1
        seg_real = (c + rng.randn(sc.n_cells, 3) * 0.15) * \
            np.array([1, 1, sc.z_ratio])
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


def make_tracker(work, ensemble, sc: Scene):
    from t3dct.engine.legacy import Tracker
    from t3dct.models.ffn import FFN
    tr = Tracker(volume_num=sc.n_vols, siz_xyz=sc.shape,
                 z_xy_ratio=sc.z_ratio, z_scaling=sc.z_scaling,
                 noise_level=20, min_size=20, beta_tk=sc.beta_tk,
                 lambda_tk=sc.lambda_tk, maxiter_tk=sc.maxiter_tk,
                 folder_path=str(work), image_name="raw_t%03i_z%03i.tif",
                 unet_model_file="unet.npz", ffn_model_file="ffn.npz",
                 ensemble=ensemble, max_cells=sc.max_cells)
    tr.load_ffn_arrays(*FFN().init(jax.random.PRNGKey(0)))
    return tr


def run_mode(volume_fn, mode_fn, work, ensemble, label, sc: Scene,
             timed_vols=None):
    prob1, lab1, seg1 = volume_fn(1)
    tr = make_tracker(work, ensemble, sc)
    tr.segmentation_manual_relabels = lab1
    tr.interpolate_seg()
    tr.r_coordinates_segment_t0 = seg1
    tr.segresult = types.SimpleNamespace(r_coordinates_segment=seg1)
    tr.initiate_tracking()

    last_vol = 3 + (timed_vols if timed_vols else sc.n_vols - 3)
    segresults = {}
    for t in range(2, last_vol + 1):
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
    for t in range(4, last_vol + 1):
        mode_fn(tr, t, segresults[t])
    per_vol = (time.perf_counter() - t0) / (last_vol - 3) * 1e3
    print(f"{label}: {per_vol:.0f} ms/volume", flush=True)
    return per_vol, list(tr.history.r_tracked_coordinates)


def run_pair(volume_fn, sc, ensemble, tag, results, old_timed_vols=None):
    work = Path(tempfile.mkdtemp(prefix=f"t3dct_legacy_bench_{tag}_"))
    new_ms, new_hist = run_mode(
        volume_fn, lambda tr, t, s: tr.track_one_vol(t, segresult=s),
        work / "new", ensemble, f"{tag} fused", sc)
    old_ms, old_hist = run_mode(
        volume_fn, old_track_one_vol, work / "old", ensemble,
        f"{tag} host-loop", sc, timed_vols=old_timed_vols)
    # compare at the LAST volume both modes tracked — with
    # old_timed_vols the host loop stops earlier, and coordinates from
    # different time points would measure cell motion, not parity
    k = min(len(new_hist), len(old_hist)) - 1
    dev = float(np.median(np.linalg.norm(new_hist[k] - old_hist[k],
                                         axis=1)))
    # contextualize the path deviation with each path's error vs the
    # scene's ground truth at the same volume (t = k+1): with RANDOM FFN
    # weights and e.g. the worm4 lambda=1e-5 config the EM is nearly
    # unregularized — the fused-vs-host deviation then measures the
    # config's chaotic sensitivity, not a path defect, and the GT errors
    # show both paths land in the same error regime
    gt = build_gt(sc, k + 1)
    err_new = float(np.median(np.linalg.norm(new_hist[k] - gt, axis=1)))
    err_old = float(np.median(np.linalg.norm(old_hist[k] - gt, axis=1)))
    results[tag] = {"fused_ms_per_vol": round(new_ms, 1),
                    "host_loop_ms_per_vol": round(old_ms, 1),
                    "speedup": round(old_ms / new_ms, 2),
                    "median_coord_dev_fused_vs_host": round(dev, 4),
                    "median_err_vs_gt_fused": round(err_new, 3),
                    "median_err_vs_gt_host": round(err_old, 3)}
    print(tag, results[tag], flush=True)


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    results = {}
    if "--worm4" in sys.argv:
        # the reference's ensemble-mode headline demo configuration;
        # the 20-member ensemble only reaches its full member count at
        # t=21, so with 8 volumes the timed members are 3..7 per volume
        # (get_reference_vols ramps up) — the per-member cost is what
        # scales, so report it alongside
        volume_fn = build_scene(WORM4)
        run_pair(volume_fn, WORM4, 20, "worm4_ensemble20", results,
                 old_timed_vols=2)
        # the fused member program pads to the CONSTANT 20-member axis,
        # so its number IS the steady-state 20-member cost; the host
        # loop's cost scales with the REAL member count (3..4 during its
        # timed vols t=4..5 of the ramp) — extrapolate for the honest
        # comparison
        from t3dct.engine.legacy import get_reference_vols
        r = results["worm4_ensemble20"]
        old_members = np.mean([len(get_reference_vols(20, t))
                               for t in (4, 5)])
        r["host_loop_timed_members_mean"] = float(old_members)
        r["host_loop_ms_per_member"] = round(
            r["host_loop_ms_per_vol"] / old_members, 1)
        r["host_loop_est_20member_ms"] = round(
            r["host_loop_ms_per_member"] * 20, 1)
        r["speedup_steady_state_est"] = round(
            r["host_loop_est_20member_ms"] / r["fused_ms_per_vol"], 2)
        out = Path(__file__).parent / "legacy_track_bench_worm4.json"
    else:
        volume_fn = build_scene(WORM1)
        for ensemble, tag in ((False, "single"), (3, "ensemble3")):
            run_pair(volume_fn, WORM1, ensemble, tag, results)
        out = Path(__file__).parent / "legacy_track_bench.json"

    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
