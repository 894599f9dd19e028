"""Zebrafish-scale end-to-end measurement (BASELINE.json config 4,
VERDICT r4 #4): "large-volume high-noise stacks — big 3D U-Net tiles,
watershed at scale".

Three measurements at (z=64, y=512, x=512), all previously unmeasured:

1. **Legacy U-Net + watershed chain** (`UNetSegmenter.segment`
   semantics, reference tracker.py:605-684): tiled unet3_a inference
   wall + queued device time, then `watershed_2d` + `watershed_3d` +
   relabel on a realistic 600-cell probability volume — including a
   `max_iters` sweep quantifying the relaxation-iteration question at
   512^2 slices (the flood's while_loop exits on convergence; the sweep
   shows where convergence lands and what the iterations cost).
2. **Zebrafish seg+track composition** (grid (2,2,2): the "tpu" arch
   max-pools the raw input by the grid before the stem — at (2,4,4) a
   32-voxel pool erases the sub-grid structure of ~5-voxel cells and the
   prob head cannot converge; (2,2,2) matches the worm recipe's
   grid-resolution object size.  The (2,4,4) random-init device timing
   remains in scripts/zebrafish_device.json): tiled StarDist
   (`predict_and_save(tile_shape=...)`) over a 4-volume synthetic
   recording with a model TRAINED on vol-1 GT (cached), then
   `track_timelapse` over those REAL seg artifacts — wall per volume for
   both stages plus tracking recall vs the drifted GT centers.
3. The device-only tile sweep number lives in
   scripts/measure_zebrafish_device.py (re-run separately); this script
   measures the SHIPPED walls.

Run on the TPU:  python scripts/zebrafish_e2e.py
Writes scripts/zebrafish_e2e.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402

import t3dct                                    # noqa: F401,E402
from t3dct.utils import enable_compilation_cache    # noqa: E402

enable_compilation_cache()

Z, Y, X = 64, 512, 512          # (z, y, x) raw frame
N_CELLS = 600
N_VOLS = 4
GRID = (2, 2, 2)
VOXEL_SIZE = (1.0, 1.0, 4.0)
TILE = (None, 176, 176)
CACHE_VERSION = "r5-zf-sd24x30w64-c600-g222"
SD_EPOCHS, SD_STEPS = 24, 30
FFN_ITERS = 400


def cache_dir() -> Path:
    root = Path(os.environ.get("T3DCT_CACHE_DIR",
                               str(Path.home() / ".cache" / "t3dct")))
    d = root / "zebrafish" / CACHE_VERSION
    d.mkdir(parents=True, exist_ok=True)
    return d


def make_centers(rng):
    """N_CELLS rejection-sampled centers, drifting smoothly per t."""
    centers = []
    while len(centers) < N_CELLS:
        c = np.array([rng.uniform(6, Z - 6), rng.uniform(18, Y - 18),
                      rng.uniform(18, X - 18)])
        if all((abs(c[0] - o[0]) > 4.5) or (np.hypot(c[1] - o[1],
                                                     c[2] - o[2]) > 17)
               for o in centers):
            centers.append(c)
    c0 = np.asarray(centers, np.float32)
    by_t = {}
    for t in range(1, N_VOLS + 1):
        ph = 0.3 * (t - 1)
        c = c0.copy()
        c[:, 1] += 2.0 * np.sin(c0[:, 2] / 60.0 + ph)
        c[:, 2] += 2.0 * np.cos(c0[:, 1] / 70.0 + ph)
        by_t[t] = c
    return by_t


def render_volume(c, rng, labels=False):
    sig = (1.6, 5.5, 5.5)
    img = rng.rand(Z, Y, X).astype(np.float32) * 0.25   # high noise
    lab = np.zeros((Z, Y, X), np.int32) if labels else None
    zz = np.arange(Z, dtype=np.float32)
    for i, (cz, cy, cx) in enumerate(c):
        z0, z1 = max(0, int(cz) - 5), min(Z, int(cz) + 6)
        y0, y1 = max(0, int(cy) - 16), min(Y, int(cy) + 17)
        x0, x1 = max(0, int(cx) - 16), min(X, int(cx) + 17)
        lz = (zz[z0:z1] - cz) / sig[0]
        ly = (np.arange(y0, y1) - cy) / sig[1]
        lx = (np.arange(x0, x1) - cx) / sig[2]
        d2 = (lz[:, None, None] ** 2 + ly[None, :, None] ** 2
              + lx[None, None, :] ** 2)
        img[z0:z1, y0:y1, x0:x1] += np.exp(-0.5 * d2)
        if labels:
            lab[z0:z1, y0:y1, x0:x1] = np.where(
                d2 < 1.2 ** 2, i + 1, lab[z0:z1, y0:y1, x0:x1])
    return img, lab


def make_recording(raw_dir: Path, centers_by_t, rng):
    from t3dct.io.imageio import save_label_slices

    lab1 = None
    for t in range(1, N_VOLS + 1):
        img, lab = render_volume(centers_by_t[t], rng, labels=(t == 1))
        if t == 1:
            lab1 = lab
        img16 = (img / img.max() * 50000).astype(np.uint16)
        save_label_slices(img16.transpose(1, 2, 0), raw_dir,
                          "raw_t%03i_z%04i.tif", t, use_8_bit=False,
                          compression=None)
    return str(raw_dir / "raw_t%03i_z*.tif"), lab1


def get_model(raw_dir: Path, lab1):
    from t3dct.engine.stardist import StarDist3D

    cdir = cache_dir() / "sd_model"
    if (cdir / "weights.npz").exists():
        model = StarDist3D.load(cdir)
    else:
        from t3dct.config import StarDistConfig
        from t3dct.io.imageio import (load_2d_slices_at_time,
                                      percentile_normalize)
        from t3dct.models.train_stardist import TrainStarDist3D

        img1 = load_2d_slices_at_time(str(raw_dir / "raw_t%03i_z*.tif"),
                                      t=1, do_normalize=False)
        img1n = percentile_normalize(img1.astype(np.float32))
        cfg = StarDistConfig(n_rays=96, grid=GRID,
                             anisotropy=(4.0, 1.0, 1.0),
                             train_patch_size=(32, 128, 128),
                             prob_thresh=0.3)
        trainer = TrainStarDist3D(cfg, basedir=cdir.parent / "sd_train",
                                  max_dist=12, learning_rate=3e-3,
                                  prob_fg_weight=64.0)
        t0 = time.perf_counter()
        trainer.train([img1n], [lab1], epochs=SD_EPOCHS,
                      steps_per_epoch=SD_STEPS)
        print(f"trained {time.perf_counter() - t0:.0f}s", flush=True)
        model = StarDist3D.load(cdir.parent / "sd_train" / "stardist")
        model.save(cdir)
    model.max_candidates = 2048
    model.render_box = (17, 33, 33)
    return model


def bench_tiled_seg(images_path, results, model):
    from t3dct.engine.stardist import predict_and_save

    predict_and_save(images_path, model, results, tile_shape=TILE,
                     tile_candidates=128, tile_batch=8,
                     shrink=(0, 48, 48))
    t0 = time.perf_counter()
    predict_and_save(images_path, model, results, tile_shape=TILE,
                     tile_candidates=128, tile_batch=8,
                     shrink=(0, 48, 48))
    return (time.perf_counter() - t0) / N_VOLS


def bench_track(results: Path, lab1, work: Path, centers_by_t):
    from t3dct.config import TrackingConfig
    from t3dct.engine.pipeline import track_timelapse
    from t3dct.io.imageio import save_label_slices
    from t3dct.models.train_ffn import TrainFFN
    from t3dct.models.ffn import FFN
    from t3dct.utils.checkpoint import load_pytree, save_pytree

    if not (results / "manual_vol1").exists():
        save_label_slices(lab1.transpose(1, 2, 0), results / "manual_vol1",
                          "manual_vol1_t%04i_z%04i.tif", 0,
                          use_8_bit=False, compression=None)
    ffn_cache = cache_dir() / "ffn.npz"
    if ffn_cache.exists():
        ffn_w = load_pytree(FFN().init(jax.random.PRNGKey(0)), ffn_cache)
    else:
        coords1 = np.load(results / "seg" / "coords000001.npy").astype(
            np.float32)
        cloud = coords1 * np.array([1.0, 1.0, VOXEL_SIZE[2]], np.float32)
        np.savetxt(work / "pts.txt", cloud)
        tr = TrainFFN("ffn", points1_path=str(work / "pts.txt"),
                      basedir=work / "ffn", seed=0)
        tr.train(num_epochs=1, iteration=FFN_ITERS, verbose=False)
        ffn_w = (tr.params, tr.bn_state)
        save_pytree(ffn_w, ffn_cache)

    def run():
        return track_timelapse(
            results, str(results / "manual_vol1" / "*.tif"), ffn_w,
            voxel_size=VOXEL_SIZE, interpolation_factor=2,
            t_range=(1, N_VOLS), grid=GRID,
            config=TrackingConfig(beta=3.0, lambda_=3.0),
            verbose=False)

    run()
    t0 = time.perf_counter()
    coords_by_t = run()
    dt = (time.perf_counter() - t0) / (N_VOLS - 1)

    # recall vs drifted GT at half the median NN spacing
    sc = np.array([1.0, 1.0, VOXEL_SIZE[2]])
    gt = {t: centers_by_t[t][:, [1, 2, 0]] * sc for t in centers_by_t}
    d1 = np.linalg.norm(gt[1][:, None] - gt[1][None, :], axis=2)
    np.fill_diagonal(d1, np.inf)
    gate = 0.5 * float(np.median(d1.min(axis=1)))
    dN = np.linalg.norm(gt[N_VOLS][:, None] - coords_by_t[N_VOLS][None, :],
                        axis=2)
    recall = float((dN.min(axis=1) <= gate).mean())
    return dt, gate, recall


def _sync(x):
    return jax.device_get(jnp.sum(x))


def bench_legacy_chain(lab1, rng):
    """The reference's OTHER segmentation family at zebrafish scale:
    LCN + tiled unet3_a + watershed_2d/3d + relabel + centers
    (tracker.py:605-684).  U-Net timed on the raw image (content-free,
    static shapes); the watershed stage timed on a realistic 600-cell
    probability volume derived from the GT labels (the flood's
    while_loop iteration count IS content-dependent — this is the open
    512^2 scaling question, quantified by the max_iters sweep)."""
    from t3dct.config import SegmentationConfig
    from t3dct.engine.segmentation import UNetSegmenter
    from t3dct.models.unet3d import unet3_a
    from t3dct.ops.watershed import watershed_2d, watershed_3d

    img, _ = render_volume(
        make_centers(np.random.RandomState(7))[1], rng)
    vol_xyz = (Y, X, Z)                        # pipeline (x, y, z) frame
    img_xyz = img.transpose(1, 2, 0)
    model = unet3_a()
    params, state = model.init(jax.random.PRNGKey(0))
    cfg = SegmentationConfig(noise_level=5.0, min_size=100,
                             z_xy_ratio=VOXEL_SIZE[2], cell_num=N_CELLS,
                             shrink=(24, 24, 2))
    seg = UNetSegmenter(model, params, state, cfg, vol_xyz,
                        max_cells=1024)
    print(f"unet tiles: {len(seg.plan.origins)}", flush=True)

    x_dev = jnp.asarray(img_xyz.astype(np.float32))
    _sync(x_dev)
    probs = seg._predict(seg.params, seg.state, x_dev)
    _sync(probs)                               # warm compile
    reps = 3
    t0 = time.perf_counter()
    outs = [seg._predict(seg.params, seg.state, x_dev)
            for _ in range(reps)]
    _sync(sum(jnp.sum(o[:2, :2, :2]) for o in outs))
    unet_ms = (time.perf_counter() - t0) / reps * 1e3

    # realistic elevation input for the watershed: GT-derived cell
    # probability (what a trained U-Net produces on this scene)
    prob_np = np.zeros((Z, Y, X), np.float32)
    c1 = make_centers(np.random.RandomState(7))[1]
    zz = np.arange(Z, dtype=np.float32)
    for (cz, cy, cx) in c1:
        z0, z1 = max(0, int(cz) - 5), min(Z, int(cz) + 6)
        y0, y1 = max(0, int(cy) - 16), min(Y, int(cy) + 17)
        x0, x1 = max(0, int(cx) - 16), min(X, int(cx) + 17)
        lz = (zz[z0:z1] - cz) / 1.4
        ly = (np.arange(y0, y1) - cy) / 3.2
        lx = (np.arange(x0, x1) - cx) / 3.2
        d2 = (lz[:, None, None] ** 2 + ly[None, :, None] ** 2
              + lx[None, None, :] ** 2)
        prob_np[z0:z1, y0:y1, x0:x1] = np.maximum(
            prob_np[z0:z1, y0:y1, x0:x1], np.exp(-0.5 * d2))
    prob_xyz = jnp.asarray(prob_np.transpose(1, 2, 0))
    _sync(prob_xyz)

    ws_sweep = {}
    ref_labels = None
    for max_iters in (512, 128, 64, 32, 16):
        ws2d, _ = watershed_2d(prob_xyz, min_distance=7,
                               max_iters=max_iters)
        out = watershed_3d(ws2d, samplingrate=(1.0, 1.0, VOXEL_SIZE[2]),
                           method="min_size", min_size=cfg.min_size,
                           cell_num=0, min_distance=3, max_labels=1024,
                           max_iters=max_iters)
        _sync(out[1])
        t0 = time.perf_counter()
        ws2d, _ = watershed_2d(prob_xyz, min_distance=7,
                               max_iters=max_iters)
        out = watershed_3d(ws2d, samplingrate=(1.0, 1.0, VOXEL_SIZE[2]),
                           method="min_size", min_size=cfg.min_size,
                           cell_num=0, min_distance=3, max_labels=1024,
                           max_iters=max_iters)
        _sync(out[1])               # scalar checksum: compute, no 64 MB fetch
        dt_ms = (time.perf_counter() - t0) * 1e3
        labels_np = np.asarray(jax.device_get(out[1]))   # untimed
        n_cells = int(len(np.unique(labels_np)) - 1)
        if ref_labels is None:
            ref_labels = labels_np
            same = True
        else:
            same = bool(np.array_equal(labels_np, ref_labels))
        ws_sweep[max_iters] = {"wall_ms": round(dt_ms, 1),
                               "cells": n_cells,
                               "equals_512": same}
        print(f"watershed max_iters={max_iters}: {dt_ms:.0f} ms, "
              f"{n_cells} cells, equals_512={same}", flush=True)
    return unet_ms, ws_sweep


def main():
    print("devices:", jax.devices(), flush=True)
    work = Path(tempfile.mkdtemp(prefix="t3dct_zf_"))
    results = {}
    try:
        raw_dir = work / "raw"
        raw_dir.mkdir(parents=True)
        rng = np.random.RandomState(0)
        centers_by_t = make_centers(rng)
        images_path, lab1 = make_recording(raw_dir, centers_by_t, rng)
        print("recording written", flush=True)

        unet_ms, ws_sweep = bench_legacy_chain(lab1, rng)
        results["legacy_unet_tiled_device_ms"] = round(unet_ms, 1)
        results["legacy_watershed_sweep"] = ws_sweep

        model = get_model(raw_dir, lab1)
        res_tree = work / "results"
        t_seg = bench_tiled_seg(images_path, res_tree, model)
        n1 = np.load(res_tree / "seg" / "coords000001.npy").shape[0]
        if n1 < N_CELLS // 4:
            raise RuntimeError(
                f"trained model found only {n1}/{N_CELLS} cells at t=1 — "
                f"timing tracking on it would be meaningless (stale "
                f"cache? clear {cache_dir()})")
        results["stardist_tiled_seg_s_per_vol"] = round(t_seg, 2)
        results["cells_detected_t1"] = int(n1)
        print(f"seg {t_seg:.2f}s/vol, {n1} cells", flush=True)

        t_track, gate, recall = bench_track(res_tree, lab1, work,
                                            centers_by_t)
        results["track_s_per_vol"] = round(t_track, 2)
        results["track_gate_units"] = round(gate, 2)
        results["track_recall_tN"] = round(recall, 4)
        results["composition_s_per_vol"] = round(t_seg + t_track, 2)
        results["shape_zyx"] = [Z, Y, X]
        results["n_cells_gt"] = N_CELLS
        print(json.dumps(results, indent=2))
        (Path(__file__).parent / "zebrafish_e2e.json").write_text(
            json.dumps(results, indent=2))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
