"""Measure the REFERENCE pipeline's stage times on this host's CPU.

Runs the actual reference code at /root/reference (read-only) with minimal
import shims for packages absent in this container (tifffile, csbdeep,
stardist, skimage — none of them touched by the timed code paths).

Workload mirrors bench.py's track stage: 150 cells at worm1 extent, smooth
deformation + permutation, production-like 0.9/0.1 matching prior for the
EM (so iteration counts reflect converging production behavior, not a
random-weights pathology).  The FFN runs with random weights — scoring
cost is weight-independent.

Results are recorded in BASELINE.md.  Caveats recorded there too: this
container exposes ONE CPU core and no GPU; the reference's validated
environment was an RTX 3080Ti.
"""

import json
import sys
import time
import types

import numpy as np


def install_shims():
    import matplotlib
    matplotlib.use("Agg")

    tif = types.ModuleType("tifffile")
    tif.imread = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("tifffile shim"))
    sys.modules["tifffile"] = tif

    csb = types.ModuleType("csbdeep")
    csb_utils = types.ModuleType("csbdeep.utils")
    from pathlib import Path as _P

    def _normalize(x, pmin=3, pmax=99.8, axis=None, clip=False, eps=1e-20,
                   dtype=np.float32):
        mi = np.percentile(x, pmin, axis=axis, keepdims=True)
        ma = np.percentile(x, pmax, axis=axis, keepdims=True)
        return ((x - mi) / (ma - mi + eps)).astype(dtype)

    def _raise(e):
        raise e

    def _keras_import(sub=None, *names):
        import tensorflow.keras as keras
        if sub is None:
            return keras
        mod = getattr(keras, sub)
        if not names:
            return mod
        got = tuple(getattr(mod, n) for n in names)
        return got[0] if len(got) == 1 else got

    csb_utils.Path = _P
    csb_utils.normalize = _normalize
    csb_utils._raise = _raise
    csb_utils_tf = types.ModuleType("csbdeep.utils.tf")
    csb_utils_tf.keras_import = _keras_import
    csb_utils.tf = csb_utils_tf
    csb.utils = csb_utils
    sys.modules["csbdeep"] = csb
    sys.modules["csbdeep.utils"] = csb_utils
    sys.modules["csbdeep.utils.tf"] = csb_utils_tf

    sd = types.ModuleType("stardist")
    sd.Rays_GoldenSpiral = object
    sd.fill_label_holes = lambda x: x
    from matplotlib.colors import ListedColormap
    sd.random_label_cmap = lambda n=2**16: ListedColormap(
        np.random.rand(256, 3))
    sd.calculate_extents = lambda *a, **k: np.ones(3)
    sd.gputools_available = lambda: False
    sd_models = types.ModuleType("stardist.models")
    sd_models.Config3D = object
    sd_models.StarDist3D = object
    sd_utils = types.ModuleType("stardist.utils")
    sd_utils._normalize_grid = lambda grid, n: tuple(grid)
    sd.models = sd_models
    sd.utils = sd_utils
    sys.modules["stardist"] = sd
    sys.modules["stardist.models"] = sd_models
    sys.modules["stardist.utils"] = sd_utils
    # stardist3dcustom subclasses StarDist3D at class-creation time; give
    # it a plain object base
    sd_models.StarDist3D = type("StarDist3D", (), {})
    sd_nms = types.ModuleType("stardist.nms")
    sd_nms._ind_prob_thresh = lambda *a, **k: None
    sd_geom = types.ModuleType("stardist.geometry")
    sys.modules["stardist.nms"] = sd_nms
    sys.modules["stardist.geometry"] = sd_geom

    ski = types.ModuleType("skimage")
    for sub in ("filters", "measure", "morphology", "feature",
                "segmentation"):
        m = types.ModuleType(f"skimage.{sub}")
        sys.modules[f"skimage.{sub}"] = m
        setattr(ski, sub, m)
    sys.modules["skimage.filters"].gaussian = lambda *a, **k: None
    sys.modules["skimage.measure"].label = lambda *a, **k: None
    sys.modules["skimage.morphology"].remove_small_objects = \
        lambda *a, **k: None
    sys.modules["skimage.feature"].peak_local_max = lambda *a, **k: None
    sys.modules["skimage.segmentation"].find_boundaries = \
        lambda *a, **k: None
    sys.modules["skimage.segmentation"].watershed = lambda *a, **k: None
    sys.modules["skimage.segmentation"].relabel_sequential = \
        lambda *a, **k: None
    sys.modules["skimage"] = ski


def main():
    install_shims()
    sys.path.insert(0, "/root/reference")

    N_CELLS = 150
    rng = np.random.RandomState(0)
    base = rng.rand(N_CELLS, 3).astype(np.float32) * \
        np.asarray([168, 401, 128 * 9.2], np.float32)
    moved = base + 3.0 * np.sin(base[:, [1, 2, 0]] / 40.0).astype(np.float32)
    perm = rng.permutation(N_CELLS)
    pts2 = moved[perm]

    results = {}

    # ---- FFN all-pairs scoring (reference ffn.initial_matching_ffn) ------
    from CellTracker.ffn import FFN, initial_matching_ffn, normalize_points
    ffn = FFN()
    ffn.build(input_shape=(None, 122))
    t1n, (mean, scale) = normalize_points(base, return_para=True)
    t2n = (pts2 - mean) / scale
    # warm-up (TF graph build)
    initial_matching_ffn(ffn, t1n, t2n, k_ptrs=20)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        scores = initial_matching_ffn(ffn, t1n, t2n, k_ptrs=20)
    results["ffn_matching_ms"] = (time.perf_counter() - t0) / n * 1e3

    # ---- greedy match (trackerlite.simple_match) --------------------------
    from CellTracker.trackerlite import simple_match, prgls_with_two_ref
    t0 = time.perf_counter()
    for _ in range(n):
        _, prior = simple_match(scores)
    results["simple_match_ms"] = (time.perf_counter() - t0) / n * 1e3

    # ---- PR-GLS EM with a production-like prior ---------------------------
    prior_good = np.full((N_CELLS, N_CELLS), 0.1 / (N_CELLS - 1))
    for new_i, old_i in enumerate(perm):
        prior_good[new_i, old_i] = 0.9
    t0 = time.perf_counter()
    for _ in range(n):
        tracked, _ = prgls_with_two_ref(prior_good, t2n, t1n, t1n,
                                        beta=3.0, lambda_=3.0)
    results["prgls_two_ref_ms"] = (time.perf_counter() - t0) / n * 1e3

    # ---- legacy pr_gls_quick (20 EM iters) --------------------------------
    from CellTracker.track import pr_gls_quick
    # X, Y are (n, 3) point sets; corr is (n_Y, n_X) initial matching
    corr = prior_good.astype(np.float64)
    t0 = time.perf_counter()
    for _ in range(n):
        pr_gls_quick(t1n, t2n, corr, BETA=3.0, max_iteration=20,
                     LAMBDA=3.0)
    results["pr_gls_quick_legacy_ms"] = (time.perf_counter() - t0) / n * 1e3

    # ---- U-Net tiled inference on a worm volume (TF CPU) ------------------
    from CellTracker.unet3d import unet3_a, unet3_prediction
    model = unet3_a()
    vol = rng.rand(168, 401, 24).astype(np.float32)[..., None][None]
    unet3_prediction(vol, model)  # warm-up
    t0 = time.perf_counter()
    unet3_prediction(vol, model)
    results["unet3_tiled_inference_s"] = time.perf_counter() - t0

    per_track_vol_ms = (results["ffn_matching_ms"]
                        + results["simple_match_ms"]
                        + results["prgls_two_ref_ms"])
    results["track_step_total_ms"] = per_track_vol_ms
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
