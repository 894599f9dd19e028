"""Legacy (v0.4) Tracker parity vs the REFERENCE's own executing code.

Round-2 validated the v1.0 TrackerLite recurrence against the reference's
code (``compare_reference_accuracy.py``).  This script does the same for
the legacy generation — the 5-rep beta-annealed FFN + PR-GLS fit with
motion replay (``tracker.py:1224-1289``), trim-mean ensemble
(``tracker.py:1502-1507``), boundary flagging (``:1291-1308``), the
interpolated-frame accurate-correction loop (``:1177-1191,1310-1348``)
and the paste/recalculate machinery (``:1350-1400``) — by driving the
reference's OWN methods (TF 2.21 CPU, NumPy float64) next to
``t3dct.engine.legacy.Tracker`` on shared synthetic data with shared FFN
weights.

Two tiers:

- **Tier A (prediction core, worm scale)**: 150 cells / 21 volumes, the
  bench drifting-cell workload.  Both sides run the full
  ``_predict_pos_once`` fit+replay per volume (single mode, maxiter 20)
  and trim-mean ensemble (5 members, maxiter 10, 11 volumes), with the
  accurate-correction step replaced by the identity on BOTH sides (the
  correction needs images; covered by Tier B).  The recurrence then
  reduces to ``tracked_t = prediction_t`` on both sides.
- **Tier B (full track_one_vol, small scale)**: 25 cells / 6 volumes /
  (80, 80, 10) with synthetic U-Net probability + raw-intensity images:
  reference-method composition of ``tracker.py:1473-1536`` minus file
  saves — interpolation (``_interpolate``), subregions
  (``cal_subregions``), prediction, boundary, ``_accurate_correction``,
  ``_transform_motion_to_image`` — vs our ``Tracker`` with
  ``paste_mode="reference"`` and injected segresults.

Reference-code caveat (documented, affects Tier B only): scikit-image is
not installed in this container, so three skimage functions the reference
calls are shimmed with behaviorally-faithful implementations —
``filters.gaussian`` (scipy gaussian_filter on float64, constant mode),
``measure.label`` (per-value connected components via scipy.ndimage.label,
relabeled in raster-scan first-encounter order like skimage's union-find),
and ``segmentation.watershed`` (priority-flood with a (value, age, FIFO)
heap; skimage's heap breaks exact (value, age) ties — which only occur
among the initial marker pixels — in binary-heap order instead of FIFO, so
watershed lines on plateaus can differ by single pixels).  EDT, gaussian,
center_of_mass, solve come from real scipy/NumPy.

Run:  python scripts/compare_reference_legacy.py [--tier A|B|both]
Results recorded in BASELINE.md ("Legacy-path parity" section).
"""

import argparse
import heapq
import itertools
import json
import sys
import tempfile
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from scripts.measure_reference_baseline import install_shims  # noqa: E402
from scripts.compare_reference_accuracy import (  # noqa: E402
    copy_weights_to_tf)

VOXEL = 9.2          # Tier A z_xy_ratio (worm1)
T_A, N_A = 21, 150
T_A_ENS, ENS_A = 11, 5


# --------------------------------------------------------------------------
# faithful shims for the three skimage functions the legacy path executes
# --------------------------------------------------------------------------
def _sk_gaussian(image, sigma=1.0, mode="nearest", cval=0.0, truncate=4.0,
                 **_kw):
    """skimage.filters.gaussian: img_as_float (bool -> {0.,1.}) then
    scipy.ndimage.gaussian_filter."""
    import scipy.ndimage as ndi
    return ndi.gaussian_filter(np.asarray(image, np.float64), sigma,
                               mode=mode, cval=cval, truncate=truncate)


def _sk_label(image, connectivity=None, background=0):
    """skimage.measure.label: connected regions of EQUAL value (not merely
    nonzero), output ids in raster-scan first-encounter order."""
    import scipy.ndimage as ndi
    image = np.asarray(image)
    if connectivity is None:
        connectivity = image.ndim
    structure = ndi.generate_binary_structure(image.ndim, connectivity)
    out = np.zeros(image.shape, np.int64)
    nxt = 0
    for v in np.unique(image):
        if v == background:
            continue
        lab, k = ndi.label(image == v, structure)
        out[lab > 0] = lab[lab > 0] + nxt
        nxt += k
    # raster-scan first-encounter relabeling (skimage union-find order)
    flat = out.ravel()
    nz = np.flatnonzero(flat)
    if nz.size:
        vals, first = np.unique(flat[nz], return_index=True)
        order = np.argsort(first)                # vals ranked by appearance
        remap = np.zeros(int(vals.max()) + 1, np.int64)
        remap[vals[order]] = np.arange(1, len(vals) + 1)
        out = remap[out]
    return out


def _sk_watershed(image, markers=None, connectivity=1, offset=None,
                  mask=None, compactness=0, watershed_line=False):
    """skimage.segmentation.watershed: marker-seeded priority flood.
    Heap key (value, age, FIFO); labels assigned at push time."""
    image = np.asarray(image, np.float64)
    import scipy.ndimage as ndi
    if np.isscalar(connectivity):
        structure = ndi.generate_binary_structure(image.ndim, connectivity)
    else:
        structure = np.asarray(connectivity, bool)
    if mask is None:
        mask = np.ones(image.shape, bool)
    # pad by 1 so flat neighbor offsets never wrap
    pad = [(1, 1)] * image.ndim
    img_p = np.pad(image, pad, constant_values=np.inf)
    mask_p = np.pad(np.asarray(mask, bool), pad, constant_values=False)
    mark_p = np.pad(np.asarray(markers), pad, constant_values=0)
    out = np.where(mask_p, mark_p, 0).astype(np.int64)
    flat_img, flat_mask, flat_out = (img_p.ravel(), mask_p.ravel(),
                                     out.ravel())
    # neighbor offsets in the structure's raster order (center excluded)
    center = tuple(s // 2 for s in structure.shape)
    strides = np.array(img_p.strides) // img_p.itemsize
    offsets = []
    for idx in np.argwhere(structure):
        if tuple(idx) == center:
            continue
        offsets.append(int(np.dot(idx - center, strides)))
    heap = []
    cnt = itertools.count()
    for i in np.flatnonzero((flat_out != 0) & flat_mask):
        heapq.heappush(heap, (flat_img[i], 0, next(cnt), int(i)))
    age = 0
    while heap:
        _, _, _, i = heapq.heappop(heap)
        lab = flat_out[i]
        for off in offsets:
            n = i + off
            if not flat_mask[n] or flat_out[n] != 0:
                continue
            age += 1
            flat_out[n] = lab
            heapq.heappush(heap, (flat_img[n], age, next(cnt), n))
    sl = tuple(slice(1, -1) for _ in range(image.ndim))
    return flat_out.reshape(img_p.shape)[sl]


def install_legacy_shims():
    """install_shims() plus real implementations for what the legacy path
    executes (scipy.ndimage.{filters,measurements} module aliases removed
    in scipy>=1.15, and the three skimage functions)."""
    install_shims()
    import scipy.ndimage as ndi
    f = types.ModuleType("scipy.ndimage.filters")
    f.gaussian_filter = ndi.gaussian_filter
    sys.modules["scipy.ndimage.filters"] = f
    ndi.filters = f
    m = types.ModuleType("scipy.ndimage.measurements")
    for n in ("center_of_mass", "find_objects", "label", "sum"):
        setattr(m, n, getattr(ndi, n))
    sys.modules["scipy.ndimage.measurements"] = m
    ndi.measurements = m
    sys.modules["skimage.filters"].gaussian = _sk_gaussian
    sys.modules["skimage.measure"].label = _sk_label
    sys.modules["skimage.segmentation"].watershed = _sk_watershed
    sys.path.insert(0, "/root/reference")


# --------------------------------------------------------------------------
# shared FFN: train ours, mirror into a TF twin with the legacy two-input
# calling convention (track.py:175 predict([ref_batch, tgt_batch]))
# --------------------------------------------------------------------------
def build_tf_twin(params, state):
    import tensorflow as tf
    inp_r = tf.keras.Input((61,))
    inp_t = tf.keras.Input((61,))
    d_feat = tf.keras.layers.Dense(512, use_bias=False)
    bn_feat = tf.keras.layers.BatchNormalization()
    act = tf.keras.layers.LeakyReLU()
    fr = act(bn_feat(d_feat(inp_r)))
    ft = act(bn_feat(d_feat(inp_t)))
    h = tf.keras.layers.Concatenate()([fr, ft])
    d_comb = tf.keras.layers.Dense(512, use_bias=False)
    bn_comb = tf.keras.layers.BatchNormalization()
    h = tf.keras.layers.LeakyReLU()(bn_comb(d_comb(h)))
    out = tf.keras.layers.Dense(1, activation="sigmoid")(h)
    model = tf.keras.Model([inp_r, inp_t], out)

    def bn_w(p, s):
        return [np.asarray(p["scale"]), np.asarray(p["bias"]),
                np.asarray(s["mean"]), np.asarray(s["var"])]

    d_feat.set_weights([np.asarray(params["feat"]["w"])])
    bn_feat.set_weights(bn_w(params["feat_bn"], state["feat_bn"]))
    d_comb.set_weights([np.asarray(params["comb"]["w"])])
    bn_comb.set_weights(bn_w(params["comb_bn"], state["comb_bn"]))
    model.layers[-1].set_weights([np.asarray(params["pred"]["w"]),
                                  np.asarray(params["pred"]["b"])])
    return model


def train_shared_ffn(work: Path, cloud_real: np.ndarray, tag: str):
    """Train our FFN on the UN-normalized real cloud: the legacy matcher
    (``track.py:117 initial_matching_quick``) scores raw real coordinates
    — the legacy-era pretrained .h5 FFNs were trained at that scale — so
    the kNN mean-distance input feature must be in-distribution there.
    (``TrainFFN`` PCA-normalizes like the v1.0 path; override its cloud.)"""
    from t3dct.models.train_ffn import TrainFFN, DataGeneratorFFN
    pts_file = work / f"pts_{tag}.txt"
    np.savetxt(pts_file, cloud_real)
    trainer = TrainFFN(f"legacy_parity_ffn_{tag}",
                       points1_path=str(pts_file),
                       basedir=work / f"ffn_{tag}", seed=0)
    trainer.points_t1 = np.asarray(cloud_real, np.float32)
    trainer.points_generator = DataGeneratorFFN(trainer.points_t1, seed=0)
    print(f"training FFN ({tag})...", flush=True)
    trainer.train(num_epochs=1, iteration=600, verbose=False)
    return trainer.params, trainer.bn_state


# --------------------------------------------------------------------------
# reference-side stub drivers (bound reference methods on a bare instance)
# --------------------------------------------------------------------------
def ref_stub(ffn_tf, siz_xyz, z_xy_ratio, z_scaling, beta, lambda_, maxiter,
             ensemble):
    from CellTracker.tracker import Tracker as RefTracker, History
    s = RefTracker.__new__(RefTracker)
    s.x_siz, s.y_siz, s.z_siz = siz_xyz
    s.z_xy_ratio, s.z_scaling = float(z_xy_ratio), int(z_scaling)
    s.beta_tk, s.lambda_tk, s.max_iteration = beta, lambda_, maxiter
    s.ensemble, s.adjacent, s.miss_frame = ensemble, False, []
    s.ffn_model = ffn_tf
    s.history = History()
    return s


def ref_predict(stub, source_volume):
    from CellTracker.tracker import Tracker as RefTracker
    pred, _ = RefTracker._predict_pos_once(stub, source_volume=source_volume,
                                           draw=False)
    return pred


def our_tracker(work: Path, ffn_weights, siz_xyz, z_xy_ratio, z_scaling,
                beta, lambda_, maxiter, ensemble, **kw):
    from t3dct.engine.legacy import Tracker
    tr = Tracker(volume_num=99, siz_xyz=siz_xyz, z_xy_ratio=z_xy_ratio,
                 z_scaling=z_scaling, noise_level=20, min_size=20,
                 beta_tk=beta, lambda_tk=lambda_, maxiter_tk=maxiter,
                 folder_path=str(work), image_name="raw_t%03i_z%03i.tif",
                 unet_model_file="unet.npz", ffn_model_file="ffn.npz",
                 ensemble=ensemble, **kw)
    tr.load_ffn_arrays(*ffn_weights)
    return tr


# --------------------------------------------------------------------------
# Tier A — prediction core at worm scale, correction = identity
# --------------------------------------------------------------------------
def tier_a(work: Path, ffn_weights, ffn_tf, ensemble, t_vols,
           maxiter) -> dict:
    from bench import make_drifting_centers
    from CellTracker.track import get_reference_vols
    from scipy.stats import trim_mean as ref_trim_mean
    from t3dct.ops.trim import trim_mean as our_trim_mean
    import jax.numpy as jnp

    gt_by_t = make_drifting_centers(n_vols=t_vols, n_cells=N_A,
                                    shape=(24, 401, 168))
    jr = np.random.RandomState(1)
    # legacy real frame: rows are (x, y, z*ratio); generator rows are
    # (z, y, x) voxels -> reorder to (y, x, z) like the seg artifacts
    seg_real = {}
    for t in range(1, t_vols + 1):
        pts = gt_by_t[t] + jr.randn(*gt_by_t[t].shape).astype(
            np.float32) * 0.25
        seg_real[t] = pts[:, [1, 2, 0]] * np.array([1.0, 1.0, VOXEL])

    beta, lam = 300.0, 0.1
    sizes = (401, 168, 24)

    # ---- reference side --------------------------------------------------
    stub = ref_stub(ffn_tf, sizes, VOXEL, 10, beta, lam, maxiter, ensemble)
    stub.cell_num_t0 = N_A
    stub.r_coordinates_tracked_t0 = seg_real[1].astype(np.float64)
    stub.r_coordinates_segment_t0 = seg_real[1].astype(np.float64)
    stub.history.r_displacements = [np.zeros((N_A, 3))]
    stub.history.r_segmented_coordinates = [stub.r_coordinates_segment_t0]
    stub.history.r_tracked_coordinates = [stub.r_coordinates_tracked_t0]
    refs = {1: stub.r_coordinates_tracked_t0.copy()}
    for t in range(2, t_vols + 1):
        print(f"[tier A ens={bool(ensemble)}] reference t={t}", flush=True)
        stub.segresult = types.SimpleNamespace(
            r_coordinates_segment=seg_real[t].astype(np.float64))
        sources = get_reference_vols(ensemble, t, adjacent=False)
        preds = [ref_predict(stub, sv) for sv in sources]
        mean = ref_trim_mean(preds, 0.1, axis=0)
        r_disp = stub.history.r_displacements[-1] + (
            mean - stub.history.r_tracked_coordinates[-1])
        stub.history.r_displacements.append(r_disp)
        stub.history.r_segmented_coordinates.append(
            stub.segresult.r_coordinates_segment)
        stub.history.r_tracked_coordinates.append(
            stub.r_coordinates_tracked_t0 + r_disp)
        refs[t] = stub.history.r_tracked_coordinates[-1].copy()

    # ---- our side --------------------------------------------------------
    from t3dct.engine.legacy import get_reference_vols as our_sources
    tr = our_tracker(work / f"ours_a{int(bool(ensemble))}", ffn_weights,
                     sizes, VOXEL, 10, beta, lam, maxiter, ensemble)
    tr.cell_num_t0 = N_A
    tr.r_coordinates_tracked_t0 = seg_real[1].astype(np.float64)
    tr.r_coordinates_segment_t0 = seg_real[1].astype(np.float64)
    tr.initiate_tracking()
    ours = {1: seg_real[1].astype(np.float64)}
    for t in range(2, t_vols + 1):
        print(f"[tier A ens={bool(ensemble)}] ours t={t}", flush=True)
        tr.segresult = types.SimpleNamespace(
            r_coordinates_segment=seg_real[t].astype(np.float64))
        sources = our_sources(ensemble, t, adjacent=False)
        assert sources == get_reference_vols(ensemble, t, adjacent=False)
        preds = [tr._predict_pos_once(source_volume=sv)[0]
                 for sv in sources]
        mean = np.asarray(our_trim_mean(jnp.asarray(np.stack(preds)), 0.1,
                                        axis=0)) \
            if len(preds) > 1 else preds[0]
        r_disp = tr.history.r_displacements[-1] + (
            mean - tr.history.r_tracked_coordinates[-1])
        tr.history.r_displacements.append(r_disp)
        tr.history.r_segmented_coordinates.append(
            tr.segresult.r_coordinates_segment)
        tr.history.r_tracked_coordinates.append(
            tr.r_coordinates_tracked_t0 + r_disp)
        ours[t] = tr.history.r_tracked_coordinates[-1].copy()

    return compare_recurrences(ours, refs, gt_by_t, t_vols)


def compare_recurrences(ours, refs, gt_by_t, t_n):
    devs = [np.linalg.norm(ours[t] - refs[t], axis=1)
            for t in range(2, t_n + 1)]
    all_d = np.concatenate(devs)
    gt = gt_by_t[t_n][:, [1, 2, 0]] * np.array([1.0, 1.0, VOXEL])
    a_ours = np.linalg.norm(ours[t_n][:, None] - gt[None], axis=2).argmin(1)
    a_refs = np.linalg.norm(refs[t_n][:, None] - gt[None], axis=2).argmin(1)
    return {
        "single_step_median_deviation": float(np.median(devs[0])),
        "final_t_median_deviation": float(np.median(devs[-1])),
        "median_deviation_real_units": float(np.median(all_d)),
        "p95_deviation_real_units": float(np.percentile(all_d, 95)),
        "max_deviation_real_units": float(all_d.max()),
        "assignment_agreement_tN": float((a_ours == a_refs).mean()),
        "our_median_err_vs_gt_tN": float(np.median(
            np.linalg.norm(ours[t_n] - gt[a_ours], axis=1))),
        "ref_median_err_vs_gt_tN": float(np.median(
            np.linalg.norm(refs[t_n] - gt[a_refs], axis=1))),
    }


# --------------------------------------------------------------------------
# Tier B — full track_one_vol with images, correction + paste + boundary
# --------------------------------------------------------------------------
B_SHAPE = (80, 80, 10)          # (x, y, z)
B_RATIO, B_SCALING = 2.5, 3
B_T = 6
B_BETA, B_LAMBDA, B_MAXITER = 150.0, 0.1, 10


def tier_b_data():
    """Shared synthetic recording: 25 drifting spherical cells with
    GT-derived seg coords and synthetic U-Net-probability / raw images."""
    rng = np.random.RandomState(7)
    gx, gy = np.meshgrid(np.arange(8, 80, 16), np.arange(8, 80, 16))
    centers0 = np.stack([gx.ravel(), gy.ravel(),
                         rng.uniform(3.5, 6.5, 25)], 1).astype(np.float64)
    centers0[:, :2] += rng.uniform(-2, 2, (25, 2))
    phase = rng.uniform(0, 2 * np.pi, (25, 3))
    amp = np.array([1.1, 1.1, 0.25])

    def centers_at(t):
        return centers0 + amp * np.sin(phase + 0.7 * (t - 1))

    xx, yy, zz = np.mgrid[:80, :80, :10].astype(np.float64)

    def d2_all(centers):
        return ((xx[None] - centers[:, 0, None, None, None]) ** 2
                + (yy[None] - centers[:, 1, None, None, None]) ** 2
                + ((zz[None] - centers[:, 2, None, None, None])
                   * B_RATIO) ** 2)

    lab1 = np.zeros(B_SHAPE, np.int16)
    d20 = d2_all(centers0)
    order = np.argsort(d20, axis=0)[0]
    lab1[d20.min(0) < 3.0 ** 2] = (order + 1)[d20.min(0) < 3.0 ** 2]

    vols = {}
    jr = np.random.RandomState(11)
    for t in range(1, B_T + 1):
        c = centers_at(t)
        bump = np.exp(-d2_all(c) / (2 * 2.0 ** 2)).sum(0)
        prob = np.clip(bump, 0, 1).astype(np.float64)
        raw = 200.0 + 20000.0 * np.clip(bump, 0, 1.5) + \
            np.random.RandomState(100 + t).rand(*B_SHAPE) * 100.0
        seg_layer = c + jr.randn(25, 3) * 0.15
        seg_real = seg_layer * np.array([1.0, 1.0, B_RATIO])
        vols[t] = dict(prob=prob, gcn=raw / 65536.0, seg_real=seg_real,
                       gt_layer=c)
    return lab1, vols


def ref_tier_b(lab1, vols, ffn_tf, ensemble) -> dict:
    """Reference-method composition of segment-free track_one_vol
    (tracker.py:1473-1536 minus _segment and file saves)."""
    import scipy.ndimage as ndm
    from CellTracker.tracker import Tracker as RefTracker
    from CellTracker.track import get_reference_vols
    from scipy.stats import trim_mean

    stub = ref_stub(ffn_tf, B_SHAPE, B_RATIO, B_SCALING, B_BETA, B_LAMBDA,
                    B_MAXITER, ensemble)
    stub.use_8_bit = True
    stub.segmentation_manual_relabels = lab1.astype("int16")
    # ---- interpolate_seg minus saving (tracker.py:1046-1075)
    stub.seg_cells_interpolated_corrected = RefTracker._interpolate(stub)
    stub.Z_RANGE_INTERP = range(
        stub.z_scaling // 2,
        stub.seg_cells_interpolated_corrected.shape[2], stub.z_scaling)
    stub.seg_cells_interpolated_corrected = \
        RefTracker._relabel_separated_cells(
            stub.seg_cells_interpolated_corrected)
    stub.segmentation_manual_relabels = \
        stub.seg_cells_interpolated_corrected[:, :, stub.Z_RANGE_INTERP]
    c0 = ndm.center_of_mass(
        stub.segmentation_manual_relabels > 0,
        stub.segmentation_manual_relabels,
        range(1, stub.segmentation_manual_relabels.max() + 1))
    stub.r_coordinates_tracked_t0 = RefTracker._transform_layer_to_real(
        stub, np.asarray(c0))
    stub.cell_num_t0 = stub.r_coordinates_tracked_t0.shape[0]
    RefTracker.cal_subregions(stub)
    n0 = stub.cell_num_t0

    stub.r_coordinates_segment_t0 = vols[1]["seg_real"]
    stub.cells_on_boundary = np.zeros(n0).astype(int)
    stub.history.r_displacements = [np.zeros((n0, 3))]
    stub.history.r_segmented_coordinates = [vols[1]["seg_real"]]
    stub.history.r_tracked_coordinates = [stub.r_coordinates_tracked_t0]

    tracked, labels_by_t, i_disp_by_t = \
        {1: stub.r_coordinates_tracked_t0.copy()}, {}, {}
    for t in range(2, B_T + 1):
        print(f"[tier B ens={bool(ensemble)}] reference t={t}", flush=True)
        stub.segresult = types.SimpleNamespace(
            r_coordinates_segment=vols[t]["seg_real"],
            image_cell_bg=vols[t]["prob"][None, ..., None],
            image_gcn=vols[t]["gcn"])
        sources = get_reference_vols(ensemble, t, adjacent=False)
        preds = [ref_predict(stub, sv) for sv in sources]
        mean = trim_mean(preds, 0.1, axis=0)
        cells_bd = RefTracker._get_cells_onBoundary(stub, mean,
                                                    bool(ensemble))
        stub.cells_on_boundary[cells_bd] = 1
        r_disp, i_disp = RefTracker._accurate_correction(
            stub, stub.cells_on_boundary, mean)
        labels_by_t[t] = RefTracker._transform_motion_to_image(
            stub, stub.cells_on_boundary, i_disp)
        i_disp_by_t[t] = i_disp.copy()
        if ensemble:
            stub.cells_on_boundary = np.zeros(n0).astype(int)
        stub.history.r_displacements.append(r_disp)
        stub.history.r_segmented_coordinates.append(vols[t]["seg_real"])
        stub.history.r_tracked_coordinates.append(
            stub.r_coordinates_tracked_t0 + r_disp)
        tracked[t] = stub.history.r_tracked_coordinates[-1].copy()
    return dict(tracked=tracked, labels=labels_by_t, i_disp=i_disp_by_t,
                t0=stub.r_coordinates_tracked_t0, n0=n0)


def our_tier_b(work: Path, lab1, vols, ffn_weights, ensemble) -> dict:
    from t3dct.engine.legacy import Tracker  # noqa: F401
    tr = our_tracker(work / f"ours_b{int(bool(ensemble))}", ffn_weights,
                     B_SHAPE, B_RATIO, B_SCALING, B_BETA, B_LAMBDA,
                     B_MAXITER, ensemble, paste_mode="reference",
                     max_cells=64)
    tr.segmentation_manual_relabels = lab1.astype(np.int32)
    tr.interpolate_seg()
    tr.r_coordinates_segment_t0 = vols[1]["seg_real"]
    tr.initiate_tracking()
    tracked, labels_by_t, i_disp_by_t = \
        {1: tr.r_coordinates_tracked_t0.copy()}, {}, {}
    for t in range(2, B_T + 1):
        print(f"[tier B ens={bool(ensemble)}] ours t={t}", flush=True)
        seg = types.SimpleNamespace(
            r_coordinates_segment=vols[t]["seg_real"],
            image_cell_bg=vols[t]["prob"],
            image_gcn=vols[t]["gcn"])
        tr.track_one_vol(t, segresult=seg)
        tracked[t] = tr.history.r_tracked_coordinates[-1].copy()
        labels_by_t[t] = tr.tracked_labels.copy()
    return dict(tracked=tracked, labels=labels_by_t, i_disp=i_disp_by_t,
                t0=tr.r_coordinates_tracked_t0, n0=tr.cell_num_t0)


def compare_tier_b(ours, refs, vols) -> dict:
    rep = {"cell_num_t0_ours": int(ours["n0"]),
           "cell_num_t0_ref": int(refs["n0"])}
    # match cell ids by nearest t0 centers (CC relabel order may differ)
    d = np.linalg.norm(ours["t0"][:, None] - refs["t0"][None], axis=2)
    perm = d.argmin(1)                     # ours[i] <-> refs[perm[i]]
    rep["t0_id_permutation_clean"] = bool(
        len(set(perm.tolist())) == len(perm))
    rep["t0_median_center_deviation"] = float(
        np.median(d[np.arange(len(perm)), perm]))
    devs = []
    for t in range(2, B_T + 1):
        devs.append(np.linalg.norm(
            ours["tracked"][t] - refs["tracked"][t][perm], axis=1))
    all_d = np.concatenate(devs)
    rep["median_deviation_real_units"] = float(np.median(all_d))
    rep["p95_deviation_real_units"] = float(np.percentile(all_d, 95))
    rep["max_deviation_real_units"] = float(all_d.max())
    rep["final_t_median_deviation"] = float(np.median(devs[-1]))
    # tracked-label agreement (ids mapped through perm)
    n0 = len(perm)
    remap = np.zeros(n0 + 1, np.int64)
    remap[1:] = perm + 1                    # our id i+1 -> ref id perm[i]+1
    to_i = np.array([1.0, 1.0, B_SCALING / B_RATIO])
    agree, agree_m, idisp_eq = [], [], []
    for t in range(2, B_T + 1):
        lo = remap[np.asarray(ours["labels"][t], np.int64)]
        lr = np.asarray(refs["labels"][t], np.int64)
        fg = (lo > 0) | (lr > 0)
        agree.append(float((lo[fg] == lr[fg]).mean()))
        # the pasted label position is set by the INTEGER interp-frame
        # displacement (tracker.py:1369-1371): a sub-0.5-voxel r_disp
        # deviation that crosses a rint boundary shifts a whole cell by
        # one voxel.  Separate that quantization effect from structural
        # mismatch: compare labels only over cells whose i_disp agrees.
        di_o = np.rint((ours["tracked"][t] - ours["t0"]) * to_i)
        di_r = np.rint((refs["tracked"][t] - refs["t0"]) * to_i)[perm]
        same = np.all(di_o == di_r, axis=1)
        idisp_eq.append(float(same.mean()))
        ref_ids_same = set((perm[same] + 1).tolist())
        keep = np.isin(lo, list(ref_ids_same)) | \
            np.isin(lr, list(ref_ids_same))
        if keep.any():
            agree_m.append(float((lo[keep] == lr[keep]).mean()))
    rep["label_agreement_min"] = float(np.min(agree))
    rep["label_agreement_mean"] = float(np.mean(agree))
    rep["i_disp_equal_fraction"] = float(np.mean(idisp_eq))
    rep["label_agreement_same_idisp_cells"] = float(np.mean(agree_m)) \
        if agree_m else None
    # accuracy vs GT at final t (both sides, real frame) — NOTE: this is
    # assignment-by-proximity (each tracked point scored against its
    # nearest GT), not identity-tracked error
    gt = vols[B_T]["gt_layer"] * np.array([1.0, 1.0, B_RATIO])
    for key, data in (("our", ours), ("ref", refs)):
        tr = data["tracked"][B_T]
        a = np.linalg.norm(tr[:, None] - gt[None], axis=2).argmin(1)
        rep[f"{key}_median_err_vs_gt_tN"] = float(np.median(
            np.linalg.norm(tr - gt[a], axis=1)))
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="both", choices=["A", "B", "both"])
    ap.add_argument("--tpu", action="store_true",
                    help="let JAX pick the default (TPU) backend; default "
                         "forces CPU so both sides share the host")
    args = ap.parse_args()

    install_legacy_shims()
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import t3dct  # noqa: F401

    work = Path(tempfile.mkdtemp(prefix="t3dct_legacy_parity_"))
    report = {}

    if args.tier in ("A", "both"):
        from bench import make_drifting_centers
        gt1 = make_drifting_centers(n_vols=1, n_cells=N_A,
                                    shape=(24, 401, 168))[1]
        cloud = gt1[:, [1, 2, 0]] * np.array([1.0, 1.0, VOXEL])
        params, state = train_shared_ffn(work, cloud, "a")
        ffn_tf = build_tf_twin(params, state)
        report["tierA_single"] = tier_a(work, (params, state), ffn_tf,
                                        ensemble=False, t_vols=T_A,
                                        maxiter=20)
        print(json.dumps({"tierA_single": report["tierA_single"]},
                         indent=2), flush=True)
        report["tierA_ensemble"] = tier_a(work, (params, state), ffn_tf,
                                          ensemble=ENS_A, t_vols=T_A_ENS,
                                          maxiter=10)
        print(json.dumps({"tierA_ensemble": report["tierA_ensemble"]},
                         indent=2), flush=True)

    if args.tier in ("B", "both"):
        lab1, vols = tier_b_data()
        cloud_b = vols[1]["seg_real"]
        params_b, state_b = train_shared_ffn(work, cloud_b, "b")
        ffn_tf_b = build_tf_twin(params_b, state_b)
        for ens, key in ((False, "tierB_single"), (3, "tierB_ensemble")):
            refs = ref_tier_b(lab1, vols, ffn_tf_b, ens)
            ours = our_tier_b(work, lab1, vols, (params_b, state_b), ens)
            report[key] = compare_tier_b(ours, refs, vols)
            print(json.dumps({key: report[key]}, indent=2), flush=True)

    out = Path(__file__).parent / "legacy_parity_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"written to {out}")


if __name__ == "__main__":
    main()
