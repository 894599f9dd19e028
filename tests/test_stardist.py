"""StarDist3D path: ray geometry, MC polyhedron overlap vs analytic
sphere intersection, greedy NMS, label rendering, sparse candidates,
end-to-end predict_instances, config heuristics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t3dct.config import StarDistConfig
from t3dct.engine.stardist import (StarDist3D, configure, predict_and_save,
                                   calculate_extents)
from t3dct.models.stardist3d import (StarDist3DNet, sparse_candidates,
                                     upsample_prob_map)
from t3dct.ops.nms import (greedy_nms, overlap_matrix,
                           render_polyhedra_labels)
from t3dct.ops.rays import rays_golden_spiral, polyhedron_volumes


def test_rays_unit_and_uniform():
    rays = rays_golden_spiral(96)
    assert rays.shape == (96, 3)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, rtol=1e-5)
    # roughly uniform: nearest-neighbor angles all similar
    cos = rays @ rays.T - 2 * np.eye(96)
    nn_angle = np.degrees(np.arccos(np.clip(cos.max(axis=1), -1, 1)))
    assert nn_angle.max() < 30 and nn_angle.min() > 5


def test_rays_anisotropy_tilts_towards_fine_axes():
    rays = rays_golden_spiral(96, anisotropy=(9.0, 1.0, 1.0))
    # unit norm preserved
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, rtol=1e-5)
    # mean |z| component should shrink vs isotropic
    iso = rays_golden_spiral(96)
    assert np.abs(rays[:, 0]).mean() < np.abs(iso[:, 0]).mean()


def test_polyhedron_volume_sphere():
    rays = jnp.asarray(rays_golden_spiral(96))
    r = 7.0
    vol = float(polyhedron_volumes(jnp.full((1, 96), r), rays)[0])
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * r ** 3, rtol=0.02)


def sphere_overlap_fraction(r, d):
    """Analytic equal-sphere intersection / sphere volume."""
    if d >= 2 * r:
        return 0.0
    v_int = np.pi * (4 * r + d) * (2 * r - d) ** 2 / 12
    return v_int / (4 / 3 * np.pi * r ** 3)


@pytest.mark.parametrize("d", [0.0, 4.0, 8.0, 12.0])
def test_overlap_matrix_vs_analytic_spheres(d):
    rays = jnp.asarray(rays_golden_spiral(96))
    r = 6.0
    centers = jnp.asarray([[0, 0, 0], [0, 0, d]], jnp.float32)
    dists = jnp.full((2, 96), r)
    valid = jnp.ones(2, bool)
    got = np.asarray(overlap_matrix(centers, dists, rays, valid,
                                    n_samples=64, n_fracs=6))
    want = sphere_overlap_fraction(r, d)
    assert abs(got[0, 1] - want) < 0.08
    assert abs(got[1, 0] - want) < 0.08
    np.testing.assert_allclose(got[0, 0], 1.0, atol=0.01)


def test_overlap_neighbor_cap_dense_cluster():
    """Regression: neighbor_limit is a COUNT cap, not a distance cutoff —
    in a cluster with more candidates than the cap, the suppressing
    high-prob candidate fell outside a far-edge candidate's M nearest,
    overlap[kept, j] stayed 0, and greedy NMS kept duplicate instances.
    Passing prob unions in the prob-top-M set and closes the hole."""
    n_rays = 32
    rays = jnp.asarray(rays_golden_spiral(n_rays))
    k = 20
    # candidates on a line, spacing 0.1, all inside one radius-5 "cell"
    centers = jnp.stack([jnp.zeros(k), jnp.zeros(k),
                         0.1 * jnp.arange(k, dtype=jnp.float32)], axis=1)
    dists = jnp.full((k, n_rays), 5.0)
    valid = jnp.ones(k, bool)
    prob = jnp.full((k,), 0.5).at[0].set(1.0)      # candidate 0 = the core

    ov_capped = overlap_matrix(centers, dists, rays, valid,
                               neighbor_limit=3)
    kept_capped = np.asarray(greedy_nms(prob, ov_capped, valid, 0.3))
    assert kept_capped.sum() > 1                   # the documented failure

    ov_fixed = overlap_matrix(centers, dists, rays, valid,
                              neighbor_limit=3, prob=prob)
    kept_fixed = np.asarray(greedy_nms(prob, ov_fixed, valid, 0.3))
    assert kept_fixed.sum() == 1 and kept_fixed[0]


def test_greedy_nms():
    prob = jnp.asarray([0.9, 0.8, 0.7])
    overlap = jnp.asarray([[1.0, 0.6, 0.0],
                           [0.6, 1.0, 0.0],
                           [0.0, 0.0, 1.0]])
    kept = np.asarray(greedy_nms(prob, overlap, jnp.ones(3, bool),
                                 nms_thresh=0.3))
    np.testing.assert_array_equal(kept, [True, False, True])
    # higher threshold keeps all
    kept2 = np.asarray(greedy_nms(prob, overlap, jnp.ones(3, bool),
                                  nms_thresh=0.7))
    np.testing.assert_array_equal(kept2, [True, True, True])


def test_render_polyhedra():
    rays = jnp.asarray(rays_golden_spiral(96))
    centers = jnp.asarray([[10, 10, 10], [10, 10, 18]], jnp.float32)
    dists = jnp.full((2, 96), 5.0)
    prob = jnp.asarray([0.9, 0.8])
    kept = jnp.ones(2, bool)
    labels = np.asarray(render_polyhedra_labels(
        centers, dists, rays, prob, kept, (21, 21, 30), (13, 13, 13)))
    # instance 1 = higher prob at its center
    assert labels[10, 10, 10] == 1
    assert labels[10, 10, 18] == 2
    # overlap region (z, y, x)=(10, 10, 14): both within r=5 -> prob 1 wins
    assert labels[10, 10, 14] == 1
    # volumes roughly spherical
    v1 = (labels == 1).sum()
    assert abs(v1 - 4 / 3 * np.pi * 125) / (4 / 3 * np.pi * 125) < 0.25
    assert labels[0, 0, 0] == 0


def test_sparse_candidates_grid_mapping():
    prob = np.zeros((16, 16, 16), np.float32)
    prob[5, 6, 7] = 0.9
    prob[10, 11, 12] = 0.8
    prob[0, 1, 1] = 0.95     # inside the b=2 border -> excluded
    dist = np.ones((16, 16, 16, 8), np.float32) * 3.0
    probs, dists, points, valid = sparse_candidates(
        jnp.asarray(prob), jnp.asarray(dist), grid=(2, 1, 1),
        prob_thresh=0.5, max_candidates=8)
    probs, points, valid = (np.asarray(probs), np.asarray(points),
                            np.asarray(valid))
    assert valid.sum() == 2
    got = {tuple(p) for p in points[valid]}
    assert got == {(10, 6, 7), (20, 11, 12)}   # z multiplied by grid 2


def test_sparse_candidates_lmax_prefilter_keeps_dim_peaks():
    """Under a small candidate budget, the local-max prefilter keeps one
    candidate per prob peak instead of spending the whole budget on the
    brightest cluster (the reference has no budget; its NMS collapses
    each cluster to its peak — see sparse_candidates docstring)."""
    zz, yy, xx = np.mgrid[:16, :16, :16].astype(np.float32)
    bright = np.exp(-((zz - 5) ** 2 + (yy - 5) ** 2 + (xx - 5) ** 2) / 18)
    dim = 0.5 * np.exp(-((zz - 11) ** 2 + (yy - 11) ** 2
                         + (xx - 11) ** 2) / 18)
    prob = np.maximum(bright, dim).astype(np.float32)
    dist = np.ones((16, 16, 16, 8), np.float32)

    def run(prefilter):
        p, d, pts, v = sparse_candidates(
            jnp.asarray(prob), jnp.asarray(dist), grid=(1, 1, 1),
            prob_thresh=0.2, max_candidates=4, lmax_prefilter=prefilter)
        return np.asarray(pts)[np.asarray(v)]

    raw = run(False)            # budget 4 all burned on the bright peak
    assert len(raw) == 4
    assert np.linalg.norm(raw - [5, 5, 5], axis=1).max() < 3
    filt = run(True)            # exactly the two peaks
    assert len(filt) == 2
    assert {tuple(p) for p in filt} == {(5, 5, 5), (11, 11, 11)}


def test_lmax_prefilter_matches_uncapped_reference_nms():
    """Prefiltered candidates at a small budget produce the SAME final
    NMS instances as the reference's uncapped candidate set (every
    above-thresh voxel, budget >= all of them) on a multi-blob scene."""
    shape = (20, 40, 40)
    centers = [(6, 8, 8), (6, 8, 30), (12, 30, 10), (14, 28, 30),
               (9, 20, 20)]
    heights = [1.0, 0.9, 0.8, 0.7, 0.6]
    zz, yy, xx = np.mgrid[:20, :40, :40].astype(np.float32)
    prob = np.zeros(shape, np.float32)
    for (cz, cy, cx), h in zip(centers, heights):
        prob = np.maximum(prob, h * np.exp(
            -((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / 4.0))
    dist = np.full(shape + (16,), 4.0, np.float32)   # spheres r=4
    rays = jnp.asarray(rays_golden_spiral(16))

    def run(prefilter, budget):
        p, d, pts, v = sparse_candidates(
            jnp.asarray(prob), jnp.asarray(dist), grid=(1, 1, 1),
            prob_thresh=0.3, max_candidates=budget,
            lmax_prefilter=prefilter)
        ov = overlap_matrix(pts.astype(jnp.float32), d, rays, v,
                            neighbor_limit=min(budget, 512), prob=p)
        kept = np.asarray(greedy_nms(p, ov, v, 0.35))
        out = np.asarray(pts)[kept & np.asarray(v)]
        return out[np.lexsort(out.T)]

    a = run(True, 32)
    b = run(False, 1024)        # >= every above-thresh voxel
    np.testing.assert_array_equal(a, b)
    assert len(a) == len(centers)


def test_upsample_prob_map():
    prob = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    up = np.asarray(upsample_prob_map(jnp.asarray(prob), (2, 2, 2),
                                      (3, 4, 4)))
    assert up.shape == (3, 4, 4)
    assert up[0, 0, 0] == prob[0, 0, 0] and up[1, 1, 1] == prob[0, 0, 0]


@pytest.fixture(scope="module")
def small_model():
    cfg = StarDistConfig(n_rays=32, grid=(1, 2, 2),
                         anisotropy=(2.0, 1.0, 1.0),
                         unet_n_filter_base=8, net_conv_after_unet=16)
    return StarDist3D(cfg, max_candidates=64, render_box=(9, 17, 17))


def test_net_shapes(small_model):
    net = small_model.net
    x = jnp.ones((1, 8, 16, 16, 1))
    prob, dist = net.apply(small_model.params, x)
    # heads run at grid resolution: (z/1, y/2, x/2)
    assert prob.shape == (1, 8, 8, 8, 1)
    assert dist.shape == (1, 8, 8, 8, 32)
    assert net.div_by == (4, 8, 8)


def test_predict_instances_end_to_end(small_model):
    rng = np.random.RandomState(0)
    x = rng.rand(10, 40, 37).astype(np.float32)
    (labels, details), prob_map = small_model.predict_instances(x)
    # prob_map is at grid resolution (grid=(1,2,2))
    assert prob_map.shape == (10, 20, 19)
    assert labels.shape == x.shape
    k = details["points"].shape[0]
    assert details["prob"].shape == (k,)
    assert details["dist"].shape == (k, 32)
    assert labels.max() <= k
    # probabilities sorted descending (stardist id convention)
    if k > 1:
        assert (np.diff(details["prob"]) <= 1e-6).all()


def test_predict_instances_dense_and_return_predict(small_model):
    """The sparse=False / return_predict branch
    (stardist3dcustom.py:77-93,116-150): full prob/dist volumes next to
    the identical instances."""
    rng = np.random.RandomState(1)
    x = rng.rand(10, 40, 37).astype(np.float32)
    (labels_s, det_s), prob_map_s = small_model.predict_instances(x)

    # dense: same ((labels, details), prob_map) contract, full-precision
    # prob_map
    (labels_d, det_d), prob_d = small_model.predict_instances(x,
                                                              sparse=False)
    np.testing.assert_array_equal(labels_s, labels_d)
    np.testing.assert_array_equal(det_s["points"], det_d["points"])
    assert prob_d.shape == (10, 20, 19)
    assert prob_d.dtype == np.float32
    # sparse prob_map is the f16-quantized wire copy of the same values
    np.testing.assert_allclose(prob_map_s, prob_d, atol=1e-3)

    # model.predict: dense network outputs at grid resolution
    prob, dist = small_model.predict(x)
    np.testing.assert_array_equal(prob, prob_d)
    assert dist.shape == (10, 20, 19, 32)
    # candidate dists come from these dense maps (modulo the 1e-3 floor)
    pz, py, px = (det_s["points"] // np.array([1, 2, 2])).T
    np.testing.assert_allclose(
        det_s["dist"], np.maximum(dist[pz, py, px], 1e-3), rtol=1e-5)

    # return_predict forces dense with the reference's warning
    with pytest.warns(UserWarning, match="sparse to False"):
        (labels_r, _), (prob_r, dist_r), pm = \
            small_model.predict_instances(x, return_predict=True)
    np.testing.assert_array_equal(labels_r, labels_s)
    np.testing.assert_array_equal(prob_r, prob)
    np.testing.assert_array_equal(dist_r, dist)
    np.testing.assert_array_equal(pm, prob)


def test_configure_heuristics():
    lab = np.zeros((32, 64, 64), np.int32)
    lab[4:8, 10:22, 10:22] = 1      # z-extent 4, y/x 12 -> anisotropy z=3
    lab[20:24, 40:52, 30:42] = 2
    cfg = configure([lab, lab])
    assert cfg.grid[0] == 1          # strongly anisotropic z -> no z grid
    assert cfg.grid[1] == 2 and cfg.grid[2] == 2
    assert cfg.n_rays == 96
    assert cfg.train_patch_size[1] == cfg.train_patch_size[2]
    for s, d in zip(cfg.train_patch_size, (4, 8, 8)):
        assert s % d == 0
    ext = calculate_extents([lab])
    np.testing.assert_allclose(ext, [4, 12, 12])


def test_model_save_load_roundtrip(tmp_path, small_model):
    # optimized thresholds must survive the save/load round trip
    # (optimize_thresholds sets them; the reference's model folders
    # persist them in thresholds.json, stardistwrapper.py:39-43)
    orig = small_model._thresholds       # module-scoped fixture: restore
    try:
        small_model._thresholds = dict(prob=0.62, nms=0.41)
        small_model.save(tmp_path / "m")
    finally:
        small_model._thresholds = orig
    loaded = StarDist3D.load(tmp_path / "m")
    assert loaded._thresholds == dict(prob=0.62, nms=0.41)
    x = np.random.RandomState(1).rand(8, 32, 32).astype(np.float32)
    p1 = small_model.predict_sparse(x)[4]
    p2 = loaded.predict_sparse(x)[4]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)


def test_predict_and_save_batched_matches_single(tmp_path, small_model):
    """batch_size>1 fetches B volumes per RPC; artifacts must be
    IDENTICAL to the per-volume path (same programs, vmapped)."""
    from t3dct.io.imageio import save_label_slices

    rng = np.random.RandomState(5)
    raw_dir = tmp_path / "raw"
    for t in range(1, 8):
        vol = (rng.rand(8, 40, 32) * 50000).astype(np.uint16)
        save_label_slices(vol.transpose(1, 2, 0), raw_dir,
                          "raw_t%03i_z%04i.tif", t, use_8_bit=False,
                          compression=None)
    images_path = str(raw_dir / "raw_t%03i_z*.tif")

    predict_and_save(images_path, small_model, tmp_path / "r1",
                     batch_size=1)
    predict_and_save(images_path, small_model, tmp_path / "r3",
                     batch_size=3)

    for t in range(1, 8):
        c1 = np.load(tmp_path / "r1" / "seg" / ("coords%06d.npy" % t))
        c3 = np.load(tmp_path / "r3" / "seg" / ("coords%06d.npy" % t))
        np.testing.assert_array_equal(c1, c3)
        p1 = np.load(tmp_path / "r1" / "seg" / ("prob%06d.npy" % t))
        p3 = np.load(tmp_path / "r3" / "seg" / ("prob%06d.npy" % t))
        np.testing.assert_array_equal(p1, p3)


def test_predict_and_save_batched_partial_recording(tmp_path, small_model):
    """Loader failure mid-recording (reference semantics: warn + keep
    everything segmented so far) must flush the in-flight batch."""
    from t3dct.io.imageio import save_label_slices

    rng = np.random.RandomState(6)
    raw_dir = tmp_path / "raw"
    for t in range(1, 6):                     # t=6..7 missing
        vol = (rng.rand(8, 40, 32) * 50000).astype(np.uint16)
        save_label_slices(vol.transpose(1, 2, 0), raw_dir,
                          "raw_t%03i_z%04i.tif", t, use_8_bit=False,
                          compression=None)
    images_path = str(raw_dir / "raw_t%03i_z*.tif")
    import t3dct.io.imageio as iio
    t_max, t_min = iio.get_t_range(images_path)
    assert (t_max, t_min) == (5, 1)

    predict_and_save(images_path, small_model, tmp_path / "r",
                     batch_size=3)
    for t in range(1, 6):
        assert (tmp_path / "r" / "seg" / ("coords%06d.npy" % t)).exists()
        assert (tmp_path / "r" / "seg" / ("prob%06d.npy" % t)).exists()


def test_tpu_arch_honors_n_conv_per_depth():
    """unet_n_conv_per_depth must shape the DEFAULT backbone too (it used
    to be silently ignored outside arch='keras')."""
    import jax

    cfg3 = StarDistConfig(n_rays=8, grid=(1, 2, 2),
                          anisotropy=(2.0, 1.0, 1.0), unet_n_depth=1,
                          unet_n_filter_base=4, net_conv_after_unet=8,
                          unet_n_conv_per_depth=3)
    net = StarDist3DNet(cfg3)
    params = net.init(jax.random.PRNGKey(0))
    assert "down0_2" in params and "bottom_2" in params and \
        "up0_2" in params
    x = jnp.ones((1, 8, 16, 16, 1))
    prob, dist = net.apply(params, x)
    assert prob.shape == (1, 8, 8, 8, 1)
    # more convs -> wider receptive field than the 2-conv default
    cfg2 = StarDistConfig(**{**cfg3.__dict__, "unet_n_conv_per_depth": 2})
    assert all(a > b for a, b in zip(net.receptive_field(),
                                     StarDist3DNet(cfg2).receptive_field()))


def test_predict_and_save_tiled_recording(tmp_path, small_model):
    """``tile_shape=`` drives each volume through the tiled path (the
    zebrafish-scale recording driver): artifacts exist for every volume
    and the detected coordinate sets match the whole-volume driver
    (sub-RF shrink -> minor boundary-context differences allowed in
    prob, but candidate centers on this scene must agree)."""
    from t3dct.io.imageio import save_label_slices

    rng = np.random.RandomState(7)
    raw_dir = tmp_path / "raw"
    for t in range(1, 4):
        vol = np.zeros((8, 48, 48), np.float32)
        for cx, cy in ((12, 12), (12, 36), (36, 24)):
            zz, yy, xx = np.mgrid[:8, :48, :48]
            d2 = ((zz - 4) * 2.0) ** 2 + (yy - cy + t) ** 2 + \
                (xx - cx) ** 2
            vol += 40000 * np.exp(-d2 / 12.0)
        save_label_slices(vol.astype(np.uint16).transpose(1, 2, 0),
                          raw_dir, "raw_t%03i_z%04i.tif", t,
                          use_8_bit=False, compression=None)
    images_path = str(raw_dir / "raw_t%03i_z*.tif")

    # prefilter OFF for this mechanical tile-plumbing comparison: with
    # random weights prob is a noise field whose near-tie local maxima
    # flip on the sub-RF shrink margin's context differences (the
    # documented tiled caveat); a trained model's real peaks are robust
    # to that, but here we compare the raw top-k path tile-vs-whole
    model = StarDist3D(small_model.config, params=small_model.params,
                       max_candidates=64, render_box=(9, 17, 17),
                       lmax_prefilter=False)
    predict_and_save(images_path, model, tmp_path / "whole")
    predict_and_save(images_path, model, tmp_path / "tiled",
                     tile_shape=(None, 32, 32), shrink=(0, 8, 8),
                     tile_batch=2)

    for t in range(1, 4):
        cw = np.load(tmp_path / "whole" / "seg" / ("coords%06d.npy" % t))
        ct = np.load(tmp_path / "tiled" / "seg" / ("coords%06d.npy" % t))
        assert len(cw) > 0 and abs(len(ct) - len(cw)) <= 2
        # same centers (order may differ); the sub-RF shrink allows a few
        # boundary-context differences (docstring caveat), so require a
        # large-majority agreement rather than a bijection
        d = np.linalg.norm(cw[:, None] - ct[None, :], axis=2)
        assert (d.min(axis=1) <= 2.0).mean() >= 0.9
    assert (tmp_path / "tiled" / "auto_vol1").exists()
    pt = np.load(tmp_path / "tiled" / "seg" / "prob000001.npy")
    assert pt.dtype == np.float32 and pt.ndim == 3


@pytest.mark.slow
def test_nms_overlap_oracle_flip_rate():
    """Pinned NMS exactness audit (small edition of
    scripts/nms_overlap_audit.py): at the shipped sampling defaults the
    greedy-NMS keep/suppress decisions must MATCH a volume-unbiased
    supersampled oracle on a realistic anisotropic candidate cluster
    (thresh 0.3 and 0.4).  Full measured bounds: scripts/nms_audit.json."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from nms_overlap_audit import audit_scene

    for kind, seed in (("worm", 0), ("zebrafish", 2)):
        r = audit_scene(kind, n=24, seed=seed, step=0.4)
        # HARD flips (shipped decision wrong beyond the oracle's own
        # +-0.05 borderline band) must be zero — the exactness claim.
        # Borderline flips are ties within the estimators' shared error
        # band: environment-sensitive (f32 rounding across jax/XLA
        # builds flipped one between rounds) and classified by the audit
        # itself as genuinely ambiguous, so they are bounded, not pinned.
        assert r["hard_flips_at_0.3"] == 0, r
        assert r["hard_flips_at_0.4"] == 0, r
        assert r["flips_at_0.3"] + r["flips_at_0.4"] <= 1, r
        assert r["neighbor_cap_misses_gt_0.05"] == 0, r
        assert r["p95_abs_err"] < 0.12, r
