"""Benchmark harness: end-to-end (segmentation + tracking) throughput on
real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): 3-D volumes/sec for the full per-volume
pipeline at worm1 demo scale (SURVEY §6): complete StarDist3D instance
segmentation (backbone, sparse gather, polyhedron NMS, label rendering) on a
(168, 401) x 24-slice raw volume (z_xy_ratio 9.2 — the (168,401,128)-class
extent in BASELINE.md counts interpolated slices), FFN + PR-GLS tracking of
~150 cells, and the accurate-correction loop.  The reference publishes no
absolute numbers; vs_baseline uses the driver-set estimate of the
RTX-3080Ti TF pipeline at ~0.2 vol/s end-to-end (GPU inference + host NumPy
tracking), so vs_baseline = value / 0.2.

Timing: iterations are queued back-to-back on device and synchronized with
one final scalar fetch (block_until_ready is unreliable through the remote
TPU tunnel).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np
import jax
import jax.numpy as jnp

from t3dct.utils.cache import enable_compilation_cache

enable_compilation_cache()

VOL_XYZ = (168, 401, 128)        # worm1-class (x, y, z), SURVEY §6
N_CELLS = 150
MAX_CELLS = 192
REFERENCE_VOLS_PER_SEC = 0.2     # estimated TF/3080Ti end-to-end


def _timeit(fn, n_iters=5):
    out = fn()
    _ = float(jax.device_get(jnp.sum(out)))   # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn()
    _ = float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / n_iters


def bench_stardist_seg():
    """Full instance segmentation: backbone + sparse gather + polyhedron
    NMS + label rendering (the complete per-volume device pipeline)."""
    from t3dct.config import StarDistConfig
    from t3dct.engine.stardist import StarDist3D

    cfg = StarDistConfig(n_rays=96, grid=(1, 2, 2),
                         anisotropy=(9.2, 1.0, 1.0))
    # render box sized to worm cells (z thin at anisotropy 9.2; xy radius
    # <= 16) — the box is the user's size knob, like stardist's bbox
    model = StarDist3D(cfg, max_candidates=256, render_box=(9, 33, 33))
    # model frame is (z, y, x); worm z-slices ~ VOL_XYZ[2]/grid physical
    z, y, x = 24, VOL_XYZ[1], VOL_XYZ[0]
    vol = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (z, y, x),
                                        jnp.float32))

    def run():
        out = model._predict_instances_device(vol)
        return out[5]  # labels

    return _timeit(run)


def bench_track_step():
    """FFN scoring + matching + PR-GLS at worm scale.

    A randomly initialized FFN produces garbage matches that keep the EM
    at its 2000-iteration cap — never the production behavior (the
    reference converges at ~1e-3 within tens of iterations on real data,
    trackerlite.py:301-304).  So scoring/matching are timed with the raw
    net and the EM with a production-like prior (correct correspondences,
    smooth deformation).
    """
    from t3dct.engine.tracker import track_step
    from t3dct.models.ffn import FFN, ffn_pair_scores
    from t3dct.ops.knn import knn_feature_vectors
    from t3dct.ops.matching import simple_match
    from t3dct.ops.pointset import normalize_points
    from t3dct.ops.prgls import prgls_with_two_ref

    params, state = FFN().init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    pts1 = np.full((MAX_CELLS, 3), 1e6, np.float32)
    pts2 = np.full((MAX_CELLS, 3), 1e6, np.float32)
    base = rng.rand(N_CELLS, 3).astype(np.float32) * \
        np.asarray([168, 401, 128 * 9.2], np.float32)
    # smooth deformation + permutation, like a real volume pair
    moved = base + 3.0 * np.sin(base[:, [1, 2, 0]] / 40.0).astype(np.float32)
    perm = rng.permutation(N_CELLS)
    pts1[:N_CELLS] = base
    pts2[:N_CELLS] = moved[perm]
    mask = np.arange(MAX_CELLS) < N_CELLS
    m = jnp.asarray(mask)
    p1, p2 = jnp.asarray(pts1), jnp.asarray(pts2)
    confirmed = jnp.asarray(base)

    # stage 1: normalize + features + all-pairs scores + greedy match
    @jax.jit
    def score_and_match(params, state, confirmed, p1, p2):
        _, (mean, scale) = normalize_points(confirmed)
        t1n = (p1 - mean) / scale
        t2n = (p2 - mean) / scale
        f1 = knn_feature_vectors(t1n, m, 20)
        f2 = knn_feature_vectors(t2n, m, 20)
        scores = ffn_pair_scores(params, state, f1, f2)
        prior, _ = simple_match(scores, 0.1, ref_mask=m, tgt_mask=m)
        return prior, t1n, t2n, mean, scale

    t_score = _timeit(lambda: score_and_match(params, state, confirmed,
                                              p1, p2)[0])

    # stage 2: PR-GLS with a correct-correspondence prior
    prior = np.zeros((MAX_CELLS, MAX_CELLS), np.float32)
    prior[:N_CELLS, :N_CELLS] = 0.1 / (N_CELLS - 1)
    for new_i, old_i in enumerate(perm):
        prior[new_i, old_i] = 0.9
    _, t1n, t2n, mean, scale = score_and_match(params, state, confirmed,
                                               p1, p2)
    cn = (confirmed - mean) / scale
    prior_j = jnp.asarray(prior)

    @jax.jit
    def em(prior_j, t1n, t2n, cn):
        return prgls_with_two_ref(prior_j, t2n, t1n, cn, beta=3.0,
                                  lambda_=3.0, tgt_mask=m,
                                  ref_mask=m).tracked

    t_em = _timeit(lambda: em(prior_j, t1n, t2n, cn))
    return t_score + t_em


def bench_correction():
    from t3dct.engine.correction import accurate_correction_loop
    from t3dct.ops.subregions import build_subregion_atlas

    rng = np.random.RandomState(1)
    x, y, z = 168, 401, 24     # interp factor handles the z stretch
    lab = np.zeros((x, y, z), np.int32)
    centers = np.stack([rng.randint(8, x - 8, N_CELLS),
                        rng.randint(8, y - 8, N_CELLS),
                        rng.randint(3, z - 3, N_CELLS)], 1)
    for i, (cx, cy, cz) in enumerate(centers):
        lab[cx - 3:cx + 3, cy - 3:cy + 3, cz - 1:cz + 2] = i + 1
    atlas = build_subregion_atlas(jnp.asarray(lab), n_cells=N_CELLS,
                                  box_shape=(8, 8, 4),
                                  interpolation_factor=5)
    # realistic probability map: mass concentrated at the cells, so the
    # correction converges like production data instead of hitting the cap
    prob_np = rng.rand(x, y, z).astype(np.float32) * 0.05
    prob_np += (lab > 0) * 0.9
    prob = jnp.asarray(prob_np)
    vol1 = jnp.asarray(centers.astype(np.float32))
    start = vol1 + jnp.asarray(rng.randn(N_CELLS, 3).astype(np.float32))
    boundary = jnp.zeros(N_CELLS, bool)

    def run():
        coords, labels, overlap, it = accurate_correction_loop(
            atlas, vol1, start, prob, boundary, max_repetition=20)
        return coords

    return _timeit(run)


def main():
    t_seg = bench_stardist_seg()
    t_track = bench_track_step()
    t_corr = bench_correction()
    total = t_seg + t_track + t_corr
    vols_per_sec = 1.0 / total
    print(json.dumps({
        "metric": "e2e_seg_track_volumes_per_sec",
        "value": round(vols_per_sec, 4),
        "unit": (f"volumes/sec worm1-scale (StarDist {t_seg * 1e3:.0f}ms + "
                 f"track {t_track * 1e3:.0f}ms + "
                 f"correction {t_corr * 1e3:.0f}ms)"),
        "vs_baseline": round(vols_per_sec / REFERENCE_VOLS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
