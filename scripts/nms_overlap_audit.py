"""NMS overlap exactness audit (VERDICT r3 #5).

The shipped quasi-MC overlap (``ops/nms.py``: 32 fibonacci directions x 4
cube-root radius fractions per candidate, neighbor_limit=32 with the
prob-top union) is audited against a host-side near-exact oracle:
|P_i ∩ P_j| / |P_j| evaluated on a sub-voxel grid over P_j's bounding box
with the SAME star-convex membership rule (|p - c| <= dist[nearest ray]) —
an unbiased volume quadrature, unlike the shipped estimator which weights
every direction equally (exact only for spheres; for anisotropic
polyhedra a direction subtending more volume gets proportionally
under-sampled).

Measured across realistic candidate clouds (worm-anisotropy and
isotropic zebrafish-style clusters, log-normal per-ray dist jitter):
per-pair overlap error AND the quantity that actually matters — the
suppress/keep decision flip rate of greedy NMS at thresh 0.3 / 0.4 when
fed the oracle matrix instead of the sampled one.

Run:  python scripts/nms_overlap_audit.py          (CPU, ~2-4 min)
Writes scripts/nms_audit.json; the measured bound is recorded in the
``ops/nms.py`` docstring + BASELINE.md.  The pinned regression test is
``tests/test_stardist.py::test_nms_overlap_oracle_flip_rate``.

Reference semantics audited: the C++ NMS call at
``stardist3dcustom.py:135-143`` (exact polyhedron intersection).
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                    # noqa: E402

import t3dct                                               # noqa: F401,E402
from t3dct.ops.nms import greedy_nms, overlap_matrix       # noqa: E402
from t3dct.ops.rays import rays_golden_spiral              # noqa: E402


def inside_polyhedron(pts, center, dists, rays, chunk=200_000):
    """Star-convex membership: |p-c| <= dist[nearest ray] (the same rule
    ops/nms.py and the label renderer use)."""
    out = np.empty(len(pts), bool)
    for s in range(0, len(pts), chunk):
        off = pts[s:s + chunk] - center
        d = np.linalg.norm(off, axis=-1)
        dirs = off / np.maximum(d[:, None], 1e-12)
        nearest = np.argmax(dirs @ rays.T, axis=-1)
        out[s:s + chunk] = d <= dists[nearest]
    return out


def oracle_overlap_pair(ci, di, cj, dj, rays, step):
    """|P_i ∩ P_j| / |P_j| on a step-resolution grid over P_j's bbox."""
    rj = float(dj.max())
    axes = [np.arange(c - rj, c + rj + step / 2, step) for c in cj]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    in_j = inside_polyhedron(grid, cj, dj, rays)
    pts_j = grid[in_j]
    if len(pts_j) == 0:
        return 0.0
    return float(inside_polyhedron(pts_j, ci, di, rays).mean())


def make_scene(kind, n, rng):
    """Clustered candidate cloud with log-normal per-ray dist jitter —
    the worm/zebrafish-like regime (candidates are prob-map voxels of the
    same underlying cells, so clusters of near-duplicates dominate)."""
    if kind == "worm":
        n_rays, aniso = 96, (9.2, 1.0, 1.0)
        extent = np.array([20, 120, 120])
        base_r = 7.0
    else:
        n_rays, aniso = 96, (1.0, 1.0, 1.0)
        extent = np.array([60, 90, 90])
        base_r = 6.0
    rays = rays_golden_spiral(n_rays, aniso)
    n_clusters = n // 4
    cl_centers = rng.rand(n_clusters, 3) * (extent - 24) + 12
    centers, dists, probs = [], [], []
    for i in range(n):
        c = cl_centers[i % n_clusters] + rng.randn(3) * [1.0, 2.5, 2.5]
        centers.append(np.round(c))          # candidates sit on the grid
        r = base_r * np.exp(rng.randn() * 0.15)
        dists.append(r * np.exp(rng.randn(n_rays) * 0.25))
        probs.append(rng.uniform(0.35, 0.95))
    return (np.asarray(centers, np.float32), np.asarray(dists, np.float32),
            np.asarray(rays, np.float32), np.asarray(probs, np.float32))


def audit_scene(kind, n, seed, step=0.34, threshes=(0.3, 0.4),
                n_samples=64, n_fracs=4):
    """Defaults mirror the SHIPPED ops/nms.py sampling (64x4 since
    round 4 — raised from 32x4 by exactly this audit)."""
    rng = np.random.RandomState(seed)
    centers, dists, rays, probs = make_scene(kind, n, rng)
    valid = np.ones(n, bool)

    shipped = np.asarray(overlap_matrix(
        jnp.asarray(centers), jnp.asarray(dists), jnp.asarray(rays),
        jnp.asarray(valid), n_samples=n_samples, n_fracs=n_fracs,
        prob=jnp.asarray(probs)))

    # oracle for every pair that can geometrically intersect
    r_max = dists.max(axis=1)
    oracle = np.zeros((n, n), np.float32)
    n_pairs = 0
    for i in range(n):
        for j in range(n):
            if i == j:
                oracle[i, j] = 1.0
                continue
            if np.linalg.norm(centers[i] - centers[j]) > \
                    r_max[i] + r_max[j]:
                continue
            oracle[i, j] = oracle_overlap_pair(
                centers[i], dists[i], centers[j], dists[j], rays, step)
            n_pairs += 1

    # error stats over the geometrically-interacting pairs the shipped
    # matrix also evaluated (neighbor_limit zeros the rest by design —
    # count those separately as coverage misses)
    eval_mask = ~np.eye(n, dtype=bool)
    covered = (shipped > 0) | (oracle == 0)
    errs = np.abs(shipped - oracle)[eval_mask & covered]
    miss = ((shipped == 0) & (oracle > 0.05) & eval_mask)

    out = {"scene": kind, "n_candidates": n, "oracle_pairs": n_pairs,
           "mean_abs_err": round(float(errs.mean()), 4),
           "p95_abs_err": round(float(np.percentile(errs, 95)), 4),
           "max_abs_err": round(float(errs.max()), 4),
           "neighbor_cap_misses_gt_0.05": int(miss.sum())}
    for thresh in threshes:
        def kept_with(mat, th):
            return np.asarray(greedy_nms(jnp.asarray(probs),
                                         jnp.asarray(mat),
                                         jnp.asarray(valid), th))

        kept_s = kept_with(shipped, thresh)
        kept_o = kept_with(oracle, thresh)
        out[f"flips_at_{thresh}"] = int((kept_s != kept_o).sum())
        out[f"kept_at_{thresh}"] = int(kept_o.sum())
        # borderline vs HARD flips: a greedy flip whose root pair sits
        # within the estimator's error band of the threshold cascades
        # through the kept set — such a decision is genuinely ambiguous
        # (the reference's own C++ NMS rasterizes polyhedra at 1-voxel
        # resolution, coarser than this oracle).  A flip is HARD only if
        # the shipped decision matches the oracle at NEITHER thresh-δ
        # nor thresh+δ (δ = 0.05 ≈ 2.5x the p95 overlap error).
        delta = 0.05
        kept_lo = kept_with(oracle, thresh - delta)
        kept_hi = kept_with(oracle, thresh + delta)
        hard = ((kept_s != kept_o) & (kept_s != kept_lo)
                & (kept_s != kept_hi))
        out[f"hard_flips_at_{thresh}"] = int(hard.sum())
    return out


def main():
    results = []
    for kind, n, seed in (("worm", 64, 0), ("worm", 64, 1),
                          ("zebrafish", 64, 2), ("zebrafish", 64, 3)):
        r = audit_scene(kind, n, seed)
        print(json.dumps(r))
        results.append(r)
    total_flips = sum(r[k] for r in results
                      for k in r if k.startswith("flips_"))
    total_hard = sum(r[k] for r in results
                     for k in r if k.startswith("hard_flips_"))
    summary = {"scenes": results, "total_flips": total_flips,
               "total_hard_flips": total_hard,
               "sampling": "n_samples=64, n_fracs=4, neighbor_limit=32, "
                           "r^3 volume weighting "
                           "(shipped ops/nms.py defaults, round 4)",
               "oracle": "0.34-voxel grid over P_j bbox (~25x supersampled"
                         ", volume-unbiased)"}
    (Path(__file__).parent / "nms_audit.json").write_text(
        json.dumps(summary, indent=2))
    print(f"TOTAL suppression flips vs oracle: {total_flips} "
          f"(hard, i.e. beyond the ±0.05 borderline band: {total_hard})")


if __name__ == "__main__":
    main()
