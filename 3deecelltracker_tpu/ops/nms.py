"""Star-convex polyhedron non-maximum suppression + label rendering.

Replaces the stardist C++ NMS (`stardist.nms`, reference
``stardist3dcustom.py:135-143``; SURVEY §2.2 N2) with a batched TPU
pipeline:

1. pairwise overlap matrix by quasi-Monte-Carlo: sample interior points of
   each candidate polyhedron along fibonacci directions, test membership in
   every other candidate as one big einsum (no candidate pair loop);
2. greedy suppression in probability order as a sequential ``fori_loop``
   over the (tiny) candidate count with the precomputed overlap matrix;
3. label rendering: per-instance bounding boxes rasterized with the
   nearest-ray membership test, higher-probability instances winning
   overlaps.

Overlap criterion: candidate j (lower prob) is suppressed by kept i when
(intersection volume / volume_j) > nms_thresh, evaluated by the fraction of
j's interior samples inside i — stardist's "fraction of the smaller/newer
object covered" semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rays import (polyhedron_volumes, radius_toward,
                   sample_directions_fibonacci)


def _nearest_ray_radius(dirs: jax.Array, cand_dists: jax.Array,
                        rays: jax.Array) -> jax.Array:
    """Radius of each candidate's polyhedron toward unit directions.

    dirs: (..., 3) unit directions; cand_dists: (..., n_rays) per-candidate
    ray lengths (broadcast-compatible with dirs[..., 0]).
    Returns (...,) radius along the NEAREST ray (stardist's membership
    test).  The per-element ray gather is expressed as a one-hot
    contraction so it runs on the MXU instead of as a serialized TPU
    gather (10-20 ms at ~1M elements); HIGHEST precision keeps the
    selection bit-exact (a default bf16 pass would truncate the radii).
    """
    sim = jnp.einsum("...c,rc->...r", dirs, rays)
    nearest = jnp.argmax(sim, axis=-1)
    oh = jax.nn.one_hot(nearest, rays.shape[0], dtype=jnp.float32)
    return jnp.einsum("...r,...r->...", oh, cand_dists,
                      precision=jax.lax.Precision.HIGHEST)


def _membership_fraction(points: jax.Array, centers: jax.Array,
                         dists: jax.Array, rays: jax.Array,
                         weights: jax.Array) -> jax.Array:
    """Volume fraction of each candidate covered by every candidate.

    points: (k, s, 3) interior samples of each candidate j;
    weights: (k, s) per-sample VOLUME weights (see ``overlap_matrix``).
    centers: (k, 3); dists: (k, n_rays).
    Returns (k, k): frac[i, j] = weighted fraction of j's samples inside i.

    The (i, j, s, n_rays) similarity tensor is processed in i-chunks so
    peak memory stays bounded for large candidate budgets.
    """
    k, s, _ = points.shape
    n_rays = rays.shape[0]
    # keep each chunk's (c, k, s, r) tensor under ~2^26 elements
    chunk = max(1, min(k, (1 << 26) // max(1, k * s * n_rays)))
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)),
                        constant_values=1e9)
    dists_p = jnp.pad(dists, ((0, pad), (0, 0)))
    w_norm = weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), 1e-20)       # (j, s)

    def one(args):
        c_chunk, d_chunk = args                    # (c, 3), (c, n_rays)
        off = points[None, :, :, :] - c_chunk[:, None, None, :]
        dist_p = jnp.linalg.norm(off, axis=-1)     # (c, j, s)
        dirs = off / jnp.maximum(dist_p[..., None], 1e-12)
        radius = _nearest_ray_radius(dirs, d_chunk[:, None, None, :], rays)
        inside = dist_p <= radius
        return jnp.sum(inside.astype(jnp.float32) * w_norm[None], axis=-1)

    frac = jax.lax.map(one, (centers_p.reshape(n_chunks, chunk, 3),
                             dists_p.reshape(n_chunks, chunk, n_rays)))
    return frac.reshape(-1, k)[:k]


@functools.partial(jax.jit, static_argnames=("n_samples", "n_fracs",
                                             "neighbor_limit"))
def overlap_matrix(centers: jax.Array, dists: jax.Array, rays: jax.Array,
                   valid: jax.Array, n_samples: int = 64,
                   n_fracs: int = 4,
                   neighbor_limit: int = 32,
                   prob=None) -> jax.Array:
    """(k, k) overlap[i, j] ≈ |P_i ∩ P_j| / |P_j| via quasi-MC sampling.

    ``neighbor_limit`` > 0 restricts the membership tests to each
    candidate's M NEAREST candidates — k·M instead of k² tests.  0 =
    dense.  NOTE this is a count cap, not a distance cutoff: in a
    cluster with more than M candidates the suppressing (kept) candidate
    can fall outside a far-edge candidate's M nearest, leaving
    overlap[kept, j] = 0 and greedy NMS keeping a duplicate instance.
    Passing ``prob`` closes that hole: each candidate is ALSO tested
    against the M highest-probability candidates (greedy NMS keeps in
    descending prob, so suppressors are prob-toppers) — still O(k·M).

    Samples are weighted by r_j(θ)³ — the volume subtended by each
    direction's cone — so the estimate is an unbiased volume quadrature
    for arbitrary star polyhedra (an unweighted mean is exact only for
    spheres; for realistic log-normal per-ray jitter the directional
    bias flipped greedy keep/suppress decisions near thresh 0.3/0.4).
    Accuracy vs a ~25x-supersampled volume-unbiased oracle at the
    shipped 64x4 defaults (scripts/nms_overlap_audit.py, worm +
    zebrafish candidate clusters): mean abs overlap error ~0.004,
    p95 ~0.03, and ZERO greedy keep/suppress flips at thresh 0.3/0.4
    (pinned by tests/test_stardist.py::test_nms_overlap_oracle_flip_rate;
    unweighted 32x4 — the pre-round-4 defaults — flipped decisions).
    """
    k = centers.shape[0]
    dirs = jnp.asarray(sample_directions_fibonacci(n_samples))  # (s, 3)
    # cube-root-uniform radius fractions for uniform-in-volume samples
    fr = ((np.arange(n_fracs) + 0.5) / n_fracs) ** (1.0 / 3.0)
    r = radius_toward(dists, rays, dirs)                        # (k, s)
    pts = centers[:, None, None, :] + \
        (r[:, :, None, None] * jnp.asarray(fr, jnp.float32)[None, None, :,
                                                            None]) * \
        dirs[None, :, None, :]
    pts = pts.reshape(dists.shape[0], -1, 3)                    # (k, s*f, 3)
    # per-sample volume weights: all f radial samples of one direction
    # represent equal fractions of that cone's volume ∝ r(θ)³
    w = jnp.repeat(r ** 3, n_fracs, axis=1)                     # (k, s*f)

    if neighbor_limit and neighbor_limit < k:
        m = neighbor_limit
        d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, -1)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        _, nbr = jax.lax.top_k(-d2, m)                   # (j, m) candidates i
        if prob is not None:
            # union with the global prob-top-m (same set for every j)
            _, strong = jax.lax.top_k(jnp.where(valid, prob, -jnp.inf), m)
            nbr = jnp.concatenate(
                [nbr, jnp.broadcast_to(strong[None, :], (k, m))], axis=1)
        mm = nbr.shape[1]
        cen_n = centers[nbr]                              # (j, mm, 3)
        dst_n = dists[nbr]                                # (j, mm, n_rays)
        off = pts[:, None, :, :] - cen_n[:, :, None, :]   # (j, mm, s, 3)
        dist_p = jnp.linalg.norm(off, axis=-1)
        drs = off / jnp.maximum(dist_p[..., None], 1e-12)
        radius = _nearest_ray_radius(drs, dst_n[:, :, None, :], rays)
        w_norm = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True),
                                 1e-20)                   # (j, s)
        frac_jm = jnp.sum((dist_p <= radius).astype(jnp.float32)
                          * w_norm[:, None, :], axis=-1)
        jj = jnp.broadcast_to(jnp.arange(k)[:, None], (k, mm))
        frac = jnp.zeros((k, k), jnp.float32).at[
            nbr.reshape(-1), jj.reshape(-1)].set(frac_jm.reshape(-1))
    else:
        frac = _membership_fraction(pts, centers, dists, rays, w)
    frac = jnp.where(valid[:, None] & valid[None, :], frac, 0.0)
    return frac


@jax.jit
def greedy_nms(prob: jax.Array, overlap: jax.Array, valid: jax.Array,
               nms_thresh: float = 0.3) -> jax.Array:
    """Sequential greedy NMS; returns kept mask.

    Candidates are visited in descending prob; one is kept unless some
    already-kept candidate covers more than ``nms_thresh`` of it.
    """
    k = prob.shape[0]
    order = jnp.argsort(-jnp.where(valid, prob, -jnp.inf))

    def body(step, kept):
        i = order[step]
        covered = jnp.max(jnp.where(kept, overlap[:, i], 0.0))
        keep_i = valid[i] & (covered <= nms_thresh)
        return kept.at[i].set(keep_i)

    kept0 = jnp.zeros((k,), bool)
    return jax.lax.fori_loop(0, k, body, kept0)


@functools.partial(jax.jit, static_argnames=("box", "image_shape"))
def render_polyhedra_labels(centers: jax.Array, dists: jax.Array,
                            rays: jax.Array, prob: jax.Array,
                            kept: jax.Array,
                            image_shape: Tuple[int, int, int],
                            box: Tuple[int, int, int]) -> jax.Array:
    """Rasterize kept polyhedra into an int32 label image (z, y, x).

    Instance ids follow descending probability among kept candidates
    (stardist's ``_instances_from_prediction`` id convention); where two
    instances overlap the higher-probability one wins.
    ``box``: static per-instance bounding box (>= 2*max radius + 1).

    TPU design: candidate centers are integer grid positions (stardist's
    candidates are prob-map voxels, ``stardist3dcustom.py:233``), so the
    box-voxel -> nearest-ray map is CONSTANT across candidates.  It is
    computed once; the per-candidate radius lookup becomes one MXU one-hot
    matmul batched over ALL candidates, and the sequential pass only
    pastes precomputed masks (ascending probability, so later = higher
    prob wins without a best-prob canvas).  Non-integer centers are
    rendered about ``round(center)`` (sub-voxel boundary shift < 1 voxel).
    """
    k = centers.shape[0]
    bz, by, bx = box
    order = jnp.argsort(-jnp.where(kept, prob, -jnp.inf))
    # rank[c] = instance id (1-based) of candidate c if kept
    ranks = jnp.zeros((k,), jnp.int32).at[order].set(
        jnp.arange(1, k + 1, dtype=jnp.int32))

    half = jnp.asarray([(bz - 1) / 2.0, (by - 1) / 2.0, (bx - 1) / 2.0],
                       jnp.float32)
    zz = jax.lax.broadcasted_iota(jnp.float32, box, 0) - half[0]
    yy = jax.lax.broadcasted_iota(jnp.float32, box, 1) - half[1]
    xx = jax.lax.broadcasted_iota(jnp.float32, box, 2) - half[2]
    off = jnp.stack([zz, yy, xx], axis=-1)               # (box, 3)
    d = jnp.linalg.norm(off, axis=-1)
    dirs = off / jnp.maximum(d[..., None], 1e-12)
    sim = jnp.einsum("zyxc,rc->zyxr", dirs, rays)
    nearest = jnp.argmax(sim, axis=-1)                   # (box,)
    oh = jax.nn.one_hot(nearest.reshape(-1), rays.shape[0],
                        dtype=jnp.float32)               # (V, n_rays)

    # candidates in ascending-probability paste order; the radius lookups
    # run as one MXU matmul per CHUNK of candidates, bounding the (V, C)
    # buffer (a full (V, k) matrix is ~570 MB at the class defaults
    # k=1024, box=(33,65,65))
    order_asc = order[::-1]
    CHUNK = min(k, 64)
    n_chunks = -(-k // CHUNK)
    kp = n_chunks * CHUNK
    dists_ord = jnp.pad(dists[order_asc], ((0, kp - k), (0, 0)))
    centers_ord = jnp.pad(centers[order_asc], ((0, kp - k), (0, 0)))
    ranks_ord = jnp.pad(ranks[order_asc], (0, kp - k))
    kept_ord = jnp.pad(kept[order_asc], (0, kp - k))  # pad: never pasted

    pad = (bz, by, bx)
    canvas_shape = tuple(s + 2 * p for s, p in zip(image_shape, pad))
    labels0 = jnp.zeros(canvas_shape, jnp.int32)
    d_flat = d.reshape(-1)

    def chunk_body(ci, labels):
        base = ci * CHUNK
        dch = jax.lax.dynamic_slice(dists_ord, (base, 0),
                                    (CHUNK, dists.shape[1]))
        # HIGHEST: the bf16 default would truncate radii and flip boundary
        # voxels vs the per-candidate gather
        radius = jnp.dot(oh, dch.T,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)    # (V, C)
        kch = jax.lax.dynamic_slice(kept_ord, (base,), (CHUNK,))
        inside = ((d_flat[:, None] <= radius) & kch[None, :]).T  # (C, V)

        def body(i, labels):
            c = base + i
            corner = jnp.round(centers_ord[c] - half).astype(jnp.int32) + \
                jnp.asarray(pad, jnp.int32)
            corner = jnp.clip(corner, 0, jnp.asarray(
                [cs - b for cs, b in zip(canvas_shape, box)], jnp.int32))
            patch = jax.lax.dynamic_slice(labels, corner, box)
            patch = jnp.where(inside[i].reshape(box), ranks_ord[c], patch)
            return jax.lax.dynamic_update_slice(labels, patch, corner)

        return jax.lax.fori_loop(0, CHUNK, body, labels)

    labels = jax.lax.fori_loop(0, n_chunks, chunk_body, labels0)
    sl = tuple(slice(p, p + s) for p, s in zip(pad, image_shape))
    return labels[sl]
