"""StarDist training targets: per-voxel ray distances + EDT-based object
probabilities.

Replaces the stardist C++ ``star_dist3D`` and ``edt_prob`` ground-truth
kernels (SURVEY §2.2 N2) with device code:

- ``star_dist3d``: for every foreground voxel, the distance along each ray
  until the label changes, computed by unit-step ray marching with a
  ``lax.scan`` over steps (nearest-voxel sampling — the same quantization
  the C++ stepping uses).
- ``edt_prob``: distance to the nearest different-label/background voxel
  (via EDT whose zero set is background plus inter-label boundary voxels),
  normalized per object by its maximum — each cell peaks at 1 at its core.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .edt import distance_transform_edt
from .neighborhood import neighbor_offsets, shift


@functools.partial(jax.jit, static_argnames=("max_dist", "ray_chunk"))
def star_dist3d(labels: jax.Array, rays: jax.Array, max_dist: int = 32,
                ray_chunk: int = 16) -> jax.Array:
    """(z, y, x) int labels -> (z, y, x, n_rays) float32 distances.

    Background voxels get 0.  A ray that never exits within ``max_dist``
    steps is truncated at ``max_dist`` (stardist clips similarly).
    """
    shape = labels.shape
    zz = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    fg = labels > 0
    n_rays = rays.shape[0]
    pad = (-n_rays) % ray_chunk
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))

    def sample_labels(pz, py, px):
        iz = jnp.clip(jnp.round(pz), 0, shape[0] - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.round(py), 0, shape[1] - 1).astype(jnp.int32)
        ix = jnp.clip(jnp.round(px), 0, shape[2] - 1).astype(jnp.int32)
        inb = ((jnp.round(pz) >= 0) & (jnp.round(pz) <= shape[0] - 1)
               & (jnp.round(py) >= 0) & (jnp.round(py) <= shape[1] - 1)
               & (jnp.round(px) >= 0) & (jnp.round(px) <= shape[2] - 1))
        lab = labels[iz, iy, ix]
        return jnp.where(inb, lab, 0)

    def one_chunk(ray_block):
        # ray_block: (c, 3)
        def step(carry, t):
            dist, alive = carry
            tt = t.astype(jnp.float32)
            pz = zz[None] + ray_block[:, 0, None, None, None] * tt
            py = yy[None] + ray_block[:, 1, None, None, None] * tt
            px = xx[None] + ray_block[:, 2, None, None, None] * tt
            lab_here = sample_labels(pz, py, px)
            alive = alive & (lab_here == labels[None]) & fg[None]
            dist = dist + alive.astype(jnp.float32)
            return (dist, alive), None

        c = ray_block.shape[0]
        dist0 = jnp.zeros((c,) + shape, jnp.float32)
        alive0 = jnp.broadcast_to(fg[None], (c,) + shape)
        (dist, _), _ = jax.lax.scan(step, (dist0, alive0),
                                    jnp.arange(1, max_dist + 1))
        return dist

    chunks = rays_p.reshape(-1, ray_chunk, 3)
    dists = jax.lax.map(one_chunk, chunks)          # (nc, c, z, y, x)
    dists = dists.reshape(-1, *shape)[:n_rays]
    return jnp.moveaxis(dists, 0, -1)


@functools.partial(jax.jit, static_argnames=("max_labels", "anisotropy",
                                             "window"))
def edt_prob(labels: jax.Array, max_labels: int = 1024,
             anisotropy: Tuple[float, float, float] = (1.0, 1.0, 1.0),
             window: int = None) -> jax.Array:
    """Per-object EDT normalized to max 1 (stardist ``edt_prob``).

    ``window``: search radius in voxels for the EDT passes (exact whenever
    every cell radius is below it).  Set it for zebrafish-scale training
    volumes — O(L*window) per line instead of O(L^2)."""
    # zero set: background + voxels touching a different label
    offsets = neighbor_offsets(labels.ndim, 1)
    diff_neighbor = jnp.zeros(labels.shape, bool)
    for off in offsets:
        n = shift(labels, off, 0)
        diff_neighbor |= (n != labels)
    interior = (labels > 0) & ~diff_neighbor
    d = distance_transform_edt(interior, anisotropy, window=window) + \
        (labels > 0).astype(jnp.float32)  # boundary voxels get ~1
    seg = jnp.clip(labels.reshape(-1), 0, max_labels)
    per_max = jnp.zeros((max_labels + 1,), jnp.float32).at[seg].max(
        d.reshape(-1))
    norm = per_max[jnp.clip(labels, 0, max_labels)]
    prob = jnp.where(labels > 0, d / jnp.maximum(norm, 1e-6), 0.0)
    return prob
