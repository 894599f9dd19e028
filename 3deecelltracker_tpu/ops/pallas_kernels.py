"""Pallas TPU kernels for iterative label propagation.

The XLA formulations of connected components and watershed flooding
(ops/connected.py, ops/watershed.py) re-materialize the full volume in HBM
every relaxation round (6+ shifted copies, compare, reduce) — each round
costs ~8-35 ms at worm scale even though the math is trivial.  These
kernels keep the state resident in VMEM and run the whole fixed-point loop
inside ONE kernel launch: per round only VMEM traffic, zero HBM round
trips.

- ``cc_propagate``: hook-only connected-components min-propagation
  (full box connectivity via separable +-1 min passes) with on-chip
  convergence check.
- ``flood_slices``: per-z-slice minimax watershed flooding (4-neighborhood,
  lexicographic (cost, hops) tie-break), gridded over slices.

Both fall back to the XLA implementations when the arrays exceed the VMEM
budget; on CPU backends the kernels run in interpreter mode (tests).

Status (measured on v5e, worm1-scale (168, 401, 24) volumes): the
whole-volume CC kernel exceeds the 16 MB VMEM budget (padded int32 buffers
x while-loop carries ~23 MB), and the per-slice flood kernel LOSES to the
z-vectorized XLA flood (the pallas grid runs slices sequentially on the
core, forfeiting the lockstep z-parallelism: 470 ms vs 366 ms).  The
production paths therefore use the XLA formulations — with the
reduce_window erosion hook and batched convergence checks this round
contributed to ops/connected.py — and these kernels remain available for
small-volume workloads and as the starting point for a halo-tiled revision.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_BIG = np.iinfo(np.int32).max
_INF = 3e38  # python scalar: pallas kernels cannot capture traced consts

# VMEM budget for the whole-volume CC kernel (int32 labels + int8 mask +
# round-trip temporaries); stay well under the ~16 MB/core VMEM.
CC_MAX_VOXELS = 2_500_000


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift_inside(x, axis: int, delta: int, fill):
    """Non-wrapping shift inside the kernel: y[v] = x[v + delta] on axis."""
    size = x.shape[axis]
    rolled = jnp.roll(x, -delta, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if delta > 0:
        invalid = idx >= size - delta
    else:
        invalid = idx < -delta
    return jnp.where(invalid, fill, rolled)


def _cc_kernel(max_iters: int, init_ref, out_ref):
    labels0 = init_ref[:]
    fg = labels0 != _BIG

    def hook(labels):
        best = labels
        for axis in range(labels.ndim):
            best = jnp.minimum(
                best, jnp.minimum(_shift_inside(best, axis, 1, _BIG),
                                  _shift_inside(best, axis, -1, _BIG)))
        return jnp.where(fg, best, _BIG)

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    def body(carry):
        labels, _, it = carry
        new = hook(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = labels


@functools.partial(jax.jit, static_argnames=("max_iters",))
def cc_propagate(init_labels: jax.Array, max_iters: int = 512) -> jax.Array:
    """Min-propagate initial labels (bg must be int32 max) to component
    roots; full box connectivity.  Whole volume stays in VMEM.

    Axes are reordered smallest-first before the call: VMEM tiles pad the
    last two dims to (8, 128), so the two LARGEST axes must sit last to
    avoid blowing the on-chip budget (e.g. a (168, 401, 24) worm volume is
    processed as (24, 168, 401))."""
    order = tuple(int(a) for a in np.argsort(init_labels.shape))
    inv = tuple(int(a) for a in np.argsort(order))
    x = jnp.transpose(init_labels.astype(jnp.int32), order)
    kern = functools.partial(_cc_kernel, max_iters)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        interpret=_interpret(),
    )(x)
    return jnp.transpose(out, inv)


def _flood_kernel(max_iters: int, elev_ref, markers_ref, mask_ref, out_ref):
    """One z-slice: minimax flooding with (cost, hops) lexicographic order."""
    elev = elev_ref[:]
    markers = markers_ref[:]
    m = mask_ref[:] != 0
    is_marker = (markers > 0) & m
    lab0 = jnp.where(is_marker, markers, 0)
    cost0 = jnp.where(is_marker, elev, _INF)
    hops0 = jnp.where(is_marker, 0.0, _INF)

    # blocks are (1, x, y); the 4-neighborhood lives on axes 1 and 2.
    # order matches ops.neighborhood.neighbor_offsets(2, 1) so cost/hops
    # ties resolve to the same winner as the XLA flood
    shifts = [(1, -1), (2, -1), (2, 1), (1, 1)]

    def body(carry):
        lab, cost, hops, _, it = carry
        best_lab, best_cost, best_hops = lab, cost, hops
        for axis, d in shifts:
            n_lab = _shift_inside(lab, axis, d, 0)
            n_cost = _shift_inside(cost, axis, d, _INF)
            n_hops = _shift_inside(hops, axis, d, _INF)
            cand_cost = jnp.maximum(n_cost, elev)
            cand_hops = n_hops + 1.0
            better = (n_lab > 0) & (
                (cand_cost < best_cost)
                | ((cand_cost == best_cost) & (cand_hops < best_hops)))
            best_lab = jnp.where(better, n_lab, best_lab)
            best_hops = jnp.where(better, cand_hops, best_hops)
            best_cost = jnp.where(better, cand_cost, best_cost)
        upd = m & ~is_marker
        new_lab = jnp.where(upd, best_lab, lab)
        new_cost = jnp.where(upd, best_cost, cost)
        new_hops = jnp.where(upd, best_hops, hops)
        # hops participate in convergence (same reasoning as
        # ops/watershed.py watershed_flood): a hops-only wave can still
        # flip a plateau-boundary label rounds later
        changed = jnp.any((new_lab != lab) | (new_cost != cost)
                          | (new_hops != hops))
        return new_lab, new_cost, new_hops, changed, it + 1

    def cond(carry):
        return carry[3] & (carry[4] < max_iters)

    lab, _, _, _, _ = jax.lax.while_loop(
        cond, body, (lab0, cost0, hops0, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = jnp.where(m, lab, 0)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def flood_slices(elevation: jax.Array, markers: jax.Array, mask: jax.Array,
                 max_iters: int = 512) -> jax.Array:
    """Per-slice 2-D watershed flood over a (x, y, z) stack: the grid runs
    over z, each program floods one slice entirely in VMEM.

    Internally the stack is processed as (z, x, y) blocks of shape
    (1, x, y) so the VMEM tiling pads the slice dims, not a length-1 z."""
    x, y, z = elevation.shape
    spec = pl.BlockSpec((1, x, y), lambda k: (k, 0, 0))
    kern = functools.partial(_flood_kernel, max_iters)
    out = pl.pallas_call(
        kern,
        grid=(z,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((z, x, y), jnp.int32),
        interpret=_interpret(),
    )(jnp.transpose(elevation.astype(jnp.float32), (2, 0, 1)),
      jnp.transpose(markers.astype(jnp.int32), (2, 0, 1)),
      jnp.transpose(mask.astype(jnp.int32), (2, 0, 1)))
    return jnp.transpose(out, (1, 2, 0))
