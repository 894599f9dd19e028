"""Exact Euclidean distance transform (EDT).

Replaces ``scipy.ndimage.distance_transform_edt``
(reference ``watershed.py:39,90,145``) with a TPU-friendly exact algorithm.

The squared EDT is separable: one pass per axis computes
``D'[i] = min_j (D[j] + w^2 (i-j)^2)``.  Instead of the sequential
lower-envelope scan (Felzenszwalb-Huttenlocher), each pass is evaluated as a
dense min-plus reduction over the whole line — O(L) work per output element,
but fully parallel, branch-free VPU math that XLA tiles well.  For microscopy
volumes (L ≤ ~512) this is far faster on TPU than any scan-based form.

Memory is bounded by chunking lines so the (chunk, L, L) broadcast stays
within a fixed budget.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e20
_CHUNK_ELEMS = 1 << 22  # ~16 MB of f32 broadcast per chunk


def _minplus_pass(fsq: jax.Array, axis: int, w: float) -> jax.Array:
    """One separable pass: fsq'[..., i] = min_j fsq[..., j] + (w(i-j))^2."""
    ndim = fsq.ndim
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    x = jnp.transpose(fsq, perm)
    batch_shape = x.shape[:-1]
    L = x.shape[-1]
    flat = x.reshape(-1, L)
    B = flat.shape[0]

    ii = np.arange(L, dtype=np.float32)
    cost = ((ii[:, None] - ii[None, :]) * np.float32(w)) ** 2  # (i, j)
    cost_j = jnp.asarray(cost)

    chunk = max(1, _CHUNK_ELEMS // max(1, L * L))
    n_chunks = -(-B // chunk)
    pad = n_chunks * chunk - B
    flat_p = jnp.pad(flat, ((0, pad), (0, 0)), constant_values=_INF)

    def one(chunk_rows):
        # (c, 1, j) + (i, j) -> min over j -> (c, i)
        return jnp.min(chunk_rows[:, None, :] + cost_j[None, :, :], axis=-1)

    out = jax.lax.map(one, flat_p.reshape(n_chunks, chunk, L))
    out = out.reshape(-1, L)[:B].reshape(batch_shape + (L,))
    return jnp.transpose(out, inv_perm)


def _minplus_pass_windowed(fsq: jax.Array, axis: int, w: float,
                           W: int) -> jax.Array:
    """Windowed pass: fsq'[..., i] = min_{|d| <= W} fsq[..., i+d] + (w d)^2.

    O(L*W) shifted adds instead of the dense O(L^2) broadcast — the
    zebrafish-scale form (xy >= 1024 lines): a scan over the 2W+1 offsets
    keeps peak memory at 2 line-buffers and every step is a full-width VPU
    min, so XLA pipelines it without the (chunk, L, L) cost matrix."""
    ndim = fsq.ndim
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    x = jnp.transpose(fsq, perm)
    batch_shape = x.shape[:-1]
    L = x.shape[-1]
    W = min(int(W), L - 1)
    flat = x.reshape(-1, L)
    xp = jnp.pad(flat, ((0, 0), (W, W)), constant_values=_INF)
    costs = jnp.asarray((np.arange(-W, W + 1, dtype=np.float32)
                         * np.float32(w)) ** 2)

    def step(best, k):
        shifted = jax.lax.dynamic_slice_in_dim(xp, k, L, axis=1)
        return jnp.minimum(best, shifted + costs[k]), None

    init = flat + costs[W]                      # d = 0 term
    out, _ = jax.lax.scan(step, init, jnp.arange(2 * W + 1))
    out = out.reshape(batch_shape + (L,))
    return jnp.transpose(out, inv_perm)


def _binary_pass_scan(mask: jax.Array, axis: int, w: float) -> jax.Array:
    """First separable pass directly from the BINARY mask in O(L log L)
    fully-parallel work: fsq[i] = (w * distance to nearest zero along the
    line)^2, via two cumulative-max scans of the last-seen-zero index
    (no (i, j) broadcast at all — the preferred first pass at any L)."""
    ndim = mask.ndim
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    x = jnp.transpose(mask != 0, perm)
    L = x.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    big = jnp.int32(2 * L)
    # last zero at-or-before i / first zero at-or-after i
    zero_at = jnp.where(x, jnp.int32(-1), idx)
    left = jax.lax.cummax(zero_at, axis=ndim - 1)
    zero_at_r = jnp.where(x, big, idx)
    right = jax.lax.cummin(zero_at_r, axis=ndim - 1, reverse=True)
    d = jnp.minimum(jnp.where(left < 0, big, idx - left),
                    jnp.where(right >= big, big, right - idx))
    fsq = jnp.where(x, (d.astype(jnp.float32) * np.float32(w)) ** 2,
                    0.0)
    fsq = jnp.where(fsq > _INF / 2, _INF, fsq)
    # a line with no zero at all: distance saturates at _INF (matches the
    # dense pass's 0/_INF init propagated through min-plus)
    fsq = jnp.where(x & (left < 0) & (right >= big), _INF, fsq)
    return jnp.transpose(fsq, inv_perm)


_ENV_BIG = 1e9   # default finite "infinity" for the envelope pass; the
                 # caller passes an adaptive cap when the achievable d^2
                 # bound (sum over axes of (L_i*w_i)^2) approaches it —
                 # a fixed 1e9 silently clamped genuinely large finite
                 # distances (L*w > ~22k, e.g. huge volumes or coarse
                 # physical sampling) that the dense pass handles


def _minplus_pass_envelope(fsq: jax.Array, axis: int, w: float,
                           env_big: float = _ENV_BIG) -> jax.Array:
    """Exact lower-envelope (Felzenszwalb-Huttenlocher) pass: O(L)
    amortized work per line instead of the dense O(L^2) broadcast
    (VERDICT r2 #6; the reference leans on scipy's C implementation,
    ``watershed.py:39/90/145``).

    The sequential hull build/query runs as ``lax.scan`` over line
    positions with ALL lines advancing in lockstep (state (B,)/(B, L));
    the amortized pop/advance loops are masked ``while_loop``s.  Work is
    O(B) wide per step — VPU-friendly — but the 2L sequential steps make
    this latency-bound on accelerators; it wins over the dense pass when
    B*L^2 compute dwarfs ~2L small-kernel latencies (large L, many
    lines).  Correctness does not depend on the trade-off; parity vs
    scipy is tested at L=1024."""
    ndim = fsq.ndim
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv_perm = np.argsort(perm)
    x = jnp.transpose(fsq, perm)
    batch_shape = x.shape[:-1]
    L = x.shape[-1]
    env_big = np.float32(env_big)
    f = jnp.minimum(x.reshape(-1, L), env_big)
    B = f.shape[0]
    w2 = np.float32(w * w)
    rows = jnp.arange(B)
    iota = jnp.arange(L, dtype=jnp.float32)
    fq_plus = f + w2 * iota[None, :] ** 2          # f[q] + (w q)^2

    def intersect(q, vk):
        """Abscissa where parabola q overtakes parabola vk."""
        num = jnp.take_along_axis(fq_plus, q[:, None], 1)[:, 0] - \
            jnp.take_along_axis(fq_plus, vk[:, None], 1)[:, 0]
        den = 2.0 * w2 * (q - vk).astype(jnp.float32)
        return num / den

    def build_step(carry, q):
        k, v, z = carry
        qv = jnp.full((B,), q, jnp.int32)

        def pop_cond(state):
            k, _ = state
            vk = jnp.take_along_axis(v, k[:, None], 1)[:, 0]
            zk = jnp.take_along_axis(z, k[:, None], 1)[:, 0]
            s = intersect(qv, vk)
            return jnp.any((k > 0) & (s <= zk))

        def pop_body(state):
            k, _ = state
            vk = jnp.take_along_axis(v, k[:, None], 1)[:, 0]
            zk = jnp.take_along_axis(z, k[:, None], 1)[:, 0]
            s = intersect(qv, vk)
            k = jnp.where((k > 0) & (s <= zk), k - 1, k)
            return k, s

        k, _ = jax.lax.while_loop(pop_cond, pop_body,
                                  (k, jnp.zeros((B,), jnp.float32)))
        vk = jnp.take_along_axis(v, k[:, None], 1)[:, 0]
        s = intersect(qv, vk)
        k = k + 1
        v = v.at[rows, k].set(q)
        z = z.at[rows, k].set(s)
        return (k, v, z), None

    k0 = jnp.zeros((B,), jnp.int32)
    v0 = jnp.zeros((B, L), jnp.int32)
    z0 = jnp.full((B, L), -jnp.inf, jnp.float32)
    (k_top, v, z), _ = jax.lax.scan(build_step, (k0, v0, z0),
                                    jnp.arange(1, L, dtype=jnp.int32))

    def query_step(j, i):
        def adv_cond(j):
            znext = jnp.take_along_axis(
                z, jnp.minimum(j + 1, L - 1)[:, None], 1)[:, 0]
            return jnp.any((j < k_top) & (znext < i))

        def adv_body(j):
            znext = jnp.take_along_axis(
                z, jnp.minimum(j + 1, L - 1)[:, None], 1)[:, 0]
            return jnp.where((j < k_top) & (znext < i), j + 1, j)

        j = jax.lax.while_loop(adv_cond, adv_body, j)
        vj = jnp.take_along_axis(v, j[:, None], 1)[:, 0]
        fv = jnp.take_along_axis(f, vj[:, None], 1)[:, 0]
        out_i = w2 * (i - vj.astype(jnp.float32)) ** 2 + fv
        return j, out_i

    _, out_cols = jax.lax.scan(query_step, jnp.zeros((B,), jnp.int32),
                               jnp.arange(L, dtype=jnp.float32))
    out = out_cols.T.reshape(batch_shape + (L,))
    out = jnp.where(out > env_big / 2, _INF, out)
    return jnp.transpose(out, inv_perm)


@functools.partial(jax.jit, static_argnames=("sampling", "window",
                                             "method"))
def distance_transform_edt(mask: jax.Array,
                           sampling: Union[None, Tuple[float, ...]] = None,
                           window: Optional[int] = None,
                           method: str = "dense") -> jax.Array:
    """Exact EDT: distance from each nonzero voxel to the nearest zero voxel.

    ``sampling`` gives the physical spacing per axis
    (scipy.ndimage.distance_transform_edt semantics).

    The first separable pass always runs straight off the binary mask via
    cumulative index scans (O(L log L) parallel, no broadcast).
    Subsequent general min-plus passes are selected by ``method``:

    - ``"dense"``: O(L^2) broadcast per line — branch-free VPU math, the
      fastest form at microscopy L <= ~512;
    - ``"envelope"``: exact O(L) Felzenszwalb-Huttenlocher scan — the
      asymptotically right form for very long lines (xy >= 1024).

    ``window``: optional per-axis search radius in VOXELS, O(L*W) work;
    exact wherever the true distance is below ``window * min(sampling)``
    (e.g. inside bounded-radius cells — the ``edt_prob`` training-GT
    case); beyond that distances saturate.  Overrides ``method``.
    """
    if sampling is None:
        sampling = (1.0,) * mask.ndim
    sampling = tuple(float(s) for s in sampling)
    if len(sampling) != mask.ndim:
        raise ValueError("sampling must have one entry per axis")
    if method not in ("dense", "envelope"):
        raise ValueError(f"method {method!r}")
    fsq = None
    for axis, w in enumerate(sampling):
        if fsq is None:
            fsq = _binary_pass_scan(mask, axis, w)
        elif window is not None:
            fsq = _minplus_pass_windowed(fsq, axis, w, window)
        elif method == "envelope":
            # adaptive sentinel: must dominate the max achievable d^2
            # (sum over axes of ((L_i - 1) * w_i)^2) or large finite
            # distances would clamp/saturate where the dense pass is exact
            bound = sum(((n - 1) * s) ** 2
                        for n, s in zip(mask.shape, sampling))
            fsq = _minplus_pass_envelope(
                fsq, axis, w, env_big=max(_ENV_BIG, 16.0 * bound))
        else:
            fsq = _minplus_pass(fsq, axis, w)
    return jnp.sqrt(fsq)
