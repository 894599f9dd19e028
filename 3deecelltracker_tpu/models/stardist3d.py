"""StarDist3D network: U-Net backbone + (prob, dist) heads on a subsampled
grid.

Functional rebuild of the stardist Keras model the reference wraps
(``stardistwrapper.py:213-281``, ``stardist3dcustom.py``): depth-2 U-Net
backbone (32->64 filters, ReLU, no batch-norm — stardist Config3D defaults),
a 128-filter feature conv, a 1-channel sigmoid probability head and an
n_rays linear distance head.  The prediction grid (``config.grid``) is an
initial max-pool so the heads run at grid resolution — the same output
semantics as stardist's subsampled grid with a TPU-friendly implementation.

Layout: (b, z, y, x, c) — stardist's ZYX axes order.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StarDistConfig
from . import layers as L

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class StarDist3DNet:
    """``arch`` selects the backbone topology:

    - ``"tpu"`` (default): the TPU-first redesign — grid subsampling as a
      max-pool BEFORE the stem so the expensive C_in=1 full-resolution conv
      never runs, symmetric filter counts, conv-after-concat up path.
    - ``"keras"``: exact topological parity with the Keras model the
      reference wraps (stardist 0.8 ``models/model3d.py::StarDist3D._build``
      + csbdeep ``internals/blocks.py::unet_block``): pre-grid conv blocks
      at full resolution followed by grid pooling, csbdeep's filter
      schedule (last conv of the middle/up blocks at half width), and
      upsample->concat->conv up path.  Needed so pretrained reference
      checkpoints imported via ``utils/keras_import`` reproduce the TF
      model's outputs exactly.
    """
    config: StarDistConfig
    arch: str = "tpu"
    # sub-pixel phase decomposition of the up-blocks (see
    # _fused_up_first_conv).  Default OFF: mathematically identical and
    # 2x faster in isolated layer timings, but measured SLOWER inside the
    # whole jitted backbone (13.4 -> 14.6 ms at worm scale; XLA layout
    # assignment undoes the win; barriers don't help) — kept as an option
    # because the balance may flip at other shapes/toolchains.
    fused_up: bool = False

    # ---- keras-parity layer plan -----------------------------------------
    def _keras_pools(self):
        """Pooling steps that bring full resolution down to ``grid``
        (stardist model3d: ``pool = 1 + (grid > pooled)`` loop)."""
        grid = tuple(self.config.grid)
        for g in grid:
            if g < 1 or (g & (g - 1)) != 0:
                raise ValueError(
                    f"grid entries must be powers of 2, got {grid!r} "
                    "(the pooling schedule doubles until it equals grid)")
        pooled = (1, 1, 1)
        pools = []
        while pooled != grid:
            pool = tuple(2 if g > p else 1 for g, p in zip(grid, pooled))
            pooled = tuple(p * q for p, q in zip(pooled, pool))
            pools.append(pool)
        return pools

    def _keras_plan(self):
        """Ordered (name, c_in, c_out, kernel) conv specs in Keras creation
        order — the order weights appear in a saved .h5."""
        cfg = self.config
        base, k = cfg.unet_n_filter_base, tuple(cfg.unet_kernel_size)
        ncv, depth = cfg.unet_n_conv_per_depth, cfg.unet_n_depth
        plan = []
        c = cfg.n_channel_in
        for step, _pool in enumerate(self._keras_pools()):
            for i in range(ncv):
                plan.append((f"pre{step}_{i}", c, base, k))
                c = base
        for n in range(depth):
            for i in range(ncv):
                plan.append((f"down{n}_{i}", c, base * 2 ** n, k))
                c = base * 2 ** n
        for i in range(ncv - 1):
            plan.append((f"middle{i}", c, base * 2 ** depth, k))
            c = base * 2 ** depth
        plan.append((f"middle{ncv - 1}", c, base * 2 ** max(0, depth - 1), k))
        c = base * 2 ** max(0, depth - 1)
        for n in reversed(range(depth)):
            c = c + base * 2 ** n            # concat with the level-n skip
            for i in range(ncv - 1):
                plan.append((f"up{n}_{i}", c, base * 2 ** n, k))
                c = base * 2 ** n
            plan.append((f"up{n}_{ncv - 1}", c, base * 2 ** max(0, n - 1), k))
            c = base * 2 ** max(0, n - 1)
        plan.append(("features", c, cfg.net_conv_after_unet, k))
        plan.append(("prob_head", cfg.net_conv_after_unet, 1, (1, 1, 1)))
        plan.append(("dist_head", cfg.net_conv_after_unet, cfg.n_rays,
                     (1, 1, 1)))
        return plan

    def init(self, key: jax.Array) -> Params:
        cfg = self.config
        if self.arch == "keras":
            plan = self._keras_plan()
            keys = jax.random.split(key, max(64, len(plan)))
            return {name: L.init_conv3d(keys[i], kernel, cin, cout)
                    for i, (name, cin, cout, kernel) in enumerate(plan)}
        ncv = cfg.unet_n_conv_per_depth
        # stem + features + 2 heads + ncv convs per down/bottom/up level;
        # keep the historical 32-way split when it suffices (a different
        # split count yields different keys, changing every existing
        # seeded init)
        keys = iter(jax.random.split(
            key, max(32, 4 + ncv * (2 * cfg.unet_n_depth + 1))))
        f = cfg.unet_n_filter_base
        k = cfg.unet_kernel_size
        params: Params = {}

        def conv(name, cin, cout, kernel=k):
            params[name] = L.init_conv3d(next(keys), kernel, cin, cout)

        conv("stem", cfg.n_channel_in, f)
        c = f
        filters = [f * (2 ** lvl) for lvl in range(cfg.unet_n_depth + 1)]
        for lvl in range(cfg.unet_n_depth):
            for i in range(ncv):
                conv(f"down{lvl}_{i}", c, filters[lvl])
                c = filters[lvl]
        for i in range(ncv):
            conv(f"bottom_{i}", c, filters[-1])
            c = filters[-1]
        for lvl in reversed(range(cfg.unet_n_depth)):
            for i in range(ncv):
                conv(f"up{lvl}_{i}",
                     (c + filters[lvl]) if i == 0 else filters[lvl],
                     filters[lvl])
            c = filters[lvl]
        conv("features", c, cfg.net_conv_after_unet)
        conv("prob_head", cfg.net_conv_after_unet, 1, kernel=(1, 1, 1))
        conv("dist_head", cfg.net_conv_after_unet, cfg.n_rays,
             kernel=(1, 1, 1))
        return params

    def apply(self, params: Params, x: jax.Array,
              compute_dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        """x: (b, z, y, x, c) -> (prob (b, z/g, y/g, x/g, 1),
        dist (b, ..., n_rays)).  Spatial dims must be divisible by
        grid * 2**unet_n_depth."""
        cfg = self.config
        act = jax.nn.relu

        def conv(name, h):
            return act(L.conv3d(params[name], h, compute_dtype))

        if self.arch == "keras":
            return self._apply_keras(params, x, compute_dtype)

        # grid subsampling happens BEFORE the stem (like stardist's pooled
        # input): the C_in=1 full-resolution conv is the single most
        # expensive op otherwise (poor MXU packing at 1 input channel)
        h = x
        if any(g > 1 for g in cfg.grid):
            h = L.max_pool3d(h, cfg.grid)
        h = conv("stem", h)
        skips = []
        ncv = cfg.unet_n_conv_per_depth
        for lvl in range(cfg.unet_n_depth):
            for i in range(ncv):
                h = conv(f"down{lvl}_{i}", h)
            skips.append(h)
            h = L.max_pool3d(h, cfg.unet_pool)
        for i in range(ncv):
            h = conv(f"bottom_{i}", h)
        for lvl in reversed(range(cfg.unet_n_depth)):
            if self.fused_up:
                h = _fused_up_first_conv(params[f"up{lvl}_0"], h,
                                         skips[lvl], cfg.unet_pool,
                                         compute_dtype)
                start = 1
            else:
                h = L.upsample3d(h, cfg.unet_pool)
                h = jnp.concatenate([h, skips[lvl].astype(h.dtype)],
                                    axis=-1)
                start = 0
            for i in range(start, ncv):
                h = conv(f"up{lvl}_{i}", h)
        feat = conv("features", h)
        prob = jax.nn.sigmoid(L.conv3d(params["prob_head"], feat,
                                       compute_dtype))
        dist = L.conv3d(params["dist_head"], feat, compute_dtype)
        return prob, dist

    def _apply_keras(self, params: Params, x: jax.Array,
                     compute_dtype=jnp.float32
                     ) -> Tuple[jax.Array, jax.Array]:
        """Keras-parity forward (stardist 0.8 model3d + csbdeep unet_block
        semantics; same (prob, dist)-at-grid-resolution contract as the TPU
        arch)."""
        cfg = self.config
        act = jax.nn.relu

        def conv(name, h):
            return act(L.conv3d(params[name], h, compute_dtype))

        ncv, depth = cfg.unet_n_conv_per_depth, cfg.unet_n_depth
        h = x
        for step, pool in enumerate(self._keras_pools()):
            for i in range(ncv):
                h = conv(f"pre{step}_{i}", h)
            h = L.max_pool3d(h, pool)
        skips = []
        for n in range(depth):
            for i in range(ncv):
                h = conv(f"down{n}_{i}", h)
            skips.append(h)
            h = L.max_pool3d(h, cfg.unet_pool)
        for i in range(ncv):
            h = conv(f"middle{i}", h)
        for n in reversed(range(depth)):
            h = L.upsample3d(h, cfg.unet_pool)
            h = jnp.concatenate([h, skips[n].astype(h.dtype)], axis=-1)
            for i in range(ncv):
                h = conv(f"up{n}_{i}", h)
        feat = conv("features", h)
        prob = jax.nn.sigmoid(L.conv3d(params["prob_head"], feat,
                                       compute_dtype))
        dist = L.conv3d(params["dist_head"], feat, compute_dtype)
        return prob, dist

    @property
    def div_by(self) -> Tuple[int, int, int]:
        cfg = self.config
        return tuple(g * p ** cfg.unet_n_depth
                     for g, p in zip(cfg.grid, cfg.unet_pool))

    def receptive_field(self) -> Tuple[int, int, int]:
        """Per-axis receptive-field RADIUS of the (prob, dist) outputs, in
        input voxels.  An output voxel depends only on inputs within this
        radius, so tile-and-stitch with a shrink margin >= this value
        reproduces whole-volume outputs bit-exactly in the interior
        (the basis of ``StarDist3D.predict_instances_tiled``)."""
        cfg = self.config
        k = tuple(cfg.unet_kernel_size)
        # (jump, radius) composition: a conv with kernel k at input jump j
        # widens the RF by (k//2)*j; a p-pool adds its window extent
        # (p-1)*j and multiplies the jump; nearest upsampling divides the
        # jump and adds up to (p-1) fine voxels of alignment slack.
        j, r = [1, 1, 1], [0, 0, 0]

        def convs(n):
            for ax in range(3):
                r[ax] += n * (k[ax] // 2) * j[ax]

        def pool(p):
            for ax in range(3):
                r[ax] += (p[ax] - 1) * j[ax]
                j[ax] *= p[ax]

        def upsample(p):
            for ax in range(3):
                j[ax] //= p[ax]
                r[ax] += (p[ax] - 1) * j[ax]

        if self.arch == "keras":
            ncv = cfg.unet_n_conv_per_depth
            for p in self._keras_pools():
                convs(ncv)
                pool(p)
        else:
            ncv = cfg.unet_n_conv_per_depth
            pool(cfg.grid)                # grid max-pool runs before stem
            convs(1)                      # stem
        for _lvl in range(cfg.unet_n_depth):
            convs(ncv)
            pool(cfg.unet_pool)
        convs(ncv)                        # bottom / middle
        for _lvl in range(cfg.unet_n_depth):
            upsample(cfg.unet_pool)
            convs(ncv)
        convs(1)                          # features (3x3x3)
        return tuple(int(v) for v in r)


def _fused_up_first_conv(p, h, skip, pool, compute_dtype):
    """``relu(conv3(W, concat([upsample(h), skip])) + b)`` without ever
    materializing the upsampled/concatenated tensor — the TPU-arch
    up-block's first conv as a sub-pixel phase conv.

    Identity: nearest-upsample by 2 then 3-tap conv == per output PHASE a
    2-tap conv on the COARSE grid with per-axis collapsed weights
    (phase 0 taps {-1: W0, 0: W1+W2}, phase 1 {0: W0+W1, +1: W2}); all 8
    phases stack into output channels of ONE coarse conv (8x c_out wide —
    near-full MXU columns) whose results interleave back to the fine
    grid.  The concat splits by input channels into this coarse conv plus
    a fine-grid conv over the skip.  Measured on v5e at worm scale
    (scripts/backbone_profile2.json): the direct up0 stage
    (upsample + concat + 96->32 conv) costs 4.7 ms in-program with the
    conv at ~16 TF/s; the phase form moves 2/3 of the FLOPs to a
    256-channel-out coarse conv at conv128-like rates and deletes the
    upsample/concat HBM round-trips.
    """
    pool = tuple(int(q) for q in pool)
    c_up = h.shape[-1]
    w = p["w"]                                   # (3, 3, 3, c_in, c_out)
    c_out = w.shape[-1]
    w_a, w_b = w[..., :c_up, :], w[..., c_up:, :]

    # per-axis collapse matrices m[phase, new_tap(-1,0,+1), old_tap]
    m2 = np.array([[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
                   [[0, 0, 0], [1, 1, 0], [0, 0, 1]]], np.float32)
    m1 = np.eye(3, dtype=np.float32)[None]       # pool 1: one phase
    ms = [m2 if q == 2 else m1 for q in pool]
    if any(q not in (1, 2) for q in pool):
        raise NotImplementedError(f"pool {pool}")
    w_ph = jnp.einsum("PZz,QYy,RXx,zyxio->ZYXiPQRo",
                      jnp.asarray(ms[0]), jnp.asarray(ms[1]),
                      jnp.asarray(ms[2]), w_a)
    n_ph = int(np.prod([m.shape[0] for m in ms]))
    w_ph = w_ph.reshape(3, 3, 3, c_up, n_ph * c_out)

    y_c = L.conv3d({"w": w_ph}, h, compute_dtype)    # (zc, yc, xc, 8co)
    zc, yc, xc = y_c.shape[1:4]
    pz, py, px = (ms[0].shape[0], ms[1].shape[0], ms[2].shape[0])
    y_c = y_c.reshape(y_c.shape[0], zc, yc, xc, pz, py, px, c_out)
    y_a = jnp.transpose(y_c, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        y_c.shape[0], zc * pz, yc * py, xc * px, c_out)

    y_b = L.conv3d({"w": w_b}, skip.astype(y_a.dtype), compute_dtype)
    return jax.nn.relu(y_a + y_b + p["b"])


def neighborhood_max_3x3x3(prob: jax.Array) -> jax.Array:
    """3x3x3 max filter (edge neighborhoods truncated).

    The max filter is separable and MUST be decomposed on TPU: a single
    3-D ``reduce_window`` lowers ~15x slower than three 1-D passes
    (measured 18.8 vs 1.3 ms on a (32, 44, 44) grid, v5e)."""
    neigh = prob
    for ax in range(3):
        win = [1, 1, 1]
        win[ax] = 3
        neigh = jax.lax.reduce_window(neigh, -jnp.inf, jax.lax.max,
                                      tuple(win), (1, 1, 1), "SAME")
    return neigh


def local_maxima_3x3x3(prob: jax.Array) -> jax.Array:
    """Boolean mask of voxels that equal their 3x3x3 neighborhood max
    (plateau voxels all qualify; edge neighborhoods are truncated)."""
    return prob >= neighborhood_max_3x3x3(prob)


@functools.partial(jax.jit, static_argnames=(
    "grid", "max_candidates", "border", "lmax_prefilter"))
def sparse_candidates(prob: jax.Array, dist: jax.Array,
                      grid: Tuple[int, int, int],
                      prob_thresh: float,
                      max_candidates: int = 512,
                      border: int = 2,
                      lmax_prefilter: bool = True
                      ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gather candidates above ``prob_thresh`` (stardist
    ``_ind_prob_thresh`` with b=2 border exclusion,
    stardist3dcustom.py:229-237) as fixed-size top-k arrays.

    ``lmax_prefilter`` (default True): keep only 3x3x3 local maxima of
    ``prob`` before the top-k.  The reference has NO candidate budget —
    its C++ NMS sees every above-threshold voxel and collapses each
    cell's cluster to its peak; under a static ``max_candidates`` budget
    a plain global top-k instead spends the whole budget on the few
    brightest cells once the model is well trained (measured on the
    bench scene: 150 cells -> ~4000 above-thresh grid voxels but exactly
    ~150 local maxima; top-256 truncation collapsed detections to
    36-111).  The prefilter keeps one candidate cluster representative
    per prob peak, which is what the uncapped reference NMS converges to
    anyway.  Set False for the raw stardist candidate-set letter (all
    above-thresh voxels, budget permitting).

    prob: (gz, gy, gx); dist: (gz, gy, gx, n_rays).
    Returns (probs (K,), dists (K, n_rays), points (K, 3) in input voxel
    units (z, y, x), valid (K,)).
    """
    gz, gy, gx = prob.shape
    b = border
    zz = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 0)
    yy = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, prob.shape, 2)
    interior = ((zz >= b) & (zz < gz - b) & (yy >= b) & (yy < gy - b)
                & (xx >= b) & (xx < gx - b)) if b else \
        jnp.ones(prob.shape, bool)
    if lmax_prefilter:
        interior = interior & local_maxima_3x3x3(prob)
    masked = jnp.where(interior, prob, -jnp.inf).reshape(-1)
    # volumes smaller than the candidate budget: take everything, pad the
    # result back to the static max_candidates shape with invalid slots
    k = min(max_candidates, masked.size)
    top_p, top_idx = jax.lax.top_k(masked, k)
    if k < max_candidates:
        top_p = jnp.pad(top_p, (0, max_candidates - k),
                        constant_values=-jnp.inf)
        top_idx = jnp.pad(top_idx, (0, max_candidates - k))
    valid = top_p > prob_thresh
    pts = jnp.stack([top_idx // (gy * gx),
                     (top_idx // gx) % gy,
                     top_idx % gx], axis=1)
    points = pts * jnp.asarray(grid, jnp.int32)[None, :]
    dists = jnp.maximum(dist.reshape(-1, dist.shape[-1])[top_idx], 1e-3)
    return jnp.where(valid, top_p, 0.0), dists, points, valid


def upsample_prob_map(prob: jax.Array, grid: Tuple[int, int, int],
                      out_shape: Tuple[int, int, int]) -> jax.Array:
    """resizer.after equivalent (stardist3dcustom.py:247): repeat by grid
    and crop to the input shape."""
    out = prob
    for axis, g in enumerate(grid):
        if g > 1:
            out = jnp.repeat(out, g, axis=axis)
    return out[:out_shape[0], :out_shape[1], :out_shape[2]]
