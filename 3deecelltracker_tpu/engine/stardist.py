"""StarDist3D instance segmentation engine + per-volume driver.

Rebuilds ``StarDist3DCustom`` (``stardist3dcustom.py:20-261``) and the
wrapper driver (``stardistwrapper.py:39-146``): sparse prediction returning
(prob, dist, points) above threshold PLUS the full resized probability map,
polyhedron NMS, label rendering, and the segment-everything-first loop that
persists ``seg/coords%06d.npy`` + ``seg/prob%06d.npy``.

TPU redesign: the network + candidate gather run as one jitted call on
padded static shapes; NMS overlap is a batched quasi-MC einsum; the
per-volume loop feeds through the async host prefetcher.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StarDistConfig
from ..io.artifacts import ResultsTree
from ..io.imageio import (get_t_range, load_2d_slices_at_time,
                          save_volume_slices, transport_encode)
from ..io.prefetch import VolumePrefetcher
from ..models.stardist3d import StarDist3DNet, sparse_candidates
from ..ops.nms import greedy_nms, overlap_matrix, render_polyhedra_labels
from ..ops.rays import rays_golden_spiral
from ..utils.checkpoint import load_pytree, save_pytree

UP_LIMIT = 400000  # stardistwrapper.py:32


class StarDist3D:
    """User-facing StarDist3D with the reference's custom prediction API:
    ``predict_instances(x) -> ((labels, details), prob_map)``.

    x is a (z, y, x) volume, already percentile-normalized
    (``load_2d_slices_at_time`` does this, like csbdeep normalize).
    """

    def __init__(self, config: StarDistConfig,
                 params=None, rng: Optional[jax.Array] = None,
                 max_candidates: int = 1024,
                 render_box: Tuple[int, int, int] = (33, 65, 65),
                 arch: str = "tpu",
                 lmax_prefilter: bool = True):
        self.config = config
        self.arch = arch
        self.net = StarDist3DNet(config, arch=arch)
        if params is None:
            params = self.net.init(
                rng if rng is not None else jax.random.PRNGKey(0))
        # params must live ON DEVICE: host (numpy) leaves — e.g. from a
        # Keras .h5 import — would ride inside every dispatch (~11 MB of
        # backbone weights re-uploaded per volume; see
        # utils.checkpoint.load_pytree)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.rays = jnp.asarray(
            rays_golden_spiral(config.n_rays, config.anisotropy))
        self.max_candidates = int(max_candidates)
        # keep only 3x3x3 prob local maxima as NMS candidates (see
        # models.stardist3d.sparse_candidates: the budget-free reference
        # NMS collapses each cell's above-thresh cluster to its peak; a
        # plain top-k under max_candidates instead starves dim cells)
        self.lmax_prefilter = bool(lmax_prefilter)
        self.render_box = tuple(int(b) for b in render_box)
        self._thresholds = dict(prob=config.prob_thresh,
                                nms=config.nms_thresh)
        # jit once: re-wrapping per call would retrace + recompile the
        # backbone for every volume
        self._fwd = jax.jit(self.net.apply)
        # fused whole-pipeline programs, keyed by (shape, return_labels):
        # a single dispatch per volume (the split per-stage dispatch costs
        # ~75 ms/volume in host round-trips through a remote TPU link)
        self._fused: Dict[tuple, object] = {}

    # ---- persistence -----------------------------------------------------
    def save(self, model_dir: Union[str, Path]) -> None:
        model_dir = Path(model_dir)
        model_dir.mkdir(parents=True, exist_ok=True)
        save_pytree(self.params, model_dir / "weights.npz")
        import json
        cfg = dict(dataclasses.asdict(self.config), arch=self.arch)
        with open(model_dir / "config.json", "w") as fh:
            json.dump(cfg, fh, indent=2)
        # persist optimized thresholds (the reference's stardist-0.8
        # folders carry the same file, stardistwrapper.py:39-43) — without
        # it an optimize_thresholds result dies with the process
        with open(model_dir / "thresholds.json", "w") as fh:
            json.dump(self._thresholds, fh)

    @staticmethod
    def load(model_dir: Union[str, Path]) -> "StarDist3D":
        import json
        model_dir = Path(model_dir)
        with open(model_dir / "config.json") as fh:
            raw = json.load(fh)
        arch = raw.pop("arch", "tpu")
        for key in ("grid", "anisotropy", "unet_pool", "unet_kernel_size",
                    "train_patch_size"):
            if key in raw and raw[key] is not None:
                raw[key] = tuple(raw[key])
        config = StarDistConfig(**raw)
        model = StarDist3D(config, arch=arch)
        model.params = load_pytree(model.params, model_dir / "weights.npz")
        if (model_dir / "thresholds.json").exists():
            with open(model_dir / "thresholds.json") as fh:
                model._thresholds = json.load(fh)
        return model

    # ---- prediction --------------------------------------------------------
    def _pad_input(self, x: np.ndarray) -> Tuple[np.ndarray, Tuple[int, ...]]:
        div = self.net.div_by
        pads = [(0, (-s) % d) for s, d in zip(x.shape, div)]
        return np.pad(x, pads, mode="reflect"), x.shape

    def predict_sparse(self, x: np.ndarray,
                       prob_thresh: Optional[float] = None):
        """(prob (K,), dist (K, n_rays), points (K, 3) zyx, valid (K,),
        prob_map) — parity with ``_predict_sparse_generator``
        (stardist3dcustom.py:168-261).

        ``prob_map`` is at GRID resolution (like the reference's
        ``resizer.after`` output, which undoes the div-by padding but NOT
        the grid): downstream, ``CoordsToImageTransformer.load_prob_map``
        upsamples it by ``grid`` (coord_image_transformer.py:432)."""
        if prob_thresh is None:
            prob_thresh = self._thresholds["prob"]
        padded, orig_shape = self._pad_input(np.asarray(x, np.float32))
        prob_g, dist_g = self._fwd(
            self.params, jnp.asarray(padded)[None, ..., None])
        prob_g = prob_g[0, ..., 0]
        dist_g = dist_g[0]
        probs, dists, points, valid = sparse_candidates(
            prob_g, dist_g, self.config.grid, prob_thresh,
            max_candidates=self.max_candidates,
            lmax_prefilter=self.lmax_prefilter)
        # crop the div-by padding in grid coordinates
        gshape = tuple(-(-s // g) for s, g in zip(orig_shape,
                                                  self.config.grid))
        prob_map = prob_g[:gshape[0], :gshape[1], :gshape[2]]
        # resizer.filter_points: drop candidates inside the pad margin
        in_range = ((points[:, 0] < orig_shape[0])
                    & (points[:, 1] < orig_shape[1])
                    & (points[:, 2] < orig_shape[2]))
        return probs, dists, points, valid & in_range, prob_map

    def _get_fused(self, orig_shape: Tuple[int, ...], return_labels: bool,
                   in_dtype: str):
        """One jitted program for the ENTIRE per-volume instance pipeline
        (normalize -> pad -> backbone -> candidate gather -> overlap ->
        NMS -> label render): a single device dispatch per volume instead
        of ~10, which matters through a high-latency (tunneled/remote)
        device link.

        The program takes the RAW volume (any dtype, e.g. the microscope's
        uint16 — half the upload bytes of float32) plus the two host-side
        percentile scalars, and normalizes on device with csbdeep's
        formula (``stardistwrapper.py:71``): bit-identical to normalizing
        on host."""
        key = (tuple(orig_shape), return_labels, in_dtype,
               self.lmax_prefilter, self.max_candidates, self.render_box)
        fn = self._fused.get(key)
        if fn is None:
            fn = jax.jit(self._make_instance_body(orig_shape, return_labels))
            self._fused[key] = fn
        return fn

    def _make_instance_body(self, orig_shape, return_labels: bool):
        """The per-volume instance pipeline body (shared by the
        single-volume jit and the batched vmap program)."""
        cfg = self.config
        net, rays = self.net, self.rays
        max_candidates, render_box = self.max_candidates, self.render_box
        lmax_prefilter = self.lmax_prefilter
        gshape = tuple(-(-s // g) for s, g in zip(orig_shape, cfg.grid))
        image_shape = tuple(int(s) for s in orig_shape)
        div = self.net.div_by
        pads = [(0, (-s) % d) for s, d in zip(orig_shape, div)]

        def fused(params, x_raw, mi, ma, prob_thresh, nms_thresh):
            x = (x_raw.astype(jnp.float32) - mi) / (ma - mi + 1e-20)
            xp = jnp.pad(x, pads, mode="reflect")
            prob_g, dist_g = net.apply(params, xp[None, ..., None])
            prob_g, dist_g = prob_g[0, ..., 0], dist_g[0]
            probs, dists, points, valid = sparse_candidates(
                prob_g, dist_g, cfg.grid, prob_thresh,
                max_candidates=max_candidates,
                lmax_prefilter=lmax_prefilter)
            # f16 halves the per-volume prob-map transfer; _finalize
            # restores float32 on host (quantization ~5e-4 abs, far below
            # any thresholding or correction-weight sensitivity)
            prob_map = prob_g[:gshape[0], :gshape[1],
                              :gshape[2]].astype(jnp.float16)
            # resizer.filter_points: drop candidates in the pad margin
            valid = (valid
                     & (points[:, 0] < orig_shape[0])
                     & (points[:, 1] < orig_shape[1])
                     & (points[:, 2] < orig_shape[2]))
            centers = points.astype(jnp.float32)
            overlaps = overlap_matrix(centers, dists, rays, valid,
                                      prob=probs)
            kept = greedy_nms(probs, overlaps, valid, nms_thresh)
            out = (kept, probs, dists, points, prob_map)
            if return_labels:
                # uint16 halves the label transfer (cell counts are far
                # below 65535; the reference writes 8/16-bit TIFFs anyway)
                out = out + (render_polyhedra_labels(
                    centers, dists, rays, probs, kept, image_shape,
                    render_box).astype(jnp.uint16),)
            return out

        return fused

    def _get_fused_batch(self, orig_shape: Tuple[int, ...], batch: int,
                         in_dtype: str):
        """Batched variant: B independent volumes per dispatch/fetch.
        Through a high-latency device link the per-call RPC dominates the
        per-volume cost (measured ~50 ms/round-trip at worm scale), so
        batching divides it by B.  No labels (the driver only persists
        labels for vol 1, which runs through the single-volume program)."""
        key = ("fusedB", tuple(orig_shape), batch, in_dtype,
               self.lmax_prefilter, self.max_candidates, self.render_box)
        fn = self._fused.get(key)
        if fn is None:
            body = self._make_instance_body(orig_shape, False)
            fn = jax.jit(lambda params, xs, mis, mas, pt, nt: jax.vmap(
                lambda x, mi, ma: body(params, x, mi, ma, pt, nt))(
                    xs, mis, mas))
            self._fused[key] = fn
        return fn

    def _get_fused_batch_sharded(self, orig_shape: Tuple[int, ...],
                                 batch: int, in_dtype: str, mesh,
                                 data_axis: str = "data"):
        """Mesh-sharded variant of :meth:`_get_fused_batch`: the volume
        batch axis is sharded over ``mesh``'s ``data_axis``, so each
        device runs the identical per-volume instance program on its
        shard — in-process data parallelism over volumes (SURVEY §2.3
        mapping (i); the reference's serial per-volume loop is
        stardistwrapper.py:94).  Outputs stay batch-sharded; the host
        gather happens in the saver's ``device_get``."""
        from jax.sharding import NamedSharding, PartitionSpec

        key = ("fusedB_sharded", tuple(orig_shape), batch, in_dtype,
               mesh, data_axis, self.lmax_prefilter, self.max_candidates,
               self.render_box)
        fn = self._fused.get(key)
        if fn is None:
            body = self._make_instance_body(orig_shape, False)
            data = NamedSharding(mesh, PartitionSpec(data_axis))
            repl = NamedSharding(mesh, PartitionSpec())
            fn = jax.jit(
                lambda params, xs, mis, mas, pt, nt: jax.vmap(
                    lambda x, mi, ma: body(params, x, mi, ma, pt, nt))(
                        xs, mis, mas),
                in_shardings=(repl, data, data, data, repl, repl),
                out_shardings=data)
            self._fused[key] = fn
        return fn

    def _predict_batch_device(self, xs, mis, mas,
                              prob_thresh: Optional[float] = None,
                              nms_thresh: Optional[float] = None,
                              mesh=None, data_axis: str = "data"):
        """Dispatch B stacked volumes (device or host arrays); returns the
        batched device tuple (no host sync).  With ``mesh``, the batch
        axis is sharded over the mesh's ``data_axis`` (B must be a
        multiple of that axis; ``predict_and_save`` pads its groups)."""
        if prob_thresh is None:
            prob_thresh = self._thresholds["prob"]
        if nms_thresh is None:
            nms_thresh = self._thresholds["nms"]
        if mesh is not None:
            fused = self._get_fused_batch_sharded(
                tuple(xs.shape[1:]), int(xs.shape[0]),
                np.dtype(xs.dtype).str, mesh, data_axis)
        else:
            fused = self._get_fused_batch(tuple(xs.shape[1:]),
                                          int(xs.shape[0]),
                                          np.dtype(xs.dtype).str)
        # np arrays/scalars ride inside the (async) execute call — explicit
        # device_put would cost a synchronous upload RPC each
        return fused(self.params, xs, np.asarray(mis, np.float32),
                     np.asarray(mas, np.float32),
                     np.float32(prob_thresh), np.float32(nms_thresh))

    def _predict_instances_device(self, x: np.ndarray,
                                  prob_thresh: Optional[float] = None,
                                  nms_thresh: Optional[float] = None,
                                  return_labels: bool = True,
                                  norm_minmax: Tuple[float, float] = (0.0,
                                                                      1.0)):
        """Dispatch the full instance pipeline; returns device arrays only
        (no host sync) so callers can overlap transfer with the next
        volume's compute.

        ``norm_minmax``: percentile scalars for on-device normalization.
        The default (0, 1) is an exact identity for pre-normalized float
        input; ``predict_and_save`` passes raw uint16 volumes with their
        host-computed 1/99.8 percentiles instead (half the upload bytes)."""
        if prob_thresh is None:
            prob_thresh = self._thresholds["prob"]
        if nms_thresh is None:
            nms_thresh = self._thresholds["nms"]
        if not isinstance(x, jax.Array):
            x = np.asarray(x)       # device arrays pass through un-fetched
        mi, ma = norm_minmax
        fused = self._get_fused(x.shape, return_labels,
                                np.dtype(x.dtype).str)
        # np scalars ride along inside the (async) execute call; explicit
        # jnp scalars would each cost a synchronous upload RPC on a
        # high-latency link
        out = fused(self.params, jnp.asarray(x),
                    np.float32(mi), np.float32(ma),
                    np.float32(prob_thresh), np.float32(nms_thresh))
        if return_labels:
            kept, probs, dists, points, prob_map, labels_dev = out
        else:
            (kept, probs, dists, points, prob_map), labels_dev = out, None
        return kept, probs, dists, points, prob_map, labels_dev

    def _finalize_instances(self, device_tuple):
        """ONE device->host transfer + host-side selection.

        ``dists`` may be None (the artifact savers skip fetching it —
        ~100 KB/volume of d2h the seg artifacts never use); the returned
        ``details["dist"]`` is then None."""
        fetched = jax.device_get(device_tuple)
        kept_np, probs_np, dists_np, points_np, prob_map_np, labels = fetched
        if labels is not None and labels.dtype == np.uint16:
            labels = np.asarray(labels, np.int32)   # u16 is wire format only
        prob_map_np = np.asarray(prob_map_np, np.float32)
        # stable: tied probs (e.g. saturated sigmoids) keep candidate
        # order, matching the device-side adapter
        # (pipeline.seg_candidates_to_padded_real) bit-for-bit
        order = np.argsort(-np.where(kept_np, probs_np, -np.inf),
                           kind="stable")
        sel = order[: int(kept_np.sum())]
        details: Dict[str, np.ndarray] = {
            "points": points_np[sel],
            "prob": probs_np[sel],
            "dist": dists_np[sel] if dists_np is not None else None,
            "rays_vertices": np.asarray(self.rays),
        }
        return (labels, details), prob_map_np

    def predict(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Dense network outputs (upstream ``StarDist3D.predict``
        semantics, the ``sparse=False`` branch of
        ``stardist3dcustom.py:116-126``): full ``(prob (gz, gy, gx),
        dist (gz, gy, gx, n_rays))`` volumes at GRID resolution with the
        div-by padding cropped (``resizer.after`` undoes padding but not
        the grid)."""
        padded, orig_shape = self._pad_input(np.asarray(x, np.float32))
        prob_g, dist_g = self._fwd(
            self.params, jnp.asarray(padded)[None, ..., None])
        gshape = tuple(-(-s // g) for s, g in zip(orig_shape,
                                                  self.config.grid))
        prob, dist = jax.device_get(
            (prob_g[0, :gshape[0], :gshape[1], :gshape[2], 0],
             dist_g[0, :gshape[0], :gshape[1], :gshape[2], :]))
        return np.asarray(prob), np.asarray(dist)

    def predict_instances(self, x: np.ndarray,
                          prob_thresh: Optional[float] = None,
                          nms_thresh: Optional[float] = None,
                          return_labels: bool = True,
                          sparse: bool = True,
                          return_predict: bool = False):
        """((labels, details), prob_map) — reference
        ``StarDist3DCustom.predict_instances`` (stardist3dcustom.py:152).

        ``sparse=False``: ALSO materializes the dense prob/dist volumes;
        ``prob_map`` is then the full-precision dense prob (the sparse
        path's prob_map rides the link f16-quantized).  The instances are
        identical either way — sparse vs dense is a memory strategy, not
        a different algorithm.

        ``return_predict=True`` (implies ``sparse=False``, with the
        reference's warning): returns ``((labels, details), (prob, dist),
        prob_map)``.  NOTE the reference's OWN dense branch cannot
        execute — ``stardist3dcustom.py:126`` pads the upstream
        ``(prob, dist)`` pair to 3 elements and :131 unpacks 4, raising
        ValueError — so this implements the documented intent
        (stardist3dcustom.py:75-84,147) rather than the (crashing)
        letter of the code."""
        if return_predict and sparse:
            import warnings
            warnings.warn(
                "Setting sparse to False because return_predict is True")
            sparse = False
        instances, prob_map = self._finalize_instances(
            self._predict_instances_device(
                x, prob_thresh, nms_thresh, return_labels))
        if sparse:
            return instances, prob_map
        prob, dist = self.predict(x)
        if return_predict:
            return instances, (prob, dist), prob
        return instances, prob

    # ---- tiled prediction (large volumes) ----------------------------------
    def _make_tile_fn(self, tiles, shr, vol, k_tile):
        """Per-tile body: backbone -> center crop -> local candidate top-k
        with GLOBAL border/range semantics (traced tile origin).  Shared by
        the sequential tiled path (jit) and the mesh-sharded path (jit of
        vmap over the tile batch)."""
        cfg, net = self.config, self.net
        grid = tuple(cfg.grid)
        n_rays = cfg.n_rays
        c_g = tuple((t - 2 * s) // g for t, s, g in zip(tiles, shr, grid))
        s_g = tuple(s // g for s, g in zip(shr, grid))
        # interior test on the same grid the WHOLE-volume path uses
        # (volume padded to div_by), so border exclusion matches exactly
        gdim = tuple((-(-v // d) * d) // g
                     for v, d, g in zip(vol, net.div_by, grid))
        b = 2  # sparse_candidates border default
        lmax_prefilter = self.lmax_prefilter

        def tile_fn(params, tile, mi, ma, origin_g, prob_thresh):
            xn = (tile.astype(jnp.float32) - mi) / (ma - mi + 1e-20)
            prob_g, dist_g = net.apply(params, xn[None, ..., None])
            prob_c = jax.lax.dynamic_slice(prob_g[0, ..., 0], s_g, c_g)
            if lmax_prefilter:
                # peak test on the UNcropped tile grid so center-crop
                # voxels compare against neighbors in the shrink margin;
                # slice the FLOAT neighborhood max (a bool slice inserts
                # i1 layout conversions) and compare after cropping
                from ..models.stardist3d import neighborhood_max_3x3x3
                neigh_c = jax.lax.dynamic_slice(
                    neighborhood_max_3x3x3(prob_g[0, ..., 0]), s_g, c_g)
                lmax_c = prob_c >= neigh_c
            dist_c = jax.lax.dynamic_slice(dist_g[0], s_g + (0,),
                                           c_g + (n_rays,))
            zz = jax.lax.broadcasted_iota(jnp.int32, c_g, 0) + origin_g[0]
            yy = jax.lax.broadcasted_iota(jnp.int32, c_g, 1) + origin_g[1]
            xx = jax.lax.broadcasted_iota(jnp.int32, c_g, 2) + origin_g[2]
            interior = ((zz >= b) & (zz < gdim[0] - b)
                        & (yy >= b) & (yy < gdim[1] - b)
                        & (xx >= b) & (xx < gdim[2] - b))
            pts = jnp.stack([zz, yy, xx], -1) * \
                jnp.asarray(grid, jnp.int32)
            in_range = ((pts[..., 0] < vol[0]) & (pts[..., 1] < vol[1])
                        & (pts[..., 2] < vol[2]))
            keep = interior & in_range
            if lmax_prefilter:
                keep = keep & lmax_c
            masked = jnp.where(keep, prob_c, -jnp.inf).reshape(-1)
            k = min(k_tile, masked.size)
            top_p, top_idx = jax.lax.top_k(masked, k)
            valid = top_p > prob_thresh
            dists = jnp.maximum(dist_c.reshape(-1, n_rays)[top_idx], 1e-3)
            pts_flat = pts.reshape(-1, 3)[top_idx]
            return (prob_c, jnp.where(valid, top_p, 0.0), dists, pts_flat,
                    valid)

        return tile_fn

    def _get_tile_program(self, tiles, shr, vol, k_tile):
        key = ("tile", tiles, shr, vol, k_tile, self.lmax_prefilter)
        fn = self._fused.get(key)
        if fn is None:
            fn = jax.jit(self._make_tile_fn(tiles, shr, vol, k_tile))
            self._fused[key] = fn
        return fn

    def _get_tile_batch_from_volume_program(self, tiles, shr, vol, k_tile,
                                            batch):
        """``batch`` tiles per dispatch over a DEVICE-RESIDENT padded
        volume: each tile is ``dynamic_slice``d out inside the jitted
        program (vmapped over the (B, 3) origin batch), so a dispatch
        carries only scalars and a fetch returns ``batch`` tiles' outputs
        in ONE d2h round trip.

        Through a remote link this removes both transfer pathologies of
        the host-sliced per-tile path: (a) overlapping shrink margins made
        it upload ~(n_tiles x tile) bytes — several times the volume — per
        recording, and (b) one fetch RPC per tile cost ~100 ms x n_tiles.
        Measured at zebrafish scale (64,512,512)x96 rays, 49 tiles,
        through the remote dev link: 18.8 s (round 2, host-sliced) ->
        9.8 s (device-resident, per-tile fetch) -> 5.4 s (batched, f32
        input) / 4.2 s (raw uint16 input) with uint16 label wire format;
        device compute alone is 1.09 s
        (scripts/measure_zebrafish_device.py).  Remaining wall is the
        one-time volume upload + label fetch at ~40 MB/s."""
        key = ("tile_vol", tiles, shr, vol, k_tile, batch,
               self.lmax_prefilter)
        fn = self._fused.get(key)
        if fn is None:
            tile_fn = self._make_tile_fn(tiles, shr, vol, k_tile)

            @jax.jit
            def from_volume(params, padded, mi, ma, origins, origins_g,
                            prob_thresh):
                def one(o, og):
                    tile = jax.lax.dynamic_slice(
                        padded, (o[0], o[1], o[2]), tiles)
                    return tile_fn(params, tile, mi, ma, og, prob_thresh)
                return jax.vmap(one)(origins, origins_g)

            fn = from_volume
            self._fused[key] = fn
        return fn

    def _get_combine_program(self, k, image_shape, return_labels):
        """Global overlap -> greedy NMS -> (optional) label render over the
        concatenated per-tile candidates — same ops as the whole-volume
        fused program."""
        # render_box in the key: bench/tune scripts mutate the recipe
        # fields AFTER load (ADVICE r4) — a stale program would silently
        # keep the old render box / candidate budget
        key = ("combine", k, tuple(image_shape), return_labels,
               self.render_box)
        fn = self._fused.get(key)
        if fn is not None:
            return fn
        rays, render_box = self.rays, self.render_box
        # label ids are ranks over the k concatenated candidates (not over
        # self.max_candidates), so the lossless-uint16 guard must test k
        u16 = k < 65536

        @jax.jit
        def combine(probs, dists, points, valid, nms_thresh):
            centers = points.astype(jnp.float32)
            overlaps = overlap_matrix(centers, dists, rays, valid,
                                      prob=probs)
            kept = greedy_nms(probs, overlaps, valid, nms_thresh)
            if return_labels:
                labels = render_polyhedra_labels(
                    centers, dists, rays, probs, kept,
                    tuple(image_shape), render_box)
                if u16:
                    # lossless wire format: ids < 65536, halves the d2h
                    # label transfer; _finalize_instances restores int32
                    labels = labels.astype(jnp.uint16)
                return kept, labels
            return kept

        self._fused[key] = combine
        return combine

    def predict_instances_tiled(self, x: np.ndarray,
                                tile_shape=(None, 256, 256),
                                shrink=None,
                                prob_thresh: Optional[float] = None,
                                nms_thresh: Optional[float] = None,
                                tile_candidates: int = 256,
                                return_labels: bool = True,
                                norm_minmax: Tuple[float, float] = (0., 1.),
                                tile_batch: int = 8):
        """Tile-and-stitch instance prediction for volumes too large for
        the whole-volume program — the case the reference explicitly punts
        on (``stardist3dcustom.py:188`` raises ``NotImplementedError`` for
        tiled sparse prediction; stardist's own ``predict_instances_big``
        is never wired up there).

        Semantics: the volume is reflect-padded and covered by overlapping
        tiles whose ``shrink`` margin defaults to the network's receptive
        field (``StarDist3DNet.receptive_field``), so backbone outputs in
        every tile's center region are BIT-IDENTICAL to the whole-volume
        pass (an output voxel depends only on inputs within the RF).
        Candidates are gathered per tile from its center region only (the
        centers partition the volume — no duplicates), with the
        whole-volume path's border exclusion evaluated in GLOBAL
        coordinates; NMS and label rendering then run globally.  Within
        the network's RF of the volume boundary, results may differ from
        the whole-volume pass (different padding context) — the same
        boundary caveat as the reference's tiled U-Net
        (``unet3d.py:203-279``).

        ``tile_shape``: per-axis tile size; ``None`` (or >= volume) leaves
        an axis untiled.  Sizes are rounded down to ``div_by`` multiples.
        ``tile_candidates``: top-k candidate budget per tile; the global
        budget stays ``self.max_candidates``.

        Returns ``((labels, details), prob_map)`` exactly like
        :meth:`predict_instances` (prob_map at grid resolution).
        """
        vol, grid, tiles, shr, plan, padded, gshape, c_g = \
            self._plan_tiling(x, tile_shape, shrink)
        if prob_thresh is None:
            prob_thresh = self._thresholds["prob"]
        if nms_thresh is None:
            nms_thresh = self._thresholds["nms"]
        prob_map = np.zeros(gshape, np.float32)

        origins = [tuple(int(v) for v in o) for o in plan.origins]
        batch = max(1, min(int(tile_batch), len(origins)))
        prog = self._get_tile_batch_from_volume_program(
            tiles, shr, vol, tile_candidates, batch)
        mi, ma = norm_minmax
        # the padded volume is uploaded ONCE and tiles are sliced out on
        # device inside the jitted program (see
        # _get_tile_batch_from_volume_program for the measured wins)
        padded_dev = jax.device_put(jnp.asarray(padded))
        # pipelined: keep 2 tile BATCHES in flight (async dispatch) and
        # fetch the oldest as new ones launch — a fetch inside the
        # dispatch loop serializes dispatch -> compute -> download.
        in_flight = 2
        pending: list = []
        parts = []

        def fetch_one():
            ogs, n_real, out = pending.pop(0)
            probs_c, top_p, dists, pts, valid = jax.device_get(out)
            for i in range(n_real):       # padded duplicates are dropped
                self._paste_tile_prob(prob_map, probs_c[i], ogs[i], c_g,
                                      gshape)
                parts.append((top_p[i], dists[i], pts[i], valid[i]))

        for start in range(0, len(origins), batch):
            chunk = origins[start:start + batch]
            n_real = len(chunk)
            chunk = chunk + [chunk[-1]] * (batch - n_real)
            ogs = [tuple(v // g for v, g in zip(o, grid)) for o in chunk]
            out = prog(self.params, padded_dev,
                       np.float32(mi), np.float32(ma),
                       np.asarray(chunk, np.int32),
                       np.asarray(ogs, np.int32), np.float32(prob_thresh))
            pending.append((ogs, n_real, out))
            while len(pending) > in_flight:
                fetch_one()
        while pending:
            fetch_one()

        return self._combine_tile_parts(parts, prob_map, vol, nms_thresh,
                                        return_labels)

    def _plan_tiling(self, x, tile_shape, shrink):
        """Shared tile planning: shrink margins rounded to ``div_by``,
        reflect padding, and center-region bookkeeping."""
        from ..ops.tiling import plan_tiles

        x = np.asarray(x)
        vol = tuple(int(s) for s in x.shape)
        cfg = self.config
        grid = tuple(cfg.grid)
        div = self.net.div_by
        if shrink is None:
            shrink = self.net.receptive_field()

        tiles, shr = [], []
        for ax in range(3):
            t, v, d, g = tile_shape[ax], vol[ax], div[ax], grid[ax]
            # shrink rounds up to a div_by multiple: tile content must sit
            # on the same pooling grid as the whole volume, i.e.
            # (tile_origin - shrink) % div == 0 for every tile
            s = -(-int(shrink[ax]) // d) * d
            if t is None or int(t) - 2 * s >= v:
                tiles.append(-(-v // d) * d)           # one tile covers it
                shr.append(0)
            else:
                t = (int(t) // d) * d
                if t - 2 * s <= 0:
                    raise ValueError(
                        f"tile {t} too small for shrink {s} on axis {ax} "
                        f"(receptive field {self.net.receptive_field()})")
                tiles.append(t)
                shr.append(s)
        tiles, shr = tuple(tiles), tuple(shr)
        plan = plan_tiles(vol, tiles, shr)

        # keep the caller's dtype: raw uint16 microscopy volumes upload at
        # half the bytes of float32 (the tile program casts + normalizes
        # on device with the caller's norm_minmax percentiles)
        padded = np.pad(
            x,
            [(s, p - v - s) for s, p, v in zip(shr, plan.padded_shape, vol)],
            mode="reflect")
        gshape = tuple(-(-v // g) for v, g in zip(vol, grid))
        c_g = tuple((t - 2 * s) // g for t, s, g in zip(tiles, shr, grid))
        return vol, grid, tiles, shr, plan, padded, gshape, c_g

    @staticmethod
    def _paste_tile_prob(prob_map, prob_c, og, c_g, gshape):
        ext = tuple(min(c, gs - oo) for c, gs, oo in zip(c_g, gshape, og))
        if all(e > 0 for e in ext):
            prob_map[og[0]:og[0] + ext[0], og[1]:og[1] + ext[1],
                     og[2]:og[2] + ext[2]] = prob_c[:ext[0], :ext[1],
                                                    :ext[2]]

    def _combine_tile_parts(self, parts, prob_map, vol, nms_thresh,
                            return_labels):
        """Global candidate merge -> NMS -> (optional) render -> finalize,
        shared by the sequential and mesh-sharded tiled paths."""
        probs = np.concatenate([p[0] for p in parts])
        dists = np.concatenate([p[1] for p in parts])
        points = np.concatenate([p[2] for p in parts])
        valid = np.concatenate([p[3] for p in parts])
        order = np.argsort(-np.where(valid, probs, -np.inf), kind="stable")
        order = order[:self.max_candidates]
        probs, dists, points, valid = (probs[order], dists[order],
                                       points[order], valid[order])

        combine = self._get_combine_program(len(order), vol, return_labels)
        out = combine(jnp.asarray(probs), jnp.asarray(dists),
                      jnp.asarray(points), jnp.asarray(valid),
                      np.float32(nms_thresh))
        if return_labels:
            kept, labels = jax.device_get(out)
        else:
            kept, labels = jax.device_get(out), None
        return self._finalize_instances((kept, probs, dists, points,
                                         prob_map, labels))

    def predict_instances_sharded(self, x: np.ndarray,
                                  mesh=None,
                                  tile_shape=(None, 256, 256),
                                  shrink=None,
                                  prob_thresh: Optional[float] = None,
                                  nms_thresh: Optional[float] = None,
                                  tile_candidates: int = 256,
                                  return_labels: bool = True,
                                  norm_minmax: Tuple[float, float] = (0.,
                                                                      1.)):
        """Mesh-sharded tile-and-stitch instance prediction: the tile
        batch fans out across the devices of a 1-axis ``jax.sharding.Mesh``
        (defaults to all local devices), each device runs the SAME
        per-tile program as :meth:`predict_instances_tiled` on its shard,
        and candidates merge globally — identical instances to the
        sequential tiled path, wall-clock divided by the device count.
        This is the zebrafish-scale inference path (the reference raises
        ``NotImplementedError`` at ``stardist3dcustom.py:188``)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        vol, grid, tiles, shr, plan, padded, gshape, c_g = \
            self._plan_tiling(x, tile_shape, shrink)
        if prob_thresh is None:
            prob_thresh = self._thresholds["prob"]
        if nms_thresh is None:
            nms_thresh = self._thresholds["nms"]
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("tiles",))
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

        origins = [tuple(int(v) for v in o) for o in plan.origins]
        n_tiles = len(origins)
        n_pad = (-n_tiles) % n_dev
        stack = np.empty((n_tiles + n_pad,) + tiles, padded.dtype)
        ogs = np.zeros((n_tiles + n_pad, 3), np.int32)
        for i, o in enumerate(origins):
            stack[i] = padded[o[0]:o[0] + tiles[0], o[1]:o[1] + tiles[1],
                              o[2]:o[2] + tiles[2]]
            ogs[i] = [v // g for v, g in zip(o, grid)]
        stack[n_tiles:] = 0.0               # pad tiles: dropped after fetch

        key = ("tile_sharded", tiles, shr, vol, tile_candidates,
               tuple(mesh.axis_names), n_dev, self.lmax_prefilter)
        batched = self._fused.get(key)
        if batched is None:
            tile_fn = self._make_tile_fn(tiles, shr, vol, tile_candidates)
            batched = jax.jit(jax.vmap(
                tile_fn, in_axes=(None, 0, None, None, 0, None)))
            self._fused[key] = batched

        spec = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        tiles_dev = jax.device_put(stack, spec)
        ogs_dev = jax.device_put(ogs, spec)
        mi, ma = norm_minmax
        out = batched(self.params, tiles_dev, np.float32(mi),
                      np.float32(ma), ogs_dev, np.float32(prob_thresh))
        prob_cs, top_ps, dists, pts, valids = jax.device_get(out)

        prob_map = np.zeros(gshape, np.float32)
        parts = []
        for i in range(n_tiles):
            self._paste_tile_prob(prob_map, prob_cs[i], tuple(ogs[i]), c_g,
                                  gshape)
            parts.append((top_ps[i], dists[i], pts[i], valids[i]))
        return self._combine_tile_parts(parts, prob_map, vol, nms_thresh,
                                        return_labels)


def load_stardist_model(model_name: str = "stardist",
                        basedir: str = "stardist_models") -> StarDist3D:
    """``stardistwrapper.load_stardist_model`` (:39-43).

    Accepts BOTH model-folder formats: this framework's (``weights.npz`` +
    our config.json) and the reference's stardist-0.8 folders
    (``config.json`` written by Config3D, ``thresholds.json``,
    ``weights_best.h5``/``weights_last.h5``) — the latter via
    ``utils.keras_import``, running the checkpoint bit-faithfully with
    ``arch="keras"``."""
    model_dir = Path(basedir) / model_name
    if (model_dir / "weights.npz").exists():
        model = StarDist3D.load(model_dir)
    else:
        model = load_stardist_keras_dir(model_dir)
    print(f"Load pretrained stardist model '{model_name}' "
          f"from folder '{basedir}'")
    return model


def load_stardist_keras_dir(model_dir: Union[str, Path]) -> StarDist3D:
    """Load a reference/stardist-0.8 Keras model folder
    (``stardistwrapper.py:39-43``): Config3D ``config.json``, optimized
    ``thresholds.json`` and a Keras ``.h5`` checkpoint."""
    import json

    from ..utils.keras_import import (import_stardist3d,
                                      stardist_config_from_json)

    model_dir = Path(model_dir)
    config = stardist_config_from_json(model_dir / "config.json")
    weights = None
    for name in ("weights_best.h5", "weights_last.h5", "weights_now.h5"):
        if (model_dir / name).exists():
            weights = model_dir / name
            break
    if weights is None:
        cands = sorted(model_dir.glob("*.h5"))
        if not cands:
            raise FileNotFoundError(f"no .h5 checkpoint in {model_dir}")
        weights = cands[0]
    params = import_stardist3d(weights, config)
    model = StarDist3D(config, params=params, arch="keras")
    thresh_file = model_dir / "thresholds.json"
    if thresh_file.exists():
        with open(thresh_file) as fh:
            raw = json.load(fh)
        model._thresholds = dict(prob=float(raw.get("prob",
                                                    config.prob_thresh)),
                                 nms=float(raw.get("nms",
                                                   config.nms_thresh)))
    return model


def predict_and_save(images_path, model: StarDist3D,
                     results_folder: Union[str, Path],
                     prefetch_depth: int = 2,
                     batch_size: int = 4,
                     volumes=None,
                     progress_cb=None,
                     tile_shape=None,
                     tile_candidates: int = 256,
                     tile_batch: int = 8,
                     shrink=None,
                     should_stop=None,
                     mesh=None,
                     data_axis: str = "data",
                     transport: str = "u16") -> None:
    """Segment every volume and persist seg/ artifacts
    (``stardistwrapper.predict_and_save`` :75-111): coords saved (y, x, z)
    -> the pipeline's (x, y, z) frame, prob_map transposed to (x, y, z).

    ``volumes``: optional explicit list of time points to segment — the
    multi-host work-sharding hook (each host passes
    ``parallel.multihost.local_shard(range(t_min, t_max + 1))`` and all
    hosts write disjoint artifacts into one shared results tree; the
    host whose shard contains the recording's first volume also renders
    the ``auto_vol1`` labels).  Default: every volume in the recording.

    ``progress_cb``: optional ``cb(t)`` invoked (on a saver thread) after
    volume ``t``'s seg artifacts are fully written — the hand-off hook
    for the concurrent ``pipeline.segment_and_track`` driver.

    ``should_stop``: optional ``fn() -> bool`` polled once per volume —
    when it turns true the sweep stops early (cleanly, after finishing
    in-flight work).  Lets ``segment_and_track`` cancel a long
    segmentation when tracking has already failed.

    ``tile_shape``: when set (e.g. ``(None, 256, 256)``), each volume is
    segmented through :meth:`StarDist3D.predict_instances_tiled` instead
    of the whole-volume fused program — the zebrafish-scale recording
    driver (volumes too large for one device program).
    ``tile_candidates``/``tile_batch``/``shrink`` pass through to it.

    ``mesh``: optional ``jax.sharding.Mesh`` — IN-PROCESS data
    parallelism over volumes: each dispatch group's batch axis is
    sharded over the mesh's ``data_axis``, so all local devices segment
    different volumes of the group concurrently (identical artifacts to
    the sequential sweep, SURVEY §2.3 mapping (i)).  ``batch_size``
    rounds up to a multiple of the axis size; the first volume (label
    render for ``auto_vol1``) still runs the single-device program.
    Composes with ``volumes=`` multi-host sharding: shard the time range
    across hosts, then each host fans its shard out over its mesh.
    Mutually exclusive with ``tile_shape`` (use
    :meth:`StarDist3D.predict_instances_sharded` to shard TILES of one
    huge volume instead).

    Pipelined: input volumes prefetch on one thread (raw dtype, with the
    1/99.8 normalization percentiles computed there too — normalization
    itself runs on device, halving upload bytes for uint16 data), device
    compute for volume t+1 dispatches while volume t's results transfer
    and write on a saver thread — the device never waits on codecs or
    (remote-link) round-trip latency.

    Note: ``seg/prob*.npy`` written here holds float16-quantized values
    (the device->host prob-map transfer rides as f16 to halve bytes;
    ~5e-4 abs quantization, far below thresholding/correction-weight
    sensitivity).  ``predict_sparse``/``predict_instances_tiled`` return
    float32 prob maps."""
    import queue
    import threading

    tree = ResultsTree(results_folder)
    tree.make_dirs()
    t_max, t_min = get_t_range(images_path)
    work = list(volumes) if volumes is not None else \
        list(range(t_min, t_max + 1))
    if mesh is not None:
        if tile_shape is not None:
            raise ValueError(
                "mesh= and tile_shape= are mutually exclusive; shard "
                "tiles of huge volumes via predict_instances_sharded")
        # groups must fill the data axis so every device gets volumes
        axis = int(mesh.shape[data_axis])
        batch_size = -(-int(batch_size) // axis) * axis

    if transport not in ("u16", "u8"):
        raise ValueError(f"transport must be 'u16' or 'u8', got "
                         f"{transport!r}")

    def _load_raw(t):
        x = load_2d_slices_at_time(images_path, t=t, do_normalize=False)
        # the shared wire format (lossless u16 / opt-in lossy u8) —
        # ONE definition in io.imageio.transport_encode
        x, mi, ma = transport_encode(x, transport)
        if tile_shape is not None or mesh is not None:
            # tiled path: predict_instances_tiled pads + uploads the
            # volume itself (device-resident tile slicing); mesh path:
            # the stacked group is device_put with the batch sharding
            return x, float(mi), float(ma)
        # the h2d upload happens here ON the prefetch thread, overlapping
        # the (link-latency-bound) transfer with the previous volume's
        # dispatch and the saver's d2h
        return jnp.asarray(x), float(mi), float(ma)

    # 2 loader workers + 2 savers: every volume costs one h2d and one d2h
    # RPC whose ~100 ms is link LATENCY, not bandwidth or CPU — paired
    # threads overlap those waits (ThreadPoolExecutor releases the GIL in
    # the transfer calls), halving the steady-state wall per volume
    loader = VolumePrefetcher(_load_raw, work,
                              depth=prefetch_depth, workers=2)

    n_savers = 2
    save_q: "queue.Queue" = queue.Queue(maxsize=prefetch_depth + n_savers)
    errors = []

    def _write_one(t, finalized):
        (labels, details), prob_map = finalized
        tree.save_seg_coords(t, details["points"][:, [1, 2, 0]])
        tree.save_seg_prob(t, prob_map.transpose((1, 2, 0)))
        if t == t_min:
            save_volume_slices(labels.transpose((1, 2, 0)),
                               Path(results_folder) / "auto_vol1",
                               "auto_vol1_z%04i.tif")
        if progress_cb is not None:
            progress_cb(t)

    if tile_shape is not None:
        # zebrafish-scale recording driver: one tiled sweep per volume
        # (device-resident tile slicing, batched dispatch/fetch inside
        # predict_instances_tiled); the prefetch threads still overlap
        # the TIFF decode + percentile scan with the device sweep
        done_t = work[0] - 1
        it = iter(loader)
        try:
            while not (should_stop is not None and should_stop()):
                # the FileNotFoundError handler must cover ONLY the image
                # load (end-of-recording semantics) — a write failure
                # inside _write_one must propagate, not be misreported as
                # a missing input image (same as the batched loop below)
                try:
                    t, (x, mi, ma) = next(it)
                except StopIteration:
                    break
                except FileNotFoundError:
                    print(f"Warning: segmentation stopped; images at "
                          f"t={done_t + 1} cannot be loaded!")
                    break
                finalized = model.predict_instances_tiled(
                    x, tile_shape=tile_shape, shrink=shrink,
                    tile_candidates=tile_candidates,
                    tile_batch=tile_batch,
                    return_labels=(t == t_min), norm_minmax=(mi, ma))
                _write_one(t, finalized)
                done_t = t
        finally:
            loader.close()
        print(f"All images from t={work[0]} to t={done_t} "
              "have been segmented")
        return

    def saver():
        while True:
            item = save_q.get()
            if item is None:
                return
            ts, device_tuple = item
            try:
                # dists are never part of the seg artifacts — skipping
                # them saves ~100 KB/volume of d2h (max_candidates x
                # n_rays x f32)
                if isinstance(ts, tuple):
                    # batched: ONE fetch RPC for all B volumes
                    kept, probs, points, prob_map = jax.device_get(
                        (device_tuple[0], device_tuple[1],
                         device_tuple[3], device_tuple[4]))
                    for i, t in enumerate(ts):
                        _write_one(t, model._finalize_instances(
                            (kept[i], probs[i], None, points[i],
                             prob_map[i], None)))
                else:
                    kept, probs, points, prob_map, labels = jax.device_get(
                        (device_tuple[0], device_tuple[1], device_tuple[3],
                         device_tuple[4], device_tuple[5]))
                    _write_one(ts, model._finalize_instances(
                        (kept, probs, None, points, prob_map, labels)))
            except Exception as e:   # surface on the main thread
                errors.append(e)

    saver_threads = [threading.Thread(target=saver, daemon=True)
                     for _ in range(n_savers)]
    for th in saver_threads:
        th.start()
    done_t = work[0] - 1
    group: list = []

    def flush_group():
        nonlocal done_t
        if not group:
            return
        # partial tail groups pad up to batch_size by repeating the last
        # volume (outputs dropped): one program shape -> one remote
        # compile, instead of a fresh 10-30 s compile per tail size
        padded = group + [group[-1]] * (batch_size - len(group))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            xs = jax.device_put(
                np.stack([g[1] for g in padded]),
                NamedSharding(mesh, PartitionSpec(data_axis)))
        else:
            # the stack is a device-side op over already-uploaded volumes
            xs = jnp.stack([g[1] for g in padded])
        out = model._predict_batch_device(
            xs, [g[2] for g in padded], [g[3] for g in padded],
            mesh=mesh, data_axis=data_axis)
        save_q.put((tuple(g[0] for g in group), out))
        done_t = group[-1][0]
        group.clear()

    try:
        for t, (x, mi, ma) in loader:
            if should_stop is not None and should_stop():
                break
            if t == t_min:
                # labels are only persisted for vol 1 (auto_vol1); skipping
                # the render + 3-6 MB label transfer for every other volume
                # is the single biggest per-volume saving on a thin link
                save_q.put((t, model._predict_instances_device(
                    x, norm_minmax=(mi, ma), return_labels=True)))
                done_t = t
            else:
                # batch_size volumes per dispatch/fetch: the ~50 ms RPC
                # round-trip through the link amortizes across the batch
                group.append((t, x, mi, ma))
                if len(group) >= batch_size:
                    flush_group()
            if errors:
                break   # saver failed; surface its error after cleanup
                # (raising here would hit the FileNotFoundError handler
                # below and be misreported as a missing input image)
    except FileNotFoundError:
        flush_group()
        print(f"Warning: segmentation stopped; images at t={done_t + 1} "
              "cannot be loaded!")
    finally:
        loader.close()
        flush_group()
        for _ in saver_threads:
            save_q.put(None)
        for th in saver_threads:
            th.join()
    if errors:
        raise errors[0]
    print(f"All images from t={work[0]} to t={done_t} have been segmented")


def fill_label_holes(lbl: np.ndarray) -> np.ndarray:
    """Fill holes inside each labeled instance (csbdeep/stardist
    ``fill_label_holes``, used by ``stardistwrapper.py:180``)."""
    import scipy.ndimage as ndi

    out = lbl.copy()
    for sl, idx in zip(ndi.find_objects(lbl), range(1, lbl.max() + 1)):
        if sl is None:
            continue
        grown = tuple(slice(max(s.start - 1, 0), s.stop + 1) for s in sl)
        mask = lbl[grown] == idx
        filled = ndi.binary_fill_holes(mask)
        out[grown][filled] = idx
    return out


def load_training_images(path_train_images: str, path_train_labels: str,
                         max_projection: bool = True, plot: bool = True):
    """Load + normalize StarDist training volumes and split train/val
    (``stardistwrapper.load_training_images`` :168-211): sorted globs with
    matching filenames, per-volume 1/99.8 percentile normalization,
    label-hole filling, the single-volume duplication fallback, and the
    seeded 15% validation split.

    Returns (X, Y, X_trn, Y_trn, X_val, Y_val, n_channel)."""
    import sys as _sys
    from glob import glob

    from ..io.imageio import imread_volume, percentile_normalize

    X_paths = sorted(glob(path_train_images))
    Y_paths = sorted(glob(path_train_labels))
    assert len(X_paths) > 0 and len(Y_paths) > 0, \
        "Error: No images found in either X or Y."
    assert all(Path(x).name == Path(y).name
               for x, y in zip(X_paths, Y_paths)), \
        "Error: Filenames in X and Y do not match."
    X = [np.asarray(imread_volume(p)) for p in X_paths]
    Y = [np.asarray(imread_volume(p)) for p in Y_paths]
    n_channel = 1 if X[0].ndim == 3 else X[0].shape[-1]
    if n_channel > 1:
        print("Normalizing image channels independently.")
        _sys.stdout.flush()
    # normalize over (z, y, x); channels (if any) independently
    X = [percentile_normalize(x.astype(np.float32), 1, 99.8,
                              axis=(0, 1, 2) if x.ndim == 4 else None)
         for x in X]
    Y = [fill_label_holes(y.astype(np.int32)) for y in Y]
    if len(X) == 1:
        print("Warning: only one training data was provided! It will be "
              "used for both training and validation purposes!")
        X = [X[0], X[0]]
        Y = [Y[0], Y[0]]
    rng = np.random.RandomState(42)
    ind = rng.permutation(len(X))
    n_val = max(1, int(round(0.15 * len(ind))))
    ind_train, ind_val = ind[:-n_val], ind[-n_val:]
    X_val, Y_val = [X[i] for i in ind_val], [Y[i] for i in ind_val]
    X_trn, Y_trn = [X[i] for i in ind_train], [Y[i] for i in ind_train]
    print('number of images: %3d' % len(X))
    print('- training:       %3d' % len(X_trn))
    print('- validation:     %3d' % len(X_val))
    print(f"X[0].shape={X[0].shape}")
    if plot:
        from .. import viz
        img, lbl = X[0], Y[0]
        img = img if img.ndim == 3 else img[..., :3]
        if max_projection:
            viz.plot_img_label_max_projection(img, lbl)
        else:
            viz.plot_img_label_center_slice(img, lbl)
    return X, Y, X_trn, Y_trn, X_val, Y_val, n_channel


def save_arrays_to_folder(arrays: List[np.ndarray],
                          folder_path: Union[str, Path]) -> None:
    """Save arrays as ``coords%04i.npy`` (1-based) into ``folder_path``
    (``stardistwrapper.save_arrays_to_folder`` :149-165)."""
    path = Path(folder_path)
    path.mkdir(parents=True, exist_ok=True)
    for i, arr in enumerate(arrays):
        np.save(path / f"coords{i + 1:04d}.npy", arr)


def save_auto_seg_vol1(labels_xyz: np.ndarray,
                       results_folder: Union[str, Path]) -> None:
    """Write the vol-1 auto segmentation as per-z TIFFs
    (``stardistwrapper.save_auto_seg_vol1`` :140-146); labels in the
    pipeline's (x, y, z) frame."""
    save_volume_slices(labels_xyz, Path(results_folder) / "auto_vol1",
                       "auto_vol1_z%04i.tif")


def print_dict(my_dict: dict) -> None:
    """``stardistwrapper.print_dict`` (:284-286)."""
    for key, value in my_dict.items():
        print(f"{key}: {value}")


def configure(Y: List[np.ndarray], n_channel: int = 1,
              up_limit: int = UP_LIMIT) -> StarDistConfig:
    """Config heuristics from training labels
    (``stardistwrapper.configure`` :213-259): anisotropy from median
    instance extents, grid 2x on near-isotropic axes, 96 golden-spiral
    rays, patch size solved under the voxel budget and div_by constraints,
    square y/x patches."""
    extents = calculate_extents(Y)
    anisotropy = tuple(float(np.max(extents) / e) for e in extents)
    n_rays = 96
    grid = tuple(1 if a > 1.5 else 2 for a in anisotropy)

    a, b, c = anisotropy
    train_patch_size = np.cbrt(up_limit * a * b * c) / np.array([a, b, c])
    up_limit_xyz = (Y[0].shape[0], min(Y[0].shape[1:3]),
                    min(Y[0].shape[1:3]))
    scaling = np.min(np.asarray(up_limit_xyz) / train_patch_size)
    if scaling < 1:
        train_patch_size = train_patch_size * scaling
    unet_n_depth = 2
    unet_pool = (2, 2, 2)
    div_by = tuple(p ** unet_n_depth * g for p, g in zip(unet_pool, grid))
    train_patch_size = [int(d * (i // d))
                        for i, d in zip(train_patch_size, div_by)]
    train_patch_size[1] = train_patch_size[2] = min(train_patch_size[1:])

    return StarDistConfig(
        n_rays=n_rays, grid=grid, anisotropy=anisotropy,
        unet_n_depth=unet_n_depth, unet_pool=unet_pool,
        n_channel_in=n_channel,
        train_patch_size=tuple(train_patch_size))


def calculate_extents(Y: List[np.ndarray], func=np.median) -> np.ndarray:
    """Median per-axis instance extent over labeled volumes (stardist
    ``calculate_extents`` equivalent)."""
    import scipy.ndimage as ndi
    extents = []
    for y in Y:
        for sl in ndi.find_objects(y):
            if sl is None:
                continue
            extents.append([s.stop - s.start for s in sl])
    if not extents:
        return np.ones(3)
    return func(np.asarray(extents, np.float64), axis=0)
