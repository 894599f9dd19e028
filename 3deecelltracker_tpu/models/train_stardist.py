"""StarDist3D training (reference trains via stardist's Keras ``fit``;
config heuristics from ``stardistwrapper.py:213-281``, augmenter
:330-364).

Pipeline: random patches of ``train_patch_size`` from (image, label)
volumes -> yx fliprot + intensity augmentation (the reference augmenter) ->
device GT generation (``edt_prob`` + ``star_dist3d`` subsampled by grid) ->
jitted loss/Adam step with stardist's composite loss: BCE on object
probability + prob-weighted MAE on ray distances (weights 1 : 0.2).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import StarDistConfig
from ..ops.rays import rays_golden_spiral
from ..ops.stardist_gt import edt_prob, star_dist3d
from ..utils.checkpoint import load_pytree, save_pytree
from .stardist3d import StarDist3DNet


def random_fliprot(img: np.ndarray, mask: np.ndarray,
                   rng: np.random.RandomState,
                   axis=(1, 2)) -> Tuple[np.ndarray, np.ndarray]:
    """yx permutation + flips (``stardistwrapper.py:330-348``)."""
    perm = tuple(rng.permutation(axis))
    transpose_axis = np.arange(mask.ndim)
    for a, p in zip(axis, perm):
        transpose_axis[a] = p
    img = img.transpose(tuple(transpose_axis))
    mask = mask.transpose(tuple(transpose_axis))
    for ax in axis:
        if rng.rand() > 0.5:
            img = np.flip(img, axis=ax)
            mask = np.flip(mask, axis=ax)
    return img, mask


def random_intensity_change(img: np.ndarray,
                            rng: np.random.RandomState) -> np.ndarray:
    """``stardistwrapper.py:350-352``."""
    return img * rng.uniform(0.6, 2.0) + rng.uniform(-0.2, 0.2)


def augmenter(x: np.ndarray, y: np.ndarray,
              rng: np.random.RandomState) -> Tuple[np.ndarray, np.ndarray]:
    """``stardistwrapper.augmenter`` (:355-364)."""
    x, y = random_fliprot(x, y, rng)
    x = random_intensity_change(x, rng)
    return x, y


class TrainStarDist3D:
    """Trainer for :class:`engine.stardist.StarDist3D` models."""

    def __init__(self, config: StarDistConfig,
                 basedir: Union[str, Path] = "stardist_models",
                 model_name: str = "stardist",
                 learning_rate: float = 3e-4,
                 dist_loss_weight: float = 0.2,
                 max_dist: int = 32, seed: int = 0,
                 batch_size: int = 2,
                 prob_fg_weight: float = 1.0,
                 background_reg: float = 1e-4,
                 foreground_prob: float = 0.9,
                 mesh=None, data_axis: str = "data"):
        """``batch_size``: patches per step (reference train_batch_size=2,
        stardistwrapper.py:258).  ``mesh``: optional jax.sharding.Mesh — the
        patch batch is sharded over ``data_axis`` (params replicated,
        gradients all-reduced by XLA SPMD).

        ``background_reg``: stardist's ``train_background_reg`` (default
        1e-4; printed config in the reference's
        Examples/use_stardist/train_stardist.ipynb): an L1 penalty
        ``reg * mean((1 - prob_gt) * |dist_pred|)`` pulling predicted ray
        distances toward 0 off-foreground.  Without it the dist head is
        unconstrained wherever ``prob_gt`` ~ 0, and its overshoot there
        makes NMS merge neighboring instances once training runs long
        (measured at worm scale: detections collapse 111 -> ~35 after 16+
        epochs with reg 0).

        ``foreground_prob``: stardist's ``train_foreground_only`` (default
        0.9, same printed config): this fraction of training patches is
        guaranteed to contain foreground, by sampling a random foreground
        voxel and a patch window containing it (foreground indices cached
        per volume, stardist's ``train_sample_cache``).  At <1% foreground
        a uniform sampler feeds mostly empty patches.

        ``prob_fg_weight``: foreground weight in the prob BCE (weighted
        sum normalized by the total weight).  1.0 = the reference's plain
        mean BCE (stardist's default loss).  Worm-like scenes have <1%
        foreground voxels, where plain mean BCE collapses to the all-zero
        trivial solution under short training budgets (measured: 240
        steps at worm scale predicts prob<=0.06 everywhere); a weight of
        O(1/fg_fraction) (e.g. 64) makes the same budget converge.  An
        EXTENSION knob, not a reference behavior change."""
        self.config = config
        self.net = StarDist3DNet(config)
        self.params = self.net.init(jax.random.PRNGKey(seed))
        # inject_hyperparams keeps the learning rate in opt_state so
        # ReduceLROnPlateau can rescale it between epochs without
        # retracing.  b1/b2/eps stay STATIC python floats: injecting them
        # as f32 state changes adam's bias correction (b1**count powers in
        # f32 instead of f64) enough to train a measurably different model
        self.optimizer = optax.inject_hyperparams(
            optax.adam, static_args=("b1", "b2", "eps"))(
            learning_rate=learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        self.rays = jnp.asarray(
            rays_golden_spiral(config.n_rays, config.anisotropy))
        self.dist_loss_weight = dist_loss_weight
        self.prob_fg_weight = float(prob_fg_weight)
        self.background_reg = float(background_reg)
        self.foreground_prob = float(foreground_prob)
        self._fg_cache = {}      # id(label volume) -> (volume, fg coords)
        self.max_dist = max_dist
        self.basedir = Path(basedir)
        self.model_name = model_name
        self.rng = np.random.RandomState(seed)
        self.batch_size = int(batch_size)
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P(data_axis))
            self._step = jax.jit(
                self._train_step,
                in_shardings=(replicated, replicated,
                              self._batch_sharding, self._batch_sharding,
                              self._batch_sharding),
                out_shardings=(replicated, replicated, replicated))
        else:
            self._step = jax.jit(self._train_step)
        self._make_gt = jax.jit(jax.vmap(self._gt_impl))
        self._eval_loss = None
        self.val_losses: List[float] = []

    # ---- GT -------------------------------------------------------------
    def _gt_impl(self, labels):
        gz, gy, gx = self.config.grid
        prob_gt = edt_prob(labels, max_labels=512,
                           anisotropy=self.config.anisotropy)
        dist_gt = star_dist3d(labels, self.rays, max_dist=self.max_dist)
        return prob_gt[::gz, ::gy, ::gx], dist_gt[::gz, ::gy, ::gx]

    # ---- loss -----------------------------------------------------------
    def _loss(self, params, x, prob_gt, dist_gt):
        """x: (b, z, y, x); prob_gt: (b, gz, gy, gx); dist_gt: (..., rays)."""
        prob, dist = self.net.apply(params, x[..., None])
        prob = prob[..., 0]
        eps = 1e-7
        p = jnp.clip(prob, eps, 1 - eps)
        y = prob_gt
        bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
        if self.prob_fg_weight != 1.0:
            w_fg = 1.0 + (self.prob_fg_weight - 1.0) * (y > 0)
            loss_prob = jnp.sum(w_fg * bce) / jnp.sum(w_fg)
        else:
            loss_prob = jnp.mean(bce)
        w = prob_gt[..., None]
        loss_dist = jnp.sum(w * jnp.abs(dist - dist_gt)) / \
            (jnp.sum(w) * dist.shape[-1] + eps)
        if self.background_reg > 0:
            # stardist generic_masked_loss reg term: the prob-GT weighting
            # leaves dist unconstrained off-foreground; pull it to 0 there
            loss_dist = loss_dist + self.background_reg * jnp.mean(
                (1.0 - w) * jnp.abs(dist))
        return loss_prob + self.dist_loss_weight * loss_dist

    def _train_step(self, params, opt_state, x, prob_gt, dist_gt):
        loss, grads = jax.value_and_grad(self._loss)(params, x, prob_gt,
                                                     dist_gt)
        updates, new_opt = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    # ---- data ------------------------------------------------------------
    def _fg_indices(self, y: np.ndarray) -> np.ndarray:
        """Cached foreground voxel coordinates of a label volume
        (stardist's ``train_sample_cache``).  The cache is scoped to one
        :meth:`train` call (cleared on entry and exit, ADVICE r4): within
        a call the stored strong reference keeps ``y`` alive, so the
        ``is``-identity guard below cannot be defeated by id() reuse, and
        repeated ``train()`` calls with fresh arrays cannot grow memory."""
        cached = self._fg_cache.get(id(y))
        if cached is None or cached[0] is not y:
            self._fg_cache[id(y)] = (y, np.argwhere(y > 0))
            cached = self._fg_cache[id(y)]
        return cached[1]

    def _sample_patch(self, X: List[np.ndarray], Y: List[np.ndarray]):
        i = self.rng.randint(len(X))
        x, y = X[i], Y[i]
        patch = self.config.train_patch_size
        starts = None
        if self.foreground_prob > 0 and \
                self.rng.rand() < self.foreground_prob:
            fg = self._fg_indices(y)
            if len(fg):
                # a patch window chosen uniformly among those containing a
                # randomly drawn foreground voxel (train_foreground_only)
                c = fg[self.rng.randint(len(fg))]
                starts = [self.rng.randint(max(0, cc - p + 1),
                                           min(cc, s - p) + 1)
                          for cc, p, s in zip(c, patch, y.shape)]
        if starts is None:
            starts = [self.rng.randint(0, max(s - p, 0) + 1)
                      for p, s in zip(patch, y.shape)]
        sz, sy, sx = starts
        pz, py, px = patch
        xp = x[sz:sz + pz, sy:sy + py, sx:sx + px]
        yp = y[sz:sz + pz, sy:sy + py, sx:sx + px]
        return augmenter(xp.astype(np.float32), yp.astype(np.int32),
                         self.rng)

    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def _val_loss(self, val_batches) -> float:
        if self._eval_loss is None:
            self._eval_loss = jax.jit(self._loss)
        return float(np.mean([
            float(self._eval_loss(self.params, xb, pg, dg))
            for xb, pg, dg in val_batches]))

    # ---- loop ------------------------------------------------------------
    def train(self, X: List[np.ndarray], Y: List[np.ndarray],
              epochs: int = 10, steps_per_epoch: int = 100,
              X_val: Optional[List[np.ndarray]] = None,
              Y_val: Optional[List[np.ndarray]] = None,
              lr_reduce_factor: float = 0.5, lr_patience: int = 40,
              n_val_batches: int = 4, keep_best: bool = True,
              verbose: bool = True) -> List[float]:
        """Reference training protocol (Keras ``model.train`` with
        stardist's default callbacks): optional validation volumes give a
        per-epoch val loss, ``ReduceLROnPlateau(factor, patience)`` on it,
        and best-val weights are kept (ModelCheckpoint save_best_only).
        Without X_val this is the plain loop."""
        for x, y in zip(X, Y):
            for s, p in zip(x.shape, self.config.train_patch_size):
                if s < p:
                    raise ValueError(
                        f"volume shape {x.shape} smaller than patch "
                        f"{self.config.train_patch_size}")
        self._fg_cache.clear()       # scope the fg-index cache to this call
        val_batches = []
        if X_val is not None:
            val_rng_state = self.rng.get_state()
            self.rng.seed(12345)         # fixed val patches across epochs
            for _ in range(n_val_batches):
                pairs = [self._sample_patch(X_val, Y_val)
                         for _ in range(self.batch_size)]
                xb = jnp.asarray(np.stack(
                    [np.ascontiguousarray(x) for x, _ in pairs]))
                yb = jnp.asarray(np.stack(
                    [np.ascontiguousarray(y) for _, y in pairs]))
                pg, dg = self._make_gt(yb)
                val_batches.append((xb, pg, dg))
            self.rng.set_state(val_rng_state)
        self.val_losses: List[float] = []
        best_val, best_params, plateau = np.inf, None, 0
        losses = []
        for epoch in range(1, epochs + 1):
            # losses stay ON DEVICE until the epoch ends: float(loss)
            # per step forces a blocking round-trip that serializes
            # dispatch -> compute -> fetch (measured 4.5 s/step through
            # the tunneled dev link vs ~0.3 s with the per-epoch sync)
            step_losses = []
            for _ in range(steps_per_epoch):
                pairs = [self._sample_patch(X, Y)
                         for _ in range(self.batch_size)]
                xb = jnp.asarray(np.stack(
                    [np.ascontiguousarray(x) for x, _ in pairs]))
                yb = jnp.asarray(np.stack(
                    [np.ascontiguousarray(y) for _, y in pairs]))
                prob_gt, dist_gt = self._make_gt(yb)
                if self._batch_sharding is not None:
                    import jax as _jax
                    xb = _jax.device_put(xb, self._batch_sharding)
                    prob_gt = _jax.device_put(prob_gt,
                                              self._batch_sharding)
                    dist_gt = _jax.device_put(dist_gt,
                                              self._batch_sharding)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, xb, prob_gt, dist_gt)
                step_losses.append(loss)
            total = float(jax.device_get(
                jnp.sum(jnp.stack(step_losses))))
            losses.append(total / steps_per_epoch)
            msg = f"epoch {epoch}: loss {losses[-1]:.4f}"
            if val_batches:
                vl = self._val_loss(val_batches)
                self.val_losses.append(vl)
                msg += f", val_loss {vl:.4f}, lr {self.learning_rate:.2e}"
                if vl < best_val - 1e-9:
                    best_val, plateau = vl, 0
                    if keep_best:
                        best_params = jax.tree_util.tree_map(
                            lambda a: np.asarray(a), self.params)
                else:
                    plateau += 1
                    if plateau >= lr_patience:
                        self.opt_state.hyperparams["learning_rate"] = \
                            jnp.asarray(self.learning_rate
                                        * lr_reduce_factor, jnp.float32)
                        plateau = 0
                        msg += " (lr reduced)"
            if verbose:
                print(msg)
        if keep_best and best_params is not None:
            self.params = jax.tree_util.tree_map(jnp.asarray, best_params)
        self._fg_cache.clear()       # release the label-volume references
        self.save()
        return losses

    def save(self) -> None:
        from ..engine.stardist import StarDist3D
        model = StarDist3D(self.config, params=self.params)
        model.save(self.basedir / self.model_name)

    def load(self) -> None:
        self.params = load_pytree(
            self.params, self.basedir / self.model_name / "weights.npz")
