"""FFN matcher training (reference ``ffn.py:91-222``).

Per-iteration pipeline: host synthesizes matched / seg-error / mismatched
point clouds (``synthesize.py`` semantics), the device builds kNN features
and runs the jitted BCE train step.  Like the reference, one "set" yields
2n samples — n positive pairs (label False where the point was replaced by
a seg error) and n negative pairs from mismatched partners; sides are
swapped with p=0.5.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.knn import knn_feature_vectors_cross
from ..ops.pointset import normalize_points
from ..utils.checkpoint import save_pytree, load_pytree
from .ffn import FFN, ffn_apply
from .synthesize import add_seg_errors, affine_transform, no_match_points

FFN_WEIGHTS_NAME = "weights_training_"
AFFINE_LEVEL = 0.2           # ffn.py:23
RAND_MOVE_LEVEL = 0.001      # ffn.py:24
BATCH_SIZE = 128             # ffn.py:25
RATIO_SEG_ERROR = 0.15       # ffn.py:18
K_PTRS = 20                  # ffn.py:20
NUM_SETS = 20                # ffn.py:127


def bce_loss(logistic_out: jax.Array, labels: jax.Array,
             eps: float = 1e-7) -> jax.Array:
    p = jnp.clip(logistic_out, eps, 1 - eps)
    y = labels.astype(p.dtype)
    return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))


class DataGeneratorFFN:
    """Reference ``DataGeneratorFFN`` (ffn.py:91-145): infinite batches of
    (x (b, 122), y (b, 1))."""

    def __init__(self, points_normalized: np.ndarray, seed: int = 0,
                 batch_size: int = BATCH_SIZE, num_sets: int = NUM_SETS,
                 config=None):
        """``config``: optional :class:`t3dct.TrainFfnConfig` — overrides
        the batch/synthesis knobs (batch_size, num_sets, affine_level,
        random_movement_level, ratio_seg_error, kde_bandwidth)."""
        self.points = np.asarray(points_normalized, np.float32)
        self.rng = np.random.RandomState(seed)
        if config is not None:
            batch_size = config.batch_size
            num_sets = config.num_sets
            self.affine_level = config.affine_level
            self.random_movement_level = config.random_movement_level
            self.ratio_seg_error = config.ratio_seg_error
            self.kde_bandwidth = config.kde_bandwidth
        else:
            self.affine_level = AFFINE_LEVEL
            self.random_movement_level = RAND_MOVE_LEVEL
            self.ratio_seg_error = RATIO_SEG_ERROR
            self.kde_bandwidth = 0.1
        self.batch_size = batch_size
        self.num_sets = num_sets
        self._features = jax.jit(knn_feature_vectors_cross,
                                 static_argnames=("k",))

    def _one_set(self) -> Tuple[np.ndarray, np.ndarray]:
        pts = self.points
        n = pts.shape[0]
        tgt = affine_transform(pts, self.affine_level,
                               self.random_movement_level,
                               self.rng).astype(np.float32)
        with_err, replaced = add_seg_errors(tgt, self.ratio_seg_error,
                                            bandwidth=self.kde_bandwidth,
                                            rng=self.rng)
        with_err = with_err.astype(np.float32)
        no_match = no_match_points(n, with_err, self.rng)

        f_a = np.asarray(self._features(pts, pts, K_PTRS))
        f_match = np.asarray(self._features(with_err, with_err, K_PTRS))
        f_nomatch = np.asarray(self._features(with_err, no_match, K_PTRS))

        feats_a = np.vstack([f_a, f_a])
        feats_b = np.vstack([f_match, f_nomatch])
        if self.rng.rand() > 0.5:
            feats_a, feats_b = feats_b, feats_a
        x = np.concatenate([feats_a, feats_b], axis=1)
        y = np.zeros((2 * n, 1), np.float32)
        y[:n] = 1.0
        y[:n][replaced] = 0.0
        return x, y

    def __iter__(self):
        while True:
            xs, ys = [], []
            for _ in range(self.num_sets):
                x, y = self._one_set()
                xs.append(x)
                ys.append(y)
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            order = self.rng.permutation(x.shape[0])
            x, y = x[order], y[order]
            for i in range(x.shape[0] // self.batch_size):
                s = slice(i * self.batch_size, (i + 1) * self.batch_size)
                yield x[s], y[s]


class TrainFFN:
    """Reference ``TrainFFN`` (ffn.py:148-222)."""

    def __init__(self, model_name: str,
                 points1_path: Optional[str] = None,
                 segmentation1_path: Optional[str] = None,
                 voxel_size=(1, 1, 1),
                 basedir: Union[str, Path] = "./ffn_models",
                 learning_rate: float = 1e-3, seed: int = 0,
                 config=None, mesh=None, data_axis: str = "data"):
        """``config``: optional :class:`t3dct.TrainFfnConfig` — overrides
        ``learning_rate``, sets :meth:`train`'s default iterations/epoch,
        and parameterizes the synthesis generator.

        ``mesh``: optional ``jax.sharding.Mesh`` — the sample batch is
        sharded over ``data_axis`` (params/BN state replicated, gradients
        and batch-norm statistics all-reduced by XLA SPMD: the BN mean/var
        reductions run over the FULL logical batch, so the sharded step
        computes the same model as the single-device one).  The batch
        size must divide by the axis size.  Data-parallel counterpart of
        ``TrainStarDist3D(mesh=)`` / ``TrainingUNet3D`` (VERDICT r4 #7);
        reference training loop being scaled: ffn.py:185-214."""
        if config is not None:
            learning_rate = config.learning_rate
        self.config = config
        self.path_model = Path(basedir)
        (self.path_model / "weights").mkdir(exist_ok=True, parents=True)
        self.model_name = model_name
        self.current_epoch = 1
        self.ffn = FFN()
        self.params, self.bn_state = self.ffn.init(jax.random.PRNGKey(seed))
        self.optimizer = optax.adam(learning_rate)
        self.opt_state = self.optimizer.init(self.params)

        if points1_path is not None:
            pts = np.loadtxt(points1_path)
        elif segmentation1_path is not None:
            from glob import glob
            from ..io.imageio import imread_stack
            from ..ops.segment_reduce import center_of_mass
            paths = sorted(glob(segmentation1_path))
            if len(paths) == 0:
                raise FileNotFoundError(
                    f"No image in {segmentation1_path} was found")
            seg = imread_stack(paths).transpose(1, 2, 0).astype(np.int32)
            n = int(seg.max())
            com = np.asarray(center_of_mass(
                jnp.asarray(seg > 0, jnp.float32), jnp.asarray(seg), n))
            pts = com * np.asarray(voxel_size)[None, :]
        else:
            raise ValueError(
                "Either segmentation1_path or points1_path is required")

        norm, _ = normalize_points(jnp.asarray(pts, jnp.float32))
        self.points_t1 = np.asarray(norm)
        self.points_generator = DataGeneratorFFN(self.points_t1, seed=seed,
                                                 config=config)
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = int(mesh.shape[data_axis])
            if self.points_generator.batch_size % axis:
                raise ValueError(
                    f"batch_size {self.points_generator.batch_size} must "
                    f"divide by the mesh's {data_axis!r} axis ({axis})")
            replicated = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P(data_axis))
            self._train_step = jax.jit(
                self._train_step_impl,
                in_shardings=(replicated, replicated, replicated,
                              self._batch_sharding, self._batch_sharding),
                out_shardings=(replicated, replicated, replicated,
                               replicated))
        else:
            self._train_step = jax.jit(self._train_step_impl)

    def _train_step_impl(self, params, bn_state, opt_state, x, y):
        def loss_fn(p, s):
            out, new_s = ffn_apply(p, s, x, train=True)
            return bce_loss(out, y), new_s

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, bn_state)
        updates, new_opt = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bn, new_opt, loss

    def train(self, num_epochs: int = 10, iteration: int = None,
              weights_name: str = FFN_WEIGHTS_NAME,
              verbose: bool = True) -> list:
        if iteration is None:
            iteration = (self.config.iterations_per_epoch
                         if self.config is not None else 5000)
        losses = []
        gen = iter(self.points_generator)
        end_epoch = self.current_epoch + num_epochs
        for epoch in range(self.current_epoch, end_epoch):
            # losses stay ON DEVICE until the epoch ends: float(loss)
            # per step is a blocking round-trip that serializes the
            # pipeline through a remote device link (see
            # train_stardist.py for the measured cost)
            step_losses, n = [], 0
            for x, y in gen:
                if self._batch_sharding is not None:
                    x = jax.device_put(x, self._batch_sharding)
                    y = jax.device_put(y, self._batch_sharding)
                else:
                    x, y = jnp.asarray(x), jnp.asarray(y)
                self.params, self.bn_state, self.opt_state, loss = \
                    self._train_step(self.params, self.bn_state,
                                     self.opt_state, x, y)
                step_losses.append(loss)
                n += 1
                if n > iteration:   # iteration+1 steps/epoch — the
                    break           # reference's own loop (ffn.py:208)
            total = float(jax.device_get(jnp.sum(jnp.stack(step_losses)))
                          ) if step_losses else 0.0
            losses.append(total / max(n, 1))
            if verbose:
                print(f"Epoch {epoch}: train loss {losses[-1]:.4f}")
            save_pytree((self.params, self.bn_state),
                        self.path_model / "weights" /
                        f"{weights_name}_epoch{epoch}.npz")
            self.current_epoch += 1
        save_pytree((self.params, self.bn_state),
                    self.path_model / (self.model_name + ".npz"))
        return losses

    def select_ffn_weights(self, step: int,
                           weights_name: str = FFN_WEIGHTS_NAME) -> None:
        if step <= 0:
            raise ValueError("step should be an integer >= 1")
        self.params, self.bn_state = load_pytree(
            (self.params, self.bn_state),
            self.path_model / "weights" / f"{weights_name}_epoch{step}.npz")
        print(f"Loaded the trained FFN model at step {step}")
