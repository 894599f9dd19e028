"""3D U-Net training (reference ``unet3d.py:282-601``).

- ``divide_img``: 50%-overlap training-patch extraction (:282-307).
- Augmentation: per-sample random 2-D affine (rotation ±90°, shift ±0.2,
  shear ±0.2°, horizontal flip — the reference's Keras ImageDataGenerator
  settings, :477-478) applied identically to every z layer of the image AND
  its label (shared seed semantics of ``_augmentation_generator``
  :310-343), implemented as one vmapped ``map_coordinates`` resample on
  device instead of a per-z Keras generator loop.
- Training: jitted BCE/Adam steps, 60 steps/epoch, save weights whenever
  the validation loss improves, user picks the step (:543-588).
"""

from __future__ import annotations

import itertools
from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.lcn import normalize_image, normalize_label
from ..parallel.training import bce_from_probs, make_unet_train_step
from ..utils.checkpoint import load_pytree, save_pytree
from .unet3d import UNet3D


def divide_img(img: np.ndarray, unet_siz: Tuple[int, int, int]
               ) -> np.ndarray:
    """Reference ``_divide_img`` (unet3d.py:282-307): 50%-overlap patches,
    final partial windows snapped inside; returns (n, x, y, z, 1)."""
    x_siz, y_siz, z_siz = img.shape
    x_in, y_in, z_in = unet_siz
    out = []
    for i, j, k in itertools.product(range(x_siz * 2 // x_in),
                                     range(y_siz * 2 // y_in),
                                     range(z_siz * 2 // z_in)):
        ix = i * x_in // 2 if i * x_in // 2 + x_in <= x_siz else x_siz - x_in
        iy = j * y_in // 2 if j * y_in // 2 + y_in <= y_siz else y_siz - y_in
        iz = k * z_in // 2 if k * z_in // 2 + z_in <= z_siz else z_siz - z_in
        out.append(img[ix:ix + x_in, iy:iy + y_in, iz:iz + z_in])
    return np.expand_dims(np.asarray(out), axis=4)


def _affine_matrix(key, rotation_range=90.0, shift_range=0.2,
                   shear_range=0.2, horizontal_flip=True,
                   hw: Tuple[int, int] = (0, 0)):
    """Random 2-D affine in homogeneous coords (Keras apply_transform
    parameterization), centered at the image center."""
    h, w = hw
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    theta = jnp.deg2rad(jax.random.uniform(k1, (), minval=-rotation_range,
                                           maxval=rotation_range))
    tx = jax.random.uniform(k2, (), minval=-shift_range,
                            maxval=shift_range) * h
    ty = jax.random.uniform(k3, (), minval=-shift_range,
                            maxval=shift_range) * w
    shear = jnp.deg2rad(jax.random.uniform(k4, (), minval=-shear_range,
                                           maxval=shear_range))
    flip = jax.random.bernoulli(k5) & horizontal_flip

    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[cos_t, -jnp.sin(theta)], [sin_t, cos_t]])
    sh = jnp.array([[1.0, -jnp.sin(shear)], [0.0, jnp.cos(shear)]])
    m = rot @ sh
    flip_m = jnp.where(flip, jnp.array([[1.0, 0.0], [0.0, -1.0]]),
                       jnp.eye(2))
    m = m @ flip_m
    offset = jnp.array([tx, ty])
    return m, offset


def _apply_affine_2d(img2d, m, offset, order: int):
    """Inverse-warp a (h, w) image with reflect boundary."""
    h, w = img2d.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    src_y = m[0, 0] * yy + m[0, 1] * xx + cy + offset[0]
    src_x = m[1, 0] * yy + m[1, 1] * xx + cx + offset[1]
    coords = jnp.stack([jnp.broadcast_to(src_y, (h, w)),
                        jnp.broadcast_to(src_x, (h, w))])
    return jax.scipy.ndimage.map_coordinates(img2d, coords, order=order,
                                             mode="reflect")


def augment_batch(key, images: jax.Array, labels: jax.Array,
                  rotation_range=90.0, shift_range=0.2, shear_range=0.2,
                  horizontal_flip=True):
    """Apply one random 2-D affine per sample to every z layer of both
    image and label (shared-transform semantics)."""
    b, h, w, z, _ = images.shape
    keys = jax.random.split(key, b)

    def one(key_i, img, lab):
        m, off = _affine_matrix(key_i, rotation_range, shift_range,
                                shear_range, horizontal_flip, (h, w))
        img_t = jax.vmap(lambda sl: _apply_affine_2d(sl, m, off, 1),
                         in_axes=2, out_axes=2)(img[..., 0])
        lab_t = jax.vmap(lambda sl: _apply_affine_2d(sl, m, off, 1),
                         in_axes=2, out_axes=2)(
            lab[..., 0].astype(jnp.float32))
        # int truncation after bilinear interpolation is the REFERENCE
        # semantics (Keras flow assigns into an int32 array,
        # unet3d.py:336-342) — but there scipy interpolates in f64, so
        # mathematically-integer values survive the cast; our f32
        # weights sum to 0.99999994 and truncated 1-6% of interior label
        # pixels to 0.  The epsilon keeps truncation semantics for true
        # fractional boundary values while absorbing the float noise.
        return img_t[..., None], \
            (lab_t[..., None] + 1e-4).astype(jnp.int32)

    return jax.vmap(one)(keys, images, labels)


class TrainingUNet3D:
    """Reference ``TrainingUNet3D`` (unet3d.py:346-601) with the same folder
    layout and weight-selection workflow."""

    def __init__(self, noise_level: float, folder_path: Union[str, Path],
                 model: UNet3D, learning_rate: float = 1e-3, seed: int = 0,
                 batch_size: int = 8, mesh=None, config=None):
        """``mesh``: optional jax.sharding.Mesh — train steps shard the
        batch over (data, spatial) axes (parallel/training.py);
        ``batch_size`` must divide the data axis.  ``config``: optional
        :class:`t3dct.TrainUnetConfig` — overrides ``learning_rate`` /
        ``batch_size``, sets the default ``steps_per_epoch`` for
        :meth:`train`, and parameterizes the augmentation affines."""
        if config is not None:
            learning_rate = config.learning_rate
            batch_size = config.batch_size
        self.config = config
        self.noise_level = noise_level
        self.folder_path = Path(folder_path)
        self.model = model
        self.batch_size = batch_size
        for sub in ("train_image", "train_label", "valid_image",
                    "valid_label", "models"):
            (self.folder_path / sub).mkdir(parents=True, exist_ok=True)
        self.models_path = self.folder_path / "models"
        self.params, self.bn_state = model.init(jax.random.PRNGKey(seed))
        self.optimizer = optax.adam(learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        save_pytree((self.params, self.bn_state),
                    self.models_path / "weights_initial.npz")
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel.training import make_sharded_unet_train_step
            step, self._batch_sharding = make_sharded_unet_train_step(
                model, self.optimizer, mesh)
            # donation breaks the keep-weights-on-improvement workflow;
            # re-jit without it
            self._step = jax.jit(
                make_unet_train_step(model, self.optimizer),
                in_shardings=(None, None, None, self._batch_sharding,
                              self._batch_sharding))
        else:
            self._step = jax.jit(make_unet_train_step(model, self.optimizer))
        self._key = jax.random.PRNGKey(seed + 1)
        self.val_losses: List[float] = []
        self.train_image = self.train_label = None
        self.valid_image = self.valid_label = None

    # ---- data ----------------------------------------------------------------
    def load_dataset(self):
        from ..io.imageio import load_image
        self.train_image = load_image(str(self.folder_path / "train_image"))
        self.train_label = load_image(str(self.folder_path / "train_label"))
        self.valid_image = load_image(str(self.folder_path / "valid_image"))
        self.valid_label = load_image(str(self.folder_path / "valid_label"))

    def load_dataset_arrays(self, train_image, train_label, valid_image,
                            valid_label):
        self.train_image = np.asarray(train_image)
        self.train_label = np.asarray(train_label)
        self.valid_image = np.asarray(valid_image)
        self.valid_label = np.asarray(valid_label)

    def preprocess(self):
        norm = lambda im: np.asarray(normalize_image(im, self.noise_level))
        self.train_image_norm = norm(self.train_image)
        self.valid_image_norm = norm(self.valid_image)
        self.train_label_norm = np.asarray(normalize_label(self.train_label))
        self.valid_label_norm = np.asarray(normalize_label(self.valid_label))
        tile = self.model.tile_shape
        self.train_subimage = divide_img(self.train_image_norm, tile)
        self.valid_subimage = divide_img(self.valid_image_norm, tile)
        self.train_subcells = divide_img(self.train_label_norm, tile)
        self.valid_subcells = divide_img(self.valid_label_norm, tile)

    # ---- training -------------------------------------------------------------
    def _train_batch(self, rng_np: np.random.RandomState):
        n = self.train_subimage.shape[0]
        # exclusive upper bound (the final window is never drawn) is the
        # reference's own sampling (unet3d.py:337) — kept for parity
        start = rng_np.randint(0, max(n - self.batch_size, 1))
        imgs = jnp.asarray(
            self.train_subimage[start:start + self.batch_size], jnp.float32)
        labs = jnp.asarray(
            self.train_subcells[start:start + self.batch_size], jnp.int32)
        self._key, sub = jax.random.split(self._key)
        if self.config is not None:
            x, y = augment_batch(
                sub, imgs, labs,
                rotation_range=self.config.rotation_range,
                shift_range=self.config.shift_range,
                shear_range=self.config.shear_range,
                horizontal_flip=self.config.horizontal_flip)
        else:
            x, y = augment_batch(sub, imgs, labs)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
            y = jax.device_put(y, self._batch_sharding)
        return x, y

    # ---- inspection plots (unet3d.py:441-541, 590-601) -----------------------
    def draw_dataset(self, path=None):
        """Max projections of train/valid images + annotations
        (unet3d.py:441-459)."""
        return self._draw_four(self.train_image, self.train_label,
                               self.valid_image, self.valid_label, path)

    def draw_norm_dataset(self, path=None):
        """Same for the normalized data (unet3d.py:484-503)."""
        return self._draw_four(self.train_image_norm, self.train_label_norm,
                               self.valid_image_norm, self.valid_label_norm,
                               path)

    def draw_divided_train_data(self, n: int = 16, path=None, seed=0):
        """A grid of random training patches (unet3d.py:518-541)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        rng = np.random.RandomState(seed)
        idx = rng.randint(self.train_subimage.shape[0], size=n)
        fig, axs = plt.subplots(4, 8, figsize=(20, 10), squeeze=False)
        for i in range(min(n, 16)):
            r, c = divmod(i, 4)
            axs[r][2 * c].imshow(self.train_subimage[idx[i], :, :, :, 0]
                                 .max(axis=2), cmap="gray")
            axs[r][2 * c].axis("off")
            axs[r][2 * c + 1].imshow(self.train_subcells[idx[i], :, :, :, 0]
                                     .max(axis=2), cmap="gray")
            axs[r][2 * c + 1].axis("off")
        if path:
            fig.savefig(path)
            plt.close(fig)
        return fig

    def draw_prediction(self, path=None):
        """Current tiled prediction vs annotation (unet3d.py:590-601)."""
        from ..ops.tiling import tiled_apply

        def model_fn(batch):
            probs, _ = self.model.apply(self.params, self.bn_state,
                                        batch[..., None], train=False)
            return probs[..., 0]

        pred = np.asarray(tiled_apply(
            model_fn, jnp.asarray(self.train_image_norm, jnp.float32),
            self.model.tile_shape, (4, 4, 1)))
        return self._draw_four(self.train_image, pred > 0.5,
                               self.valid_image, self.valid_label, path)

    def _draw_four(self, a, b, c, d, path=None):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(2, 2, figsize=(14, 12))
        for ax, img in zip(axs.ravel(), (a, b, c, d)):
            ax.imshow(np.max(np.asarray(img), axis=2), cmap="gray")
        if path:
            fig.savefig(path)
            plt.close(fig)
        return fig

    def validation_loss(self) -> float:
        xs = jnp.asarray(self.valid_subimage, jnp.float32)
        ys = jnp.asarray(self.valid_subcells, jnp.float32)
        probs, _ = self.model.apply(self.params, self.bn_state, xs,
                                    train=False)
        return float(bce_from_probs(probs, ys))

    def train(self, iteration: int = 100, steps_per_epoch: int = None,
              weights_name: str = "weights_training_",
              verbose: bool = True):
        if steps_per_epoch is None:
            steps_per_epoch = (self.config.steps_per_epoch
                               if self.config is not None else 60)
        self.params, self.bn_state = load_pytree(
            (self.params, self.bn_state),
            self.models_path / "weights_initial.npz")
        self.opt_state = self.optimizer.init(self.params)
        # a retrain restarts from the initial weights, so the
        # keep-on-val-improvement comparison must restart too — carrying
        # the previous run's minimum would silently skip checkpoints
        self.val_losses = []
        rng_np = np.random.RandomState(0)
        for step in range(1, iteration + 1):
            for _ in range(steps_per_epoch):
                x, y = self._train_batch(rng_np)
                self.params, self.bn_state, self.opt_state, loss = \
                    self._step(self.params, self.bn_state, self.opt_state,
                               x, y.astype(jnp.float32))
            val = self.validation_loss()
            if step == 1 or val < min(self.val_losses):
                if verbose:
                    prev = min(self.val_losses) if self.val_losses else None
                    print(f"step {step}: val_loss improved to {val:.4f}"
                          + (f" (from {prev:.4f})" if prev else ""))
                save_pytree((self.params, self.bn_state),
                            self.models_path /
                            f"{weights_name}step{step}.npz")
            self.val_losses.append(val)
        return self.val_losses

    def select_weights(self, step: int,
                       weights_name: str = "weights_training_"):
        self.params, self.bn_state = load_pytree(
            (self.params, self.bn_state),
            self.models_path / f"{weights_name}step{step}.npz")
        save_pytree((self.params, self.bn_state),
                    self.models_path / "unet3_pretrained.npz")
