"""3D U-Net family for binary cell/background segmentation.

Functional rebuild of the reference's three Keras architectures
(``unet3d.py:26-98``):

- ``unet3_a``: depth-3, tile (160,160,16), pool (2,2,1), conv+LeakyReLU+BN,
  filters 8→64 (eLife 2021 fig. 2-S1a).
- ``unet3_b``: depth-2, tile (96,96,8), pool (2,2,1), conv(ReLU)+BN,
  filters 64→256.
- ``unet3_c``: depth-3 isotropic, tile (64,64,64), pool (2,2,2).

All three end in a 1-channel 1×1×1 sigmoid conv.  BatchNorm is applied AFTER
the activation, exactly as the reference blocks do
(``_conv3d_leakyrelu_bn`` unet3d.py:101-121, ``_conv3d_relu_bn`` :123-141).

The network is fully convolutional: ``apply`` accepts any (b, x, y, z, 1)
tile; the canonical tile shape is carried as metadata for the tile-and-stitch
driver (``ops/tiling.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UNet3D:
    """Static architecture spec; parameters live in a separate pytree."""
    variant: str = "a"                      # 'a' | 'b' | 'c'
    tile_shape: Tuple[int, int, int] = (160, 160, 16)
    pool: Tuple[int, int, int] = (2, 2, 1)
    depth: int = 3
    # (down_filters per level, up_filters per level, head_filters)
    down_filters: Tuple[Tuple[int, int], ...] = ((8, 16), (16, 32), (32, 64))
    up_filters: Tuple[Tuple[int, int], ...] = ((64, 64), (32, 32), (16, 16))
    head_filters: Tuple[int, ...] = (8, 8)
    activation: str = "leaky_relu"          # 'leaky_relu' | 'relu'

    # ---- init ---------------------------------------------------------------
    def init(self, key: jax.Array, c_in: int = 1) -> Tuple[Params, State]:
        params: Params = {}
        state: State = {}
        keys = iter(jax.random.split(key, 64))

        def block(name, cin, cout):
            params[name] = {"conv": L.init_conv3d(next(keys), (3, 3, 3),
                                                  cin, cout)}
            bn_p, bn_s = L.init_bn(cout)
            params[name]["bn"] = bn_p
            state[name] = bn_s
            return cout

        c = c_in
        skip_channels: List[int] = []
        for lvl, (f1, f2) in enumerate(self.down_filters):
            c = block(f"down{lvl}_0", c, f1)
            c = block(f"down{lvl}_1", f1, f2)
            skip_channels.append(f2)
        # bottom-up path: each up level transforms then upsamples + concat
        for i, (f1, f2) in enumerate(self.up_filters):
            c = block(f"up{i}_0", c, f1)
            c = block(f"up{i}_1", f1, f2)
            c = f2 + skip_channels[len(self.up_filters) - 1 - i]
        for i, f in enumerate(self.head_filters):
            c = block(f"head{i}", c, f)
        params["out"] = {"conv": L.init_conv3d(next(keys), (1, 1, 1), c, 1)}
        return params, state

    # ---- apply --------------------------------------------------------------
    def apply(self, params: Params, state: State, x: jax.Array,
              train: bool = False,
              compute_dtype=jnp.float32) -> Tuple[jax.Array, State]:
        """Forward pass. x: (b, x, y, z, c) -> sigmoid probs (b, x, y, z, 1)."""
        act = (L.leaky_relu if self.activation == "leaky_relu"
               else jax.nn.relu)
        new_state: State = {}

        def block(name, h):
            h = L.conv3d(params[name]["conv"], h, compute_dtype)
            h = act(h)
            h, new_state[name] = L.batchnorm(params[name]["bn"], state[name],
                                             h, train)
            return h

        skips = []
        h = x
        for lvl in range(len(self.down_filters)):
            h = block(f"down{lvl}_0", h)
            h = block(f"down{lvl}_1", h)
            skips.append(h)
            h = L.max_pool3d(h, self.pool)

        for i in range(len(self.up_filters)):
            h = block(f"up{i}_0", h)
            h = block(f"up{i}_1", h)
            h = L.upsample3d(h, self.pool)
            skip = skips[len(self.up_filters) - 1 - i]
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)

        for i in range(len(self.head_filters)):
            h = block(f"head{i}", h)

        logits_in = L.conv3d(params["out"]["conv"], h, compute_dtype)
        probs = jax.nn.sigmoid(logits_in)
        return probs, (new_state if train else state)

    def receptive_radius(self) -> Tuple[int, int, int]:
        """Per-axis receptive radius of :meth:`apply`: an output voxel
        farther than this from a region boundary is unaffected by
        anything beyond it.  Counts the two 3^3 convs per down/up level
        (each +1 at that level's stride), the pool windows
        (+(pool-1)*stride), and the full-resolution head convs — the
        sound halo for :func:`t3dct.parallel.spatial.
        make_spatially_sharded_apply` (exact interior)."""
        n_levels = len(self.down_filters)
        radii = []
        for d in range(3):
            p = self.pool[d]
            r = 0
            for lvl in range(n_levels):
                r += 2 * p ** lvl            # two 3^3 convs per down level
                r += (p - 1) * p ** lvl      # pool window
            for i in range(len(self.up_filters)):
                r += 2 * p ** (n_levels - i)  # two convs before upsample
            r += len(self.head_filters)      # full-res head convs
            radii.append(r)
        return tuple(radii)

    # Convenience: volume-level tiled prediction driver lives in
    # engine/segmentation.py to keep the model purely functional.


def unet3_a() -> UNet3D:
    """Reference ``unet3_a`` (unet3d.py:26-37)."""
    return UNet3D(variant="a", tile_shape=(160, 160, 16), pool=(2, 2, 1),
                  down_filters=((8, 16), (16, 32), (32, 64)),
                  up_filters=((64, 64), (32, 32), (16, 16)),
                  head_filters=(8, 8), activation="leaky_relu")


def unet3_b() -> UNet3D:
    """Reference ``unet3_b`` (unet3d.py:40-67)."""
    return UNet3D(variant="b", tile_shape=(96, 96, 8), pool=(2, 2, 1),
                  down_filters=((64, 64), (128, 128)),
                  up_filters=((256, 256), (128, 128)),
                  head_filters=(64, 64), activation="relu")


def unet3_c() -> UNet3D:
    """Reference ``unet3_c`` (unet3d.py:70-81)."""
    return UNet3D(variant="c", tile_shape=(64, 64, 64), pool=(2, 2, 2),
                  down_filters=((8, 16), (16, 32), (32, 64)),
                  up_filters=((64, 64), (32, 32), (16, 16)),
                  head_filters=(8, 8), activation="leaky_relu")


def get_unet(variant: str) -> UNet3D:
    return {"a": unet3_a, "b": unet3_b, "c": unet3_c}[variant]()
