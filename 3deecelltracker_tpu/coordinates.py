"""Coordinate frames for cell centers.

Reimplements the three-frame ``Coordinates`` value class of the reference
(``coord_image_transformer.py:29-141``) as a JAX pytree so whole point sets
stay device-resident through the tracking recurrence:

- ``raw``    — voxel coordinates in the original image grid (x, y, z).
- ``real``   — physically scaled coordinates: ``raw * voxel_size``
               (used for all matching / registration math).
- ``interp`` — z axis multiplied by ``interpolation_factor``
               (used for image-space operations on interpolated labels).

The reference stores float32 ``_raw`` and rounds on access; we keep the same
semantics (``raw``/``interp`` properties round to int32) so downstream
image-space scatters land on the identical voxels.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Coordinates:
    """An (n, 3) point set with raw / real / interp views.

    ``raw_f32`` is the leaf (traced) array; ``interpolation_factor`` and
    ``voxel_size`` are static metadata so jitted functions specialize on them
    exactly like the reference's Python attributes.
    """

    raw_f32: jax.Array
    interpolation_factor: int = dataclasses.field(metadata=dict(static=True))
    voxel_size: Tuple[float, float, float] = dataclasses.field(
        metadata=dict(static=True)
    )

    # ---- constructors -----------------------------------------------------
    @staticmethod
    def from_raw(coords: Array, interpolation_factor: int,
                 voxel_size) -> "Coordinates":
        return Coordinates(jnp.asarray(coords, jnp.float32),
                           int(interpolation_factor),
                           _as_tuple3(voxel_size))

    @staticmethod
    def from_real(coords: Array, interpolation_factor: int,
                  voxel_size) -> "Coordinates":
        vs = _as_tuple3(voxel_size)
        raw = jnp.asarray(coords, jnp.float32) / jnp.asarray(vs, jnp.float32)
        return Coordinates(raw.astype(jnp.float32), int(interpolation_factor), vs)

    @staticmethod
    def from_interp(coords: Array, interpolation_factor: int,
                    voxel_size) -> "Coordinates":
        f = float(interpolation_factor)
        scale = jnp.asarray((1.0, 1.0, 1.0 / f), jnp.float32)
        raw = jnp.asarray(coords, jnp.float32) * scale
        return Coordinates(raw.astype(jnp.float32), int(interpolation_factor),
                           _as_tuple3(voxel_size))

    @staticmethod
    def make(coords: Array, interpolation_factor: int, voxel_size,
             dtype: str = "raw") -> "Coordinates":
        """Reference-compatible constructor (dtype in raw|real|interp)."""
        ctor = {"raw": Coordinates.from_raw,
                "real": Coordinates.from_real,
                "interp": Coordinates.from_interp}[dtype]
        return ctor(coords, interpolation_factor, voxel_size)

    # ---- views ------------------------------------------------------------
    @property
    def real(self) -> jax.Array:
        """Physically scaled float coordinates (matching math frame)."""
        return self.raw_f32 * jnp.asarray(self.voxel_size, jnp.float32)

    @property
    def interp(self) -> jax.Array:
        """z-interpolated integer coordinates (image ops frame)."""
        f = float(self.interpolation_factor)
        scale = jnp.asarray((1.0, 1.0, f), jnp.float32)
        return jnp.round(self.raw_f32 * scale).astype(jnp.int32)

    @property
    def interp_f32(self) -> jax.Array:
        """Unrounded interp-frame coordinates (for convergence tests)."""
        f = float(self.interpolation_factor)
        return self.raw_f32 * jnp.asarray((1.0, 1.0, f), jnp.float32)

    @property
    def raw(self) -> jax.Array:
        """Rounded integer voxel coordinates."""
        return jnp.round(self.raw_f32).astype(jnp.int32)

    @property
    def cell_num(self) -> int:
        return int(self.raw_f32.shape[0])

    # ---- algebra ----------------------------------------------------------
    def _check_frame(self, other: "Coordinates") -> None:
        """The whole point of this value class is frame correctness (the
        reference validates frames via its ``dtype`` argument,
        coordinates.py) — mixing metadata must be an error, not a silent
        keep-left."""
        if (self.interpolation_factor != other.interpolation_factor
                or self.voxel_size != other.voxel_size):
            raise ValueError(
                "Coordinates frame mismatch: "
                f"interpolation_factor {self.interpolation_factor} vs "
                f"{other.interpolation_factor}, voxel_size "
                f"{self.voxel_size} vs {other.voxel_size}")

    def __add__(self, other: "Coordinates") -> "Coordinates":
        self._check_frame(other)
        return Coordinates(self.raw_f32 + other.raw_f32,
                           self.interpolation_factor, self.voxel_size)

    def __sub__(self, other: "Coordinates") -> "Coordinates":
        self._check_frame(other)
        return Coordinates(self.raw_f32 - other.raw_f32,
                           self.interpolation_factor, self.voxel_size)

    def with_raw(self, raw_f32: Array) -> "Coordinates":
        return Coordinates(jnp.asarray(raw_f32, jnp.float32),
                           self.interpolation_factor, self.voxel_size)


def _as_tuple3(v) -> Tuple[float, float, float]:
    arr = np.asarray(v, dtype=np.float64).reshape(-1)
    if arr.size != 3:
        raise ValueError(f"voxel_size must have 3 entries, got {arr.size}")
    return (float(arr[0]), float(arr[1]), float(arr[2]))
