"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def auto_mesh_shape(n_devices: int,
                    max_spatial: int = 4) -> Tuple[int, int]:
    """Pick a (data, spatial) mesh factorization of ``n_devices``.

    Data parallelism scales embarrassingly over volumes / ensemble members,
    so it gets the larger factor; spatial sharding (halo-exchange convs over
    ICI) takes a small power of two.
    """
    spatial = 1
    for cand in (2, 4):
        if cand <= max_spatial and n_devices % cand == 0:
            spatial = cand
    return n_devices // spatial, spatial


def make_mesh(n_data: int, n_spatial: int = 1,
              devices: Optional[Sequence[jax.Device]] = None,
              axis_names: Tuple[str, str] = ("data", "spatial")) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(grid, axis_names)
