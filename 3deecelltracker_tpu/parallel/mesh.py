"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def auto_mesh_shape(n_devices: int,
                    max_spatial: int = 4) -> Tuple[int, int]:
    """Pick a (data, spatial) mesh factorization of ``n_devices``.

    The spatial axis takes the largest power of two up to ``max_spatial``
    (halo-exchange convs over ICI stay cheap at these widths and spatial
    sharding is what shrinks per-chip activation memory for big volumes);
    the data axis (volumes / ensemble members) gets the remaining factor —
    e.g. 8 devices -> (data=2, spatial=4).  Pass ``max_spatial=1`` for an
    embarrassingly-data-parallel workload.
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


def make_mesh_from_config(config,
                          devices: Optional[Sequence[jax.Device]] = None
                          ) -> Mesh:
    """Build the device mesh a :class:`t3dct.MeshConfig` describes."""
    return make_mesh(config.data_parallel, config.spatial_parallel,
                     devices=devices,
                     axis_names=(config.data_axis, config.spatial_axis))
