"""Scale-out layer: device meshes, sharded training, ensemble fan-out.

The reference is strictly single-process/single-GPU (SURVEY §2.3); this
package is new TPU architecture: ``jax.sharding.Mesh`` + pjit with
(data, spatial) axes, XLA SPMD halo exchange for spatially sharded convs,
and device-resident ensemble reductions.
"""

from .mesh import make_mesh, make_mesh_from_config, auto_mesh_shape
from . import multihost
from .training import make_unet_train_step, make_sharded_unet_train_step

__all__ = [
    "multihost",
    "make_mesh",
    "make_mesh_from_config",
    "auto_mesh_shape",
    "make_unet_train_step",
    "make_sharded_unet_train_step",
]
