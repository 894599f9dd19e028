"""3DeeCellTracker-TPU: a TPU-native framework for segmenting and tracking
cells in 3D + T fluorescence microscopy volumes.

This is a ground-up JAX/XLA/Pallas rebuild of the capabilities of
``WenChentao/3DeeCellTracker`` (reference: ``CellTracker/`` package, v1.0.1):
3D U-Net / StarDist3D segmentation, FFN point matching, PR-GLS non-rigid
registration, watershed instance splitting, and the full tracking pipeline —
redesigned for TPU hardware (static shapes, device-resident volumes, meshes
and collectives for scale-out) rather than ported.

The distribution name starts with a digit, so the importable alias module
``t3dct`` is provided at the repository root::

    import t3dct as ct
    ct.Coordinates(...)

Main entry points
-----------------
v1.0 StarDist workflow (reference ``Examples/use_stardist``):
    engine.stardist.TrainStarDist3D / StarDist3D / predict_and_save
    engine.pipeline.track_timelapse
    engine.transformer.CoordsToImageTransformer
    engine.tracker.TrackerLite

Legacy v0.4 U-Net workflow (reference ``Examples/use_unet``):
    engine.legacy.Tracker
    models.train_unet.TrainingUNet3D, models.train_ffn.TrainFFN

Scale-out:
    parallel.make_mesh, parallel.ensemble, parallel.spatial,
    parallel.training
"""

import sys as _sys

from . import ops  # noqa: F401
from .coordinates import Coordinates  # noqa: F401
from .config import (  # noqa: F401
    LcnConfig,
    MeshConfig,
    SegmentationConfig,
    StarDistConfig,
    TrackingConfig,
    TrainFfnConfig,
    TrainUnetConfig,
)

__version__ = "0.1.0"

# Allow `import t3dct` style access without the digit-leading name.
_sys.modules.setdefault("t3dct", _sys.modules[__name__])

# Submodules are imported lazily to keep bare `import t3dct` light; these
# names resolve on attribute access.
_LAZY = ("models", "engine", "io", "parallel", "utils", "viz", "native")


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        setattr(_sys.modules[__name__], name, mod)
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
