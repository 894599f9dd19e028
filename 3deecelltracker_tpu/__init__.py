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
"""

import sys as _sys

from . import ops  # noqa: F401
from .coordinates import Coordinates  # noqa: F401
from .config import (  # noqa: F401
    SegmentationConfig,
    TrackingConfig,
    PrglsConfig,
    LcnConfig,
)

__version__ = "0.1.0"

# Allow `import t3dct` style access without the digit-leading name.
_sys.modules.setdefault("t3dct", _sys.modules[__name__])
