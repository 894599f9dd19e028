"""TPU-native image/point-set operator library.

Each module replaces a native-substrate dependency of the reference
(scipy.ndimage / skimage Cython / sklearn / LAPACK — SURVEY §2.2) with a
jit-compatible JAX implementation designed for TPU execution: static shapes,
separable/fused filters, fixed-point device loops, and batched linear algebra.
"""

from .filters import box_sum, box_mean, gaussian_filter
from .lcn import lcn, normalize_image
from .tiling import plan_tiles, extract_tiles, stitch_tiles, tiled_apply

__all__ = [
    "box_sum",
    "box_mean",
    "gaussian_filter",
    "lcn",
    "normalize_image",
    "plan_tiles",
    "extract_tiles",
    "stitch_tiles",
    "tiled_apply",
]
