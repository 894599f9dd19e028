"""Host-side I/O: TIFF/HDF5 codecs, results tree, async prefetch.

Codecs stay on the host (SURVEY §2.2 N7); volumes are handed to the device
through an async prefetch pipeline so the serial tracking recurrence is
never I/O bound.
"""

from .imageio import (load_image, load_2d_slices_at_time, get_t_range,
                      percentile_normalize, save_label_slices,
                      read_image_ts)
from .artifacts import ResultsTree
from .prefetch import VolumePrefetcher

__all__ = [
    "load_image", "load_2d_slices_at_time", "get_t_range",
    "percentile_normalize", "save_label_slices", "read_image_ts",
    "ResultsTree", "VolumePrefetcher",
]
