"""Pipeline engine: segmentation drivers, coordinate/image transformer,
tracking orchestrators, activity extraction.

This layer mirrors the reference's L4/L5 (``coord_image_transformer.py``,
``trackerlite.py``, ``tracker.py``) as host-side orchestration over the
jitted device kernels in ``ops/`` and ``models/``.
"""

from .correction import get_cells_on_boundary, accurate_correction_loop

__all__ = ["get_cells_on_boundary", "accurate_correction_loop"]
