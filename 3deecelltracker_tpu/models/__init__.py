"""Neural network models (pure-functional JAX, parameters as pytrees).

Replaces the reference's TF/Keras models (``unet3d.py``, ``ffn.py``,
``stardist3dcustom.py``) with functional equivalents designed for XLA:TPU —
NDHWC conv layouts, bfloat16-friendly compute, no Python objects in the
compiled path.
"""

from .unet3d import UNet3D, unet3_a, unet3_b, unet3_c
from .ffn import FFN, init_ffn, ffn_apply, ffn_pair_scores

__all__ = [
    "UNet3D", "unet3_a", "unet3_b", "unet3_c",
    "FFN", "init_ffn", "ffn_apply", "ffn_pair_scores",
]
