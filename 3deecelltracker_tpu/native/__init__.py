"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first import (cached .so next to the sources); all
call sites fall back to pure-Python/PIL when the toolchain or binary is
unavailable, so the native layer is an accelerator, never a requirement.
"""

from .tiff import (native_available, tiff_read, tiff_read_volume,
                   tiff_write, tiff_info)

__all__ = ["native_available", "tiff_read", "tiff_read_volume",
           "tiff_write", "tiff_info"]
