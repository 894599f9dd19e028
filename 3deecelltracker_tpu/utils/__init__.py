"""Utilities: checkpointing, profiling, logging."""

from .cache import enable_compilation_cache
from .checkpoint import save_pytree, load_pytree
from .profiling import StageTimer, timer

__all__ = ["enable_compilation_cache", "save_pytree", "load_pytree",
           "StageTimer", "timer"]
