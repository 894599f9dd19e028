"""Utilities: checkpointing, profiling, logging."""

from .checkpoint import save_pytree, load_pytree
from .profiling import StageTimer, timer

__all__ = ["save_pytree", "load_pytree", "StageTimer", "timer"]
