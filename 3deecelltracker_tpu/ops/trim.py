"""Trimmed mean (scipy.stats.trim_mean parity) for ensemble combination.

The reference combines up-to-20 ensemble predictions with
``trim_mean(coord_prgls, 0.1, axis=0)`` (``trackerlite.py:123``,
``tracker.py:1507``).  On device this is one sort + slice + mean, and in the
sharded ensemble it runs after an all-gather so every chip reduces locally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("proportiontocut", "axis"))
def trim_mean(a: jax.Array, proportiontocut: float = 0.1,
              axis: int = 0) -> jax.Array:
    n = a.shape[axis]
    lowercut = int(proportiontocut * n)      # scipy floors
    uppercut = n - lowercut
    s = jnp.sort(a, axis=axis)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(lowercut, uppercut)
    return jnp.mean(s[tuple(sl)], axis=axis)
