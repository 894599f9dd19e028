"""Functional NN building blocks (conv3d / batchnorm / dense / pool).

Semantics match the Keras layers the reference builds its models from
(``unet3d.py:101-200``, ``ffn.py:241-258``): 'same' conv padding, BatchNorm
with momentum 0.99 / eps 1e-3 over the channel axis, LeakyReLU alpha 0.3
(the Keras default), nearest-neighbor UpSampling3D.

TPU notes: data layout is channels-last (N, X, Y, Z, C); convolutions are
emitted via ``lax.conv_general_dilated`` with a configurable compute dtype so
inference can run in bfloat16 with float32 accumulation on the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, jax.Array]

# Keras defaults the reference relies on.
LEAKY_ALPHA = 0.3
BN_MOMENTUM = 0.99
BN_EPS = 1e-3

DIMNUMS_3D = ("NDHWC", "DHWIO", "NDHWC")


def glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---- conv3d ---------------------------------------------------------------

def init_conv3d(key, kernel: Sequence[int], c_in: int, c_out: int,
                use_bias: bool = True) -> Params:
    kx, ky, kz = kernel
    rf = kx * ky * kz
    w = glorot_uniform(key, (kx, ky, kz, c_in, c_out), rf * c_in, rf * c_out)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv3d(params: Params, x: jax.Array,
           compute_dtype=jnp.float32) -> jax.Array:
    w = params["w"].astype(compute_dtype)
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=DIMNUMS_3D,
        preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y


# ---- batchnorm -------------------------------------------------------------

def init_bn(c: int) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    return params, state


def batchnorm(params: Params, state: Params, x: jax.Array, train: bool,
              momentum: float = BN_MOMENTUM,
              eps: float = BN_EPS) -> Tuple[jax.Array, Params]:
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
        new_state = {
            "mean": momentum * state["mean"] + (1 - momentum) * mean,
            "var": momentum * state["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + eps) * params["scale"]
    return (x - mean) * inv + params["bias"], new_state


# ---- activations / pooling -------------------------------------------------

def leaky_relu(x: jax.Array, alpha: float = LEAKY_ALPHA) -> jax.Array:
    return jnp.where(x >= 0, x, alpha * x)


def max_pool3d(x: jax.Array, pool: Sequence[int]) -> jax.Array:
    window = (1,) + tuple(pool) + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, window, "VALID")


def upsample3d(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Nearest-neighbor upsampling (Keras UpSampling3D)."""
    for axis, s in zip((1, 2, 3), size):
        if s > 1:
            x = jnp.repeat(x, s, axis=axis)
    return x


# ---- dense ------------------------------------------------------------------

def init_dense(key, d_in: int, d_out: int, use_bias: bool = True) -> Params:
    w = glorot_uniform(key, (d_in, d_out), d_in, d_out)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def dense(params: Params, x: jax.Array,
          compute_dtype=jnp.float32) -> jax.Array:
    y = jnp.dot(x.astype(compute_dtype), params["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y
