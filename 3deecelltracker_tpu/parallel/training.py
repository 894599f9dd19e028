"""Sharded training steps.

The reference trains with Keras ``fit_generator`` on one GPU
(``unet3d.py:543-574``); here the train step is a pure function jitted over a
(data, spatial) mesh: the batch is sharded over the data axis AND the x
spatial axis, parameters are replicated, gradients are reduced by the psum
XLA inserts for the replicated-param/sharded-input pattern, and the halo
exchanges required by spatially sharded SAME convs are emitted automatically
by XLA SPMD over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bce_from_probs(probs: jax.Array, labels: jax.Array,
                   eps: float = 1e-7) -> jax.Array:
    """Binary cross entropy on sigmoid outputs (Keras 'binary_crossentropy',
    the reference's loss at unet3d.py:415)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    y = labels.astype(p.dtype)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


def make_unet_train_step(model, optimizer: optax.GradientTransformation
                         ) -> Callable:
    """Build a pure (params, bn_state, opt_state, x, y) -> ... train step."""

    def loss_fn(params, bn_state, x, y):
        probs, new_bn = model.apply(params, bn_state, x, train=True)
        return bce_from_probs(probs, y), new_bn

    def train_step(params, bn_state, opt_state, x, y):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn_state, x, y)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bn, new_opt, loss

    return train_step


def make_sharded_unet_train_step(model, optimizer, mesh: Mesh,
                                 data_axis: str = "data",
                                 spatial_axis: str = "spatial"):
    """Jit the train step over ``mesh`` with batch sharded (data, spatial).

    Input batch layout is (b, x, y, z, c): b is sharded over the data axis,
    x over the spatial axis.  Params/optimizer state are replicated; XLA
    SPMD inserts the gradient all-reduce and conv halo exchanges.
    """
    step = make_unet_train_step(model, optimizer)
    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P(data_axis, spatial_axis))

    jitted = jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated,
                      batch_sharding, batch_sharding),
        out_shardings=(replicated, replicated, replicated, replicated),
        donate_argnums=(0, 1, 2),
    )
    return jitted, batch_sharding
