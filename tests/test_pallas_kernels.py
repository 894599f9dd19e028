"""Pallas kernels: parity with the XLA reference implementations
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from t3dct.ops.pallas_kernels import cc_propagate, flood_slices, _BIG
from t3dct.ops.connected import label_components_raw
from t3dct.ops.watershed import watershed_flood


def test_cc_propagate_parity():
    rng = np.random.RandomState(0)
    mask = rng.rand(20, 24, 6) < 0.25
    n = mask.size
    init = np.where(mask,
                    np.arange(1, n + 1, dtype=np.int32).reshape(mask.shape),
                    _BIG)
    got = np.asarray(cc_propagate(jnp.asarray(init), max_iters=128))
    got = np.where(got == _BIG, 0, got)
    want = np.asarray(label_components_raw(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_flood_slices_parity():
    rng = np.random.RandomState(1)
    x, y, z = 24, 30, 3
    seg = np.zeros((x, y, z), np.int32)
    seg[4:9, 4:9, :] = 1
    seg[14:19, 20:26, :] = 2
    mask = np.zeros((x, y, z), bool)
    mask[2:22, 2:28, :] = True
    elev = rng.rand(x, y, z).astype(np.float32)
    got = np.asarray(flood_slices(jnp.asarray(elev), jnp.asarray(seg),
                                  jnp.asarray(mask)))
    want = np.asarray(jax.vmap(
        lambda e, mk, m: watershed_flood(e, mk, m, 1),
        in_axes=2, out_axes=2)(jnp.asarray(elev), jnp.asarray(seg),
                               jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)
