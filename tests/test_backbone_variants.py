"""Backbone compute-path variants: math-identity checks for the
sub-pixel fused up-block (models/stardist3d.py) and the fused Pallas
conv kernel (ops/pallas_conv.py, interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from t3dct.config import StarDistConfig
from t3dct.models import layers as L
from t3dct.models.stardist3d import StarDist3DNet, _fused_up_first_conv
from t3dct.ops.pallas_conv import conv3x3x3_fused


def test_fused_up_first_conv_identity():
    rng = np.random.RandomState(0)
    for pool, cu, cs, co in [((2, 2, 2), 64, 32, 32),
                             ((2, 2, 1), 16, 8, 8),
                             ((1, 2, 2), 8, 8, 16)]:
        p = L.init_conv3d(jax.random.PRNGKey(1), (3, 3, 3), cu + cs, co)
        h = jnp.asarray(rng.randn(1, 4, 6, 5, cu).astype(np.float32))
        skip = jnp.asarray(rng.randn(1, 4 * pool[0], 6 * pool[1],
                                     5 * pool[2], cs).astype(np.float32))
        want = jax.nn.relu(L.conv3d(
            p, jnp.concatenate([L.upsample3d(h, pool), skip], -1)))
        got = _fused_up_first_conv(p, h, skip, pool, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_fused_up_whole_net_matches_default():
    cfg = StarDistConfig(n_rays=8, grid=(1, 2, 2), unet_n_filter_base=8,
                         net_conv_after_unet=16)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 32, 32, 1).astype(np.float32))
    net0 = StarDist3DNet(cfg)
    net1 = StarDist3DNet(cfg, fused_up=True)
    params = net0.init(jax.random.PRNGKey(0))   # same init contract
    p0, d0 = net0.apply(params, x)
    p1, d1 = net1.apply(params, x)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-4)


def test_pallas_conv3x3x3_matches_xla():
    rng = np.random.RandomState(2)
    for (z, y, x, ci, co) in [(6, 12, 10, 8, 16), (4, 8, 84, 32, 32),
                              (3, 6, 84, 96, 32)]:
        p = L.init_conv3d(jax.random.PRNGKey(0), (3, 3, 3), ci, co)
        xin = jnp.asarray(rng.randn(1, z, y, x, ci).astype(np.float32))
        want = jax.nn.relu(L.conv3d(p, xin))[0]
        got = conv3x3x3_fused(xin[0], p["w"], p["b"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
