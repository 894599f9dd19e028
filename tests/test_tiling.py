"""Tile-and-stitch semantics vs a direct NumPy port of unet3_prediction's
geometry (unet3d.py:203-279)."""

import numpy as np
import jax.numpy as jnp

from t3dct.ops import plan_tiles, tiled_apply
from t3dct.ops.tiling import pad_for_tiles, extract_tiles, stitch_tiles


def test_plan_geometry():
    plan = plan_tiles((168, 401, 128), (160, 160, 16), (24, 24, 2))
    assert plan.center_shape == (112, 112, 12)
    # num = ceil(size / center)
    assert plan.num_tiles == (2, 4, 11)
    assert plan.padded_shape == (2 * 112 + 48, 4 * 112 + 48, 11 * 12 + 4)
    assert plan.origins.shape == (2 * 4 * 11, 3)


def test_identity_model_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.rand(50, 37, 9).astype(np.float32)
    out = tiled_apply(lambda t: t, img, (32, 32, 8), (4, 4, 2))
    # An identity model must reproduce the input exactly (centers partition
    # the padded volume; crop recovers the original).
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-6)


def test_matches_serial_loop():
    """Batched gather/stitch == the reference's serial tile loop."""
    rng = np.random.RandomState(1)
    img = rng.rand(40, 45, 10).astype(np.float32)
    tile, shrink = (24, 24, 8), (4, 4, 2)

    def model(batch):  # nontrivial, position-dependent
        return batch * 2.0 + jnp.cumsum(batch, axis=1) * 0.1

    got = np.asarray(tiled_apply(model, img, tile, shrink))

    # serial NumPy reimplementation of the same geometry
    plan = plan_tiles(img.shape, tile, shrink)
    padded = np.asarray(pad_for_tiles(jnp.asarray(img), plan))
    out_pad = np.zeros(plan.padded_shape, np.float32)
    cx, cy, cz = plan.center_shape
    sx, sy, sz = plan.shrink
    for ox, oy, oz in plan.origins:
        tile_in = padded[ox:ox + tile[0], oy:oy + tile[1], oz:oz + tile[2]]
        pred = np.asarray(model(jnp.asarray(tile_in[None])))[0]
        out_pad[ox + sx:ox + sx + cx, oy + sy:oy + sy + cy,
                oz + sz:oz + sz + cz] = pred[sx:sx + cx, sy:sy + cy,
                                             sz:sz + cz]
    want = out_pad[sx:sx + img.shape[0], sy:sy + img.shape[1],
                   sz:sz + img.shape[2]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tile_batching_equivalent():
    rng = np.random.RandomState(2)
    img = rng.rand(40, 40, 12).astype(np.float32)
    model = lambda t: jnp.sqrt(jnp.abs(t)) + 1.0
    a = np.asarray(tiled_apply(model, img, (24, 24, 8), (4, 4, 2)))
    b = np.asarray(tiled_apply(model, img, (24, 24, 8), (4, 4, 2),
                               tile_batch=3))
    np.testing.assert_allclose(a, b, rtol=1e-6)
