"""Coordinates frame algebra vs. reference semantics
(coord_image_transformer.py:29-141)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import t3dct
from t3dct import Coordinates


@pytest.fixture
def pts():
    rng = np.random.RandomState(0)
    return rng.rand(17, 3).astype(np.float32) * np.array([160, 200, 20])


def test_raw_roundtrip(pts):
    c = Coordinates.from_raw(pts, 10, (1, 1, 9.2))
    np.testing.assert_allclose(np.asarray(c.raw_f32), pts, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(c.raw), np.round(pts).astype(np.int32))


def test_real_frame(pts):
    vs = (1.0, 1.0, 9.2)
    c = Coordinates.from_raw(pts, 10, vs)
    np.testing.assert_allclose(np.asarray(c.real), pts * np.asarray(vs),
                               rtol=1e-5)
    # real -> raw inverse
    c2 = Coordinates.from_real(np.asarray(c.real), 10, vs)
    np.testing.assert_allclose(np.asarray(c2.raw_f32), pts, rtol=1e-5)


def test_interp_frame(pts):
    c = Coordinates.from_raw(pts, 10, (1, 1, 9.2))
    expect = np.round(pts * np.array([1, 1, 10])).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(c.interp), expect)
    c2 = Coordinates.from_interp(pts * np.array([1, 1, 10]), 10, (1, 1, 9.2))
    np.testing.assert_allclose(np.asarray(c2.raw_f32), pts, rtol=1e-5)


def test_algebra(pts):
    a = Coordinates.from_raw(pts, 10, (1, 1, 9.2))
    b = Coordinates.from_raw(pts * 0.5, 10, (1, 1, 9.2))
    np.testing.assert_allclose(np.asarray((a - b).raw_f32), pts * 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray((a + b).raw_f32), pts * 1.5, rtol=1e-5)
    assert a.cell_num == 17


def test_pytree_and_jit(pts):
    c = Coordinates.from_raw(pts, 10, (1, 1, 9.2))

    @jax.jit
    def shift(coords: Coordinates) -> Coordinates:
        return coords.with_raw(coords.raw_f32 + 1.0)

    out = shift(c)
    assert isinstance(out, Coordinates)
    assert out.interpolation_factor == 10
    np.testing.assert_allclose(np.asarray(out.raw_f32), pts + 1.0, rtol=1e-5)
    # tree flatten keeps metadata static
    leaves, treedef = jax.tree_util.tree_flatten(c)
    assert len(leaves) == 1


def test_make_dispatch(pts):
    c = Coordinates.make(pts, 5, (1, 1, 2.0), dtype="real")
    np.testing.assert_allclose(np.asarray(c.real), pts, rtol=1e-5)


def test_virtual_mesh_available():
    assert jax.device_count() == 8
