"""ops/rle.py — on-device run-length coding of label volumes.

The tracked label volume rides the device->host link RLE-coded
(engine/pipeline.py `_AsyncTrackSaver`); these tests pin the exact
roundtrip, the overflow contract (n_runs > budget => caller falls back
to dense), and the budget/worth heuristics."""

import jax.numpy as jnp
import numpy as np
import pytest

from t3dct.ops.rle import rle_decode, rle_encode, runs_budget, \
    worth_encoding


def _sparse_labels(rng, n_vox, n_cells, dtype):
    """1-D 'label volume': sparse runs of cell ids on zero background."""
    x = np.zeros(n_vox, dtype)
    for cid in range(1, n_cells + 1):
        start = rng.integers(0, n_vox - 40)
        x[start:start + rng.integers(3, 40)] = cid
    return x


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_roundtrip_exact(dtype):
    rng = np.random.default_rng(0)
    x = _sparse_labels(rng, 50_000, 60, dtype)
    starts, vals, n_runs = rle_encode(jnp.asarray(x), max_runs=1024)
    assert int(n_runs) <= 1024
    y = rle_decode(np.asarray(starts), np.asarray(vals), int(n_runs),
                   x.size)
    np.testing.assert_array_equal(y, x)
    assert y.dtype == x.dtype


def test_single_run_and_alternating():
    const = jnp.zeros(1000, jnp.uint8)
    s, v, n = rle_encode(const, max_runs=8)
    assert int(n) == 1
    np.testing.assert_array_equal(
        rle_decode(np.asarray(s), np.asarray(v), 1, 1000), np.zeros(1000))
    alt = jnp.asarray(np.arange(100) % 2, jnp.uint8)
    s, v, n = rle_encode(alt, max_runs=128)
    assert int(n) == 100
    np.testing.assert_array_equal(
        rle_decode(np.asarray(s), np.asarray(v), 100, 100),
        np.asarray(alt))


def test_overflow_detected_and_decode_refuses():
    alt = jnp.asarray(np.arange(100) % 3, jnp.uint8)   # 100 runs
    starts, vals, n_runs = rle_encode(alt, max_runs=16)
    assert int(n_runs) == 100 > 16          # truth rides down regardless
    with pytest.raises(ValueError, match="truncated"):
        rle_decode(np.asarray(starts), np.asarray(vals), int(n_runs), 100)
    # the budget-truncated prefix is still the FIRST 16 runs in order
    np.testing.assert_array_equal(np.asarray(starts), np.arange(16))


def test_padded_starts_are_n():
    x = jnp.asarray([5, 5, 5, 7, 7], jnp.uint8)        # 2 runs
    starts, vals, n_runs = rle_encode(x, max_runs=4)
    assert int(n_runs) == 2
    np.testing.assert_array_equal(np.asarray(starts), [0, 3, 5, 5])


def test_empty_input_is_zero_runs():
    """A zero-length array is ZERO runs (the unconditional leading-change
    flag must not fabricate a phantom run; review round 5), and the
    decode of that encoding is the empty array."""
    starts, vals, n_runs = rle_encode(jnp.zeros((0,), jnp.uint8),
                                      max_runs=8)
    assert int(n_runs) == 0
    out = rle_decode(np.asarray(starts), np.asarray(vals), 0, 0)
    assert out.size == 0


def test_budget_and_worth():
    # worm scale: (32,224,224) u8, 256-cell budget -> ~10x smaller
    n = 32 * 224 * 224
    r = runs_budget(n, 256)
    assert r == 32768 and worth_encoding(n, r, 1)
    # tiny test volumes (<256 KB dense): dense is already cheap
    n_small = 16 * 24 * 24
    assert not worth_encoding(n_small, runs_budget(n_small, 64), 1)
    # budget never exceeds ~1/3 of dense bytes
    assert runs_budget(1000, 10_000) == 62
