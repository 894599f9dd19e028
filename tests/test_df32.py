"""Double-single (compensated f32) primitives: ops/df32.py."""

import numpy as np
import jax
import jax.numpy as jnp

from t3dct.ops.df32 import (compensated_residual, df_sum, two_prod,
                            two_sum)


def test_two_sum_exact():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(1000).astype(np.float32) * 1e6)
    b = jnp.asarray(rng.randn(1000).astype(np.float32))
    s, e = jax.jit(two_sum)(a, b)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(got, want)


def test_two_prod_exact():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1000).astype(np.float32))
    b = jnp.asarray(rng.randn(1000).astype(np.float32) * 100)
    p, e = jax.jit(two_prod)(a, b)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(got, want)


def test_df_sum_cancellation():
    """Summing values that cancel to ~eps of their magnitude keeps ~2x
    f32 precision where a plain f32 sum loses everything."""
    rng = np.random.RandomState(2)
    big = rng.randn(256).astype(np.float32) * 1e4
    vals = np.concatenate([big, -big, rng.randn(64).astype(np.float32)])
    rng.shuffle(vals)
    hi, lo = jax.jit(lambda v: df_sum(v, jnp.zeros_like(v), axis=0))(
        jnp.asarray(vals))
    want = np.sum(vals.astype(np.float64))
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    assert abs(got - want) < 1e-3 * max(abs(want), 1.0)
    # plain f32 sum is orders of magnitude worse on this input
    plain = float(jnp.sum(jnp.asarray(vals)))
    assert abs(got - want) < abs(plain - want) or plain == got


def test_compensated_residual_vs_float64():
    """r = b - a@x with near-total cancellation (x close to the true
    solution): the compensated residual must match the float64 residual to
    f32-roundoff of the RESIDUAL, not of b."""
    rng = np.random.RandomState(3)
    n = 120
    # ill-conditioned SPD system like the PR-GLS M-step
    g = np.exp(-((rng.rand(n, 1) - rng.rand(1, n)) ** 2) * 30)
    a64 = g @ g.T + 1e-6 * np.eye(n)
    x64 = rng.randn(n, 3)
    b64 = a64 @ x64
    # perturb x by ~1e-4 so the residual is ~1e9 times smaller than b
    x = (x64 + 1e-4 * rng.randn(n, 3)).astype(np.float32)
    a = a64.astype(np.float32)
    b = b64.astype(np.float32)
    want = b.astype(np.float64) - a.astype(np.float64) @ \
        x.astype(np.float64)
    got = np.asarray(jax.jit(compensated_residual)(
        jnp.asarray(b), jnp.asarray(a), jnp.asarray(x)), np.float64)
    denom = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-6 * denom
    # the naive f32 residual is catastrophically worse
    naive = np.asarray(jnp.asarray(b) - jnp.asarray(a) @ jnp.asarray(x),
                       np.float64)
    assert np.abs(naive - want).max() > 10 * np.abs(got - want).max()
