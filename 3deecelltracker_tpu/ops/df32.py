"""Double-single (compensated f32) building blocks for high-accuracy
residuals on TPU.

TPUs have no native float64; the PR-GLS M-step solve
(``/root/reference/CellTracker/trackerlite.py:409-417`` runs in
NumPy/LAPACK float64 there) reaches condition numbers of 1e6-1e7 near EM
convergence, where a plain f32 solve (eps 6e-8) loses every digit.  The
fix in :mod:`ops.prgls` is preconditioned iterative refinement: factor a
regularized (floored) system once in f32, then correct against the TRUE
system using residuals computed here in double-single arithmetic — each
value carried as an (hi, lo) pair of f32 with |lo| <= ulp(hi)/2, giving
~48 effective mantissa bits.

Primitives are classic error-free transformations (Dekker 1971, Knuth
TAOCP 4.2.2): ``two_sum`` (6-flop exact addition error), ``two_prod``
(Dekker split; exact because 12-bit-mantissa halves multiply exactly in
f32's 24-bit mantissa).  XLA does not reassociate floating-point
expressions, so the transformations survive compilation; a potential
a*b+c -> fma contraction only makes the error terms MORE exact.

All ops are elementwise/vectorized — the compensated matmul is a
log2(k)-round pairwise tree of vectorized double-single adds, not a
scan — so they map onto the VPU with no sequential bottleneck.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_SPLIT = 4097.0      # 2**12 + 1 for float32 (Dekker splitting constant)


def two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assumes |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """p + e == a * b exactly, p = fl(a * b)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(x: Tuple, y: Tuple) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Double-single + double-single (Dekker add2)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def df_sum(hi: jnp.ndarray, lo: jnp.ndarray, axis: int
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reduce (hi, lo) pairs along ``axis`` with a pairwise double-single
    tree (log2 rounds of vectorized df_add)."""
    hi = jnp.moveaxis(hi, axis, 0)
    lo = jnp.moveaxis(lo, axis, 0)
    k = hi.shape[0]
    # pad to a power of two with exact zeros
    p = 1 << max(1, (k - 1).bit_length())
    if p != k:
        pad = [(0, p - k)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while hi.shape[0] > 1:
        half = hi.shape[0] // 2
        hi, lo = df_add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
    return hi[0], lo[0]


def compensated_residual(b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray
                         ) -> jnp.ndarray:
    """``b - a @ x`` with double-single products and summation.

    Shapes: ``a`` (n, k), ``x`` (k, m), ``b`` (n, m).  Returns an f32
    residual whose RELATIVE error is ~eps(f32) even when b and a@x cancel
    almost completely — exactly the regime of iterative refinement.

    Memory: materializes the (n, k, m) product pair; PR-GLS sizes
    (n=k<=1024, m=3) keep this at a few MB.
    """
    ph, pl = two_prod(a[:, :, None].astype(jnp.float32),
                      x[None, :, :].astype(jnp.float32))
    sh, sl = df_sum(ph, pl, axis=1)               # (n, m) double-single
    # r = b - s, folding every low part in before the final collapse
    rh, re = two_sum(b.astype(jnp.float32), -sh)
    return rh + (re - sl)
