"""PR-GLS non-rigid point-set registration (EM), the tracking core.

Rebuilds the reference's EM loops — ``prgls_quick`` / ``prgls_with_two_ref``
(``trackerlite.py:262-358``) and the legacy ``pr_gls_quick``
(``track.py:11-114``) — as ``lax.while_loop`` fixed-point iterations with
the n x n M-step solve (``np.linalg.solve`` -> LAPACK in the reference,
``trackerlite.py:416``) executed on device.

Motion model: T(X) = X + C·G with gaussian Gram matrix
G_ij = exp(-|x_i - x_j|^2 / 2 beta^2).  E-step computes the match posterior
with outlier ratio gamma; M-step solves
(G·diag(P1) + lambda sigma^2 I) C^T = (Y^T P - X^T diag(P1))^T.

All functions accept validity masks so padded point sets jit once; masked
entries contribute zero posterior and receive zero movement (their rows of
the linear system are identity).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .knn import pairwise_sq_dists


def gaussian_gram(a: jax.Array, b: jax.Array, beta_sq: float) -> jax.Array:
    """exp(-|a_i - b_j|^2 / (2 beta_sq)) of shape (len(a), len(b))
    (``trackerlite.py:368-372`` — note the reference passes beta**2)."""
    return jnp.exp(-pairwise_sq_dists(a, b) / (2.0 * beta_sq))


def _masked(x, mask, fill=0.0):
    return jnp.where(mask, x, fill)


class PrglsResult(NamedTuple):
    tracked: jax.Array          # moved second-reference (l, 3)
    moved_ref: jax.Array        # moved ref set T(X) (n, 3)
    posterior: jax.Array        # (m, n)
    n_iterations: jax.Array     # scalar int32
    coefficients: jax.Array     # final C (3, n) motion basis weights


@functools.partial(jax.jit,
                   static_argnames=("max_iteration", "m_step_refine"))
def prgls_with_two_ref(init_match: jax.Array,
                       ptrs_tgt: jax.Array,
                       ptrs_ref: jax.Array,
                       tracked_ref: jax.Array,
                       beta: float = 3.0,
                       lambda_: float = 3.0,
                       max_iteration: int = 2000,
                       tgt_mask: Optional[jax.Array] = None,
                       ref_mask: Optional[jax.Array] = None,
                       vol: float = 1.0,
                       convergence_epsilon: float = 1e-3,
                       solve_floor: float = 1e-3,
                       m_step_refine: int = 0) -> PrglsResult:
    """``trackerlite.prgls_with_two_ref`` (:309-358): fit the motion field on
    (ptrs_ref -> ptrs_tgt) guided by ``init_match`` and apply it to the
    confirmed set ``tracked_ref`` via the cross Gram matrix.

    Reference-parity details preserved: the first EM iteration's movement is
    discarded (:339-341), gamma clamps at 1e-4 (:347-348), convergence when
    the ref-movement norm drops below 1e-3 (:353-356), iteration count runs
    1..max_iteration-1 (:328).

    f32 note (``solve_floor``): the reference runs float64.  As the EM
    converges, sigma^2 collapses toward the squared measurement noise and
    the M-step system A = G.diag(P1) + lambda sigma^2 I reaches condition
    numbers ~|A|/(lambda sigma^2) of 1e6-1e7; at f32 (eps 6e-8) the solve
    then returns garbage coefficients and the EM *diverges* — on real
    150-cell priors the tracked error becomes worse than identity.  Since
    inputs are PCA-normalized (cloud scale ~1, ``ffn.py:330``), flooring
    the regularizer at ``max(lambda sigma^2, solve_floor)`` caps the
    condition number at ~1e5, which f32 solves accurately.  The floor only
    stiffens the motion-field smoothing near convergence (the E-step keeps
    the true sigma^2): measured drift vs the float64 reference is <0.05
    voxel while restoring the reference's ~13-iteration convergence.  A
    stagnation stop (``stall_limit`` iterations without the movement norm
    improving below 99% of its best) remains as a safety net.

    ``m_step_refine > 0`` (EXPERIMENTAL — measured worse end-to-end, see
    below) switches the M-step to preconditioned iterative refinement:
    LU-factor a mildly floored system (floor 1e-4, cond <= ~1e5,
    f32-solvable), then run ``m_step_refine`` correction steps against
    the TRUE (unfloored) system with double-single compensated residuals
    (:mod:`ops.df32`).  Each individual solve then matches float64 to
    ~1e-6 (tests/test_df32.py).

    Round-3 measurement (BASELINE.md "f32 EM accuracy bound"): this does
    NOT close the f32-vs-f64 trajectory gap — it widens it.  Solving the
    true cond-1e6..1e7 system ACCURATELY amplifies the f32 E-step's own
    rounding noise (relative ~6e-8) by the condition number into O(1)
    coefficient errors; the reference survives only because float64
    noise is 2^-52.  On the reference-code parity harness the unfloored
    refined EM diverges outright (GT assignment agreement 0.27 vs 1.0).
    At f32 the solve floor is REQUIRED regularization, not a precision
    workaround; the residual ~1-unit coordinate deviation vs the f64
    reference is noise-floor-irreducible without carrying the entire EM
    (posterior included) in double-single arithmetic.
    """
    m, n = init_match.shape
    if tgt_mask is None:
        tgt_mask = jnp.ones((m,), bool)
    if ref_mask is None:
        ref_mask = jnp.ones((n,), bool)

    # TPU matmuls default to bf16-precision passes; the EM's 1e-3
    # convergence tail (trackerlite.py:301-304) is unreachable at that
    # precision and the loop would always hit max_iteration.  Force true
    # f32 for everything traced below.
    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()
    try:

        beta_sq = beta ** 2
        valid_pair = tgt_mask[:, None] & ref_mask[None, :]
        prior = _masked(init_match.astype(jnp.float32), valid_pair)

        gram_nn = gaussian_gram(ptrs_ref, ptrs_ref, beta_sq)
        gram_nn = jnp.where(ref_mask[:, None] & ref_mask[None, :], gram_nn, 0.0)
        gram_ln = gaussian_gram(tracked_ref, ptrs_ref, beta_sq)
        gram_ln = jnp.where(ref_mask[None, :], gram_ln, 0.0)

        d2_init = pairwise_sq_dists(ptrs_tgt, ptrs_ref)
        n_pairs = jnp.sum(valid_pair.astype(jnp.float32))
        sigma_sq0 = jnp.sum(_masked(d2_init, valid_pair)) / (3.0 * n_pairs)

        m_valid = jnp.sum(tgt_mask.astype(jnp.float32))
        eye = jnp.eye(n, dtype=jnp.float32)

        def e_step(pred_ref, sigma_sq, gamma):
            k = gaussian_gram(ptrs_tgt, pred_ref, sigma_sq)
            p_joint = (1.0 - gamma) * prior * k / \
                (2.0 * jnp.pi * sigma_sq) ** 1.5
            p_joint = _masked(p_joint, valid_pair)
            denom = jnp.sum(p_joint, axis=1) + gamma / vol
            post = p_joint / denom[:, None]
            return _masked(post, valid_pair)

        def m_step(post, pred_ref, sigma_sq):
            p1 = jnp.sum(post, axis=0)                       # (n,)
            s_true = lambda_ * sigma_sq
            dep = ptrs_tgt.T @ post - pred_ref.T * p1[None, :]   # (3, n)
            if m_step_refine == 0:
                s_eff = jnp.maximum(s_true, solve_floor)
                coeff = gram_nn * p1[None, :] + s_eff * eye
                return jnp.linalg.solve(coeff.T, dep.T).T     # (3, n)
            from jax.scipy.linalg import lu_factor, lu_solve
            from .df32 import compensated_residual
            s_eff = jnp.maximum(s_true, 1e-4)                # preconditioner
            coeff = gram_nn * p1[None, :] + s_eff * eye
            a_true = gram_nn * p1[None, :] + s_true * eye
            lu_piv = lu_factor(coeff.T)
            x = lu_solve(lu_piv, dep.T)                      # (n, 3)

            def refine(_, x):
                r = compensated_residual(dep.T, a_true.T, x)
                return x + lu_solve(lu_piv, r)

            x = jax.lax.fori_loop(0, m_step_refine, refine, x)
            return x.T

        stall_limit = 30.0

        def body(carry):
            pred_ref, pred_tracked, sigma_sq, gamma, _, aux, it = carry
            post = e_step(pred_ref, sigma_sq, gamma)
            c = m_step(post, pred_ref, sigma_sq)
            move_ref = (c @ gram_nn).T                        # (n, 3)
            move_tracked = (c @ gram_ln.T).T                  # (l, 3)
            apply = it > 1
            pred_ref = jnp.where(apply, pred_ref + move_ref, pred_ref)
            pred_tracked = jnp.where(apply, pred_tracked + move_tracked,
                                     pred_tracked)
            sum_post = jnp.sum(post)
            gamma = jnp.maximum(1.0 - sum_post / m_valid, 1e-4)
            d2 = pairwise_sq_dists(pred_ref, ptrs_tgt).T      # (m, n)
            # guards beyond the reference: if the posterior mass underflows to
            # zero (degenerate input, sigma collapse), 0/0 would poison the
            # loop with NaNs — clamp instead
            sigma_sq = jnp.sum(_masked(d2, valid_pair) * post) / \
                (3.0 * jnp.maximum(sum_post, 1e-20))
            sigma_sq = jnp.maximum(sigma_sq, 1e-12)
            move_norm = jnp.sqrt(jnp.sum(jnp.square(
                _masked(move_ref, ref_mask[:, None]))))
            # stagnation tracking (f32 noise floor, see docstring)
            best = aux[1]
            improving = move_norm < 0.99 * best
            stall = jnp.where(improving, 0.0, aux[2] + 1.0)
            best = jnp.minimum(best, move_norm)
            return (pred_ref, pred_tracked, sigma_sq, gamma, post,
                    jnp.stack([move_norm, best, stall]), it + 1)

        def cond(carry):
            *_, aux, it = carry
            converged = (it > 1) & ((aux[0] < convergence_epsilon)
                                    | (aux[2] >= stall_limit))
            return (it < max_iteration) & ~converged

        post0 = jnp.zeros((m, n), jnp.float32)
        carry0 = (ptrs_ref.astype(jnp.float32),
                  tracked_ref.astype(jnp.float32),
                  sigma_sq0, jnp.float32(0.05), post0,
                  jnp.asarray([jnp.inf, jnp.inf, 0.0], jnp.float32),
                  jnp.int32(1))
        pred_ref, pred_tracked, sigma_sq, gamma, post, aux, it = \
            jax.lax.while_loop(cond, body, carry0)

        # final C for callers that replay motion (legacy Tracker path)
        c_final = m_step(post, pred_ref, sigma_sq)
    finally:
        ctx.__exit__(None, None, None)
    return PrglsResult(pred_tracked, pred_ref, post, it, c_final)


@functools.partial(jax.jit,
                   static_argnames=("max_iteration", "m_step_refine"))
def prgls_quick(init_match: jax.Array,
                ptrs_tgt: jax.Array,
                tracked_ref: jax.Array,
                beta: float = 3.0,
                lambda_: float = 3.0,
                max_iteration: int = 2000,
                tgt_mask: Optional[jax.Array] = None,
                ref_mask: Optional[jax.Array] = None,
                vol: float = 1.0,
                solve_floor: float = 1e-3,
                m_step_refine: int = 0) -> PrglsResult:
    """``trackerlite.prgls_quick`` (:262-306): the single-reference variant —
    the motion field is both fit on and applied to ``tracked_ref``."""
    return prgls_with_two_ref(init_match, ptrs_tgt, tracked_ref, tracked_ref,
                              beta=beta, lambda_=lambda_,
                              max_iteration=max_iteration,
                              tgt_mask=tgt_mask, ref_mask=ref_mask, vol=vol,
                              solve_floor=solve_floor,
                              m_step_refine=m_step_refine)


class LegacyPrglsResult(NamedTuple):
    posterior: jax.Array        # final P (m, n)
    moved_ref: jax.Array        # T(X) (n, 3)
    coefficients: jax.Array     # C (3, n)


@functools.partial(jax.jit, static_argnames=("max_iteration",))
def pr_gls_quick(x_ref: jax.Array, y_tgt: jax.Array, corr: jax.Array,
                 beta: float = 300.0, max_iteration: int = 20,
                 lambda_: float = 0.1, vol: float = 1e8,
                 ref_mask: Optional[jax.Array] = None,
                 tgt_mask: Optional[jax.Array] = None
                 ) -> LegacyPrglsResult:
    """Legacy v0.4 PR-GLS (``track.py:11-114``), including its distinct
    numerics: gamma starts at 0.1, the E-step denominator is
    gamma (2 pi sigma^2)^1.5 / ((1-gamma) vol), movement applies from the
    first iteration, sigma^2 clamps at >= 1, fixed iteration budget (no
    convergence break), and the 0.5-threshold peel builds the prior.

    ``ref_mask``/``tgt_mask``: validity masks for PADDED point sets (park
    padded points far away, e.g. 1e6) so the recurrence jits once per
    static shape; all counts (n, m) in the math use the VALID counts, so
    the result equals the unpadded computation exactly.  Padded ref rows
    receive zero coefficients and zero movement.
    """
    from .matching import legacy_init_match

    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()
    try:
        n_static = x_ref.shape[0]
        m_static = y_tgt.shape[0]
        if ref_mask is None:
            ref_mask = jnp.ones((n_static,), bool)
        if tgt_mask is None:
            tgt_mask = jnp.ones((m_static,), bool)
        valid = tgt_mask[:, None] & ref_mask[None, :]
        n = jnp.sum(ref_mask.astype(jnp.float32))
        m = jnp.sum(tgt_mask.astype(jnp.float32))
        init_match = legacy_init_match(corr, threshold=0.5,
                                       ref_mask=ref_mask, tgt_mask=tgt_mask)

        gram = gaussian_gram(x_ref, x_ref, beta ** 2)
        # parked-far padding already zeroes cross terms; zero the padded
        # diagonal (self-distance 0 -> exp = 1) too
        gram = jnp.where(ref_mask[:, None] & ref_mask[None, :], gram, 0.0)
        sigma_sq0 = jnp.sum(jnp.where(valid.T,
                                      pairwise_sq_dists(x_ref, y_tgt), 0.0)) \
            / (3.0 * n * m)
        eye = jnp.eye(n_static, dtype=jnp.float32)

        def body(it, carry):
            t_x, sigma_sq, gamma, _, _ = carry
            dist_sq = pairwise_sq_dists(y_tgt, t_x)            # (m, n)
            p1 = init_match * jnp.exp(-jnp.where(valid, dist_sq, 0.0)
                                      / (2.0 * sigma_sq))
            p1 = jnp.where(valid, p1, 0.0)
            denom = jnp.sum(p1, axis=1) + gamma * \
                (2.0 * jnp.pi * sigma_sq) ** 1.5 / ((1.0 - gamma) * vol)
            post = jnp.where(valid, p1 / denom[:, None], 0.0)

            diag_p = jnp.sum(post, axis=0)                     # (n,)
            a = gram * diag_p[None, :] + lambda_ * sigma_sq * eye
            b = y_tgt.T @ post - x_ref.T * diag_p[None, :]
            c = jnp.linalg.solve(a.T, b.T).T                   # (3, n)
            c = jnp.where(ref_mask[None, :], c, 0.0)
            t_x = (x_ref.T + c @ gram).T

            m_p = jnp.sum(post)
            gamma = 1.0 - m_p / m
            dist_sq2 = pairwise_sq_dists(y_tgt, t_x)
            sigma_sq = jnp.maximum(
                jnp.sum(post * jnp.where(valid, dist_sq2, 0.0))
                / (3.0 * m_p), 1.0)
            return t_x, sigma_sq, gamma, post, c

        carry0 = (x_ref.astype(jnp.float32), sigma_sq0, jnp.float32(0.1),
                  jnp.zeros((m_static, n_static), jnp.float32),
                  jnp.zeros((3, n_static), jnp.float32))
        # reference iterates range(1, max_iteration) -> max_iteration-1 rounds
        t_x, sigma_sq, gamma, post, c = jax.lax.fori_loop(
            1, max_iteration, body, carry0)
    finally:
        ctx.__exit__(None, None, None)
    return LegacyPrglsResult(post, t_x, c)
