"""Unrolled small-matrix linear algebra for TPU.

`jnp.linalg.det` / `solve` / `cholesky` on tiny matrices lower to XLA
While-loops with dynamic slices (LU with pivoting) — on TPU each such op is
a latency-bound sequential chain that dominates the Gauss-Newton iteration
(the actual dense image work is microseconds). These fully-unrolled
routines compile to straight-line VPU code and batch over leading axes.

For the normal-equation systems here, A = J^T W J (+ prior) is symmetric
positive semi-definite, so Cholesky is the right factorization; its pivots
give the determinant for the reference's conditioning guard
(GaussNewton.cpp:59-63) for free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["cholesky_solve", "cholesky_det_solve", "cholesky_logdet_solve", "inv_psd"]


def _chol_factor(A: jax.Array):
    """Unrolled Cholesky of (..., N, N); returns (L, bad): the list-of-lists
    lower factor entries (None above the diagonal) without forming a matrix,
    and a boolean marking a degenerate factorization.

    ``bad`` is True when any pivot is non-positive or vanishes RELATIVE to
    the matrix scale. The relative test matters: clamping alone keeps the
    arithmetic finite, but an exactly-degenerate A with large healthy pivots
    still has a large determinant — the caller's absolute |det| >= 1e-6
    guard (reference semantics) would pass on sheer scale and the solve
    would step enormously along the unobservable direction. Scope honesty:
    in f32 the Cholesky cancellation noise is ~eps*scale (1e-7 relative), so
    this flag reliably catches EXACT degeneracy (indefinite inputs,
    duplicated/collinear constraint directions, all-masked systems — pivots
    <= 0 or identically tiny) but cannot distinguish a true sub-eps
    eigenvalue from rounding noise; those fall through to the chi2-increase
    rollback one iteration later, as in the reference."""
    N = A.shape[-1]
    L = [[None] * N for _ in range(N)]
    scale = A[..., 0, 0]
    for j in range(1, N):
        scale = jnp.maximum(scale, A[..., j, j])
    bad = ~jnp.isfinite(scale)
    for j in range(N):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        bad = bad | (s <= 1e-10 * scale)
        # clamp: keeps straight-line code finite for indefinite inputs; the
        # caller gates on `bad` / the det guard instead of solving them
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, N):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L, bad


def cholesky_det_solve(A: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Solve A x = b for SPD A (..., N, N) and return (x, det(A)).

    det(A) = prod(diag(L))^2 — used for the |det| >= 1e-6 Hessian guard.
    Indefinite A yields a clamped factorization; the caller must gate on the
    returned det / residual finiteness (matching the reference's behavior of
    aborting on bad Hessians rather than solving them).
    """
    N = A.shape[-1]
    L, bad = _chol_factor(A)
    det_sqrt = L[0][0]
    for j in range(1, N):
        det_sqrt = det_sqrt * L[j][j]
    det = jnp.where(bad, 0.0, det_sqrt * det_sqrt)

    # forward substitution L y = b
    y = [None] * N
    for i in range(N):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * N
    for i in reversed(range(N)):
        s = y[i]
        for k in range(i + 1, N):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1), det


def cholesky_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    return cholesky_det_solve(A, b)[0]


def cholesky_logdet_solve(A: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Solve A x = b and return (x, log|det(A)|).

    The raw determinant overflows f32 whenever the normal equations carry
    large Jacobians (close-range depth: A entries ~1e10, det ~1e60), which
    would spuriously trip the reference's finite-det guard that f64 passes
    (GaussNewton.cpp:59-63). The log-domain value never overflows; the guard
    becomes logdet < log(1e-6). Clamped (indefinite) pivots drive logdet to
    very negative values, preserving the abort-on-bad-Hessian behavior."""
    N = A.shape[-1]
    L, bad = _chol_factor(A)
    logdet = jnp.log(L[0][0])
    for j in range(1, N):
        logdet = logdet + jnp.log(L[j][j])
    # degenerate factorization -> -inf, so the caller's logdet < log(1e-6)
    # guard always rejects it (a rank-deficient A with large healthy pivots
    # would otherwise pass on sheer scale)
    logdet = jnp.where(bad, -jnp.inf, 2.0 * logdet)

    y = [None] * N
    for i in range(N):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * N
    for i in reversed(range(N)):
        s = y[i]
        for k in range(i + 1, N):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1), logdet


def inv3(A: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of (..., 3, 3) — replaces batched
    jnp.linalg.inv (LU while-loop) for the BA point blocks."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    rows = [
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


def inv_psd(A: jax.Array) -> jax.Array:
    """Inverse of an SPD matrix via N unrolled solves (columns of I)."""
    N = A.shape[-1]
    eye = jnp.eye(N, dtype=A.dtype)
    cols = [cholesky_solve(A, jnp.broadcast_to(eye[i], A.shape[:-2] + (N,))) for i in range(N)]
    return jnp.stack(cols, axis=-1)
