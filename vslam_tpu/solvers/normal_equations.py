"""Weighted normal equations as a small pytree.

Rebuild of reference `least_squares/src/NormalEquations.{h,cpp}`:
A = J^T W J, b = J^T W r, chi2 = r^T W r, nConstraints. On TPU the build step
is a single fused weighted matmul over the dense residual field; `combine` is
a tree-sum (this replaces `InverseCompositionalStacked`'s NE summation,
reference `InverseCompositionalStacked.cpp:38-47`).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

__all__ = ["NormalEquations", "build", "combine", "scale"]


class NormalEquations(NamedTuple):
    A: jax.Array  # (..., N, N)
    b: jax.Array  # (..., N)
    chi2: jax.Array  # (...,)
    n: jax.Array  # (...,) number of constraints (float for easy math)


def build(J: jax.Array, r: jax.Array, w: jax.Array, n: jax.Array | None = None) -> NormalEquations:
    """From stacked Jacobian rows ``J: (P, N)``, residuals ``r: (P,)`` and
    weights ``w: (P,)`` (zero rows simply contribute nothing — the TPU-native
    replacement for the reference's variable-length interest-point lists).

    ``n`` overrides the constraint count (reference counts interest points,
    including currently-invisible ones with w=0: `NormalEquations.cpp:52-60`
    uses r.rows()); defaults to P.
    """
    Jw = J * w[:, None]
    A = Jw.T @ J
    b = Jw.T @ r
    chi2 = jnp.sum(w * r * r)
    if n is None:
        n = jnp.asarray(J.shape[0], r.dtype)
    return NormalEquations(A, b, chi2, n)


def combine(nes: Sequence[NormalEquations]) -> NormalEquations:
    """Sum of normal equations (reference NormalEquations::combine)."""
    return jax.tree_util.tree_map(lambda *xs: sum(xs), *nes)


def scale(ne: NormalEquations, s) -> NormalEquations:
    return NormalEquations(ne.A * s, ne.b * s, ne.chi2 * s, ne.n)
