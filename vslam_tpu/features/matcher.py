"""Brute-force feature matching as one dense distance matrix on the MXU.

Rebuild of reference `MatcherBruteForce` (Matcher.cpp:37-58): per query, the
best candidate must beat maxDistance and Lowe's ratio against the second
best. The reference's O(N*M) virtual-call loop becomes a single (N, M)
distance-matrix computation:

- descriptor L1 for binary vectors: |a| + |b| - 2 a.b  (one matmul)
- reprojection error (Matcher.cpp:73-90): candidate's 3-D point projected
  into the query frame, pixel distance to the query keypoint
- combined distance d + r (NodeMapping.cpp:103-113 custom matcher)

Also provides the epipolar distance (Matcher.cpp:59-72) built from the
fundamental matrix (algorithm.cpp computeF).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["MatchResult", "descriptor_l1_matrix", "reprojection_error_matrix", "epipolar_error_matrix", "ratio_match"]


class MatchResult(NamedTuple):
    idx: jax.Array  # (N,) best candidate index per query
    distance: jax.Array  # (N,)
    valid: jax.Array  # (N,) passed max-distance + ratio tests


def descriptor_l1_matrix(desc_q: jax.Array, desc_c: jax.Array) -> jax.Array:
    """(N, M) L1 distances between binary descriptors via one matmul."""
    na = jnp.sum(desc_q, axis=1, keepdims=True)  # (N, 1)
    nb = jnp.sum(desc_c, axis=1, keepdims=True).T  # (1, M)
    return na + nb - 2.0 * (desc_q @ desc_c.T)


def reprojection_error_matrix(
    p3d_c: jax.Array,  # (M, 3) candidate points in the QUERY camera frame
    uv_q: jax.Array,  # (N, 2) query keypoints
    fx, fy, cx, cy,
    invalid_value: float = 0.0,
) -> jax.Array:
    """(N, M) pixel reprojection distances; candidates behind the camera get
    `invalid_value` (the reference adds r only when finite,
    NodeMapping.cpp:105-110)."""
    z = p3d_c[:, 2]
    ok = z > 1e-6
    zs = jnp.where(ok, z, 1.0)
    u = fx * p3d_c[:, 0] / zs + cx
    v = fy * p3d_c[:, 1] / zs + cy
    du = uv_q[:, 0:1] - u[None, :]
    dv = uv_q[:, 1:2] - v[None, :]
    r = jnp.sqrt(du * du + dv * dv)
    return jnp.where(ok[None, :], r, invalid_value)


def epipolar_error_matrix(
    F: jax.Array,  # (3, 3) fundamental matrix candidate->query
    uv_q: jax.Array,  # (N, 2)
    uv_c: jax.Array,  # (M, 2)
) -> jax.Array:
    """(N, M) point-to-epipolar-line distances |x_q^T l| / ||l_xy||
    (Matcher.cpp:59-72)."""
    ones_c = jnp.ones((uv_c.shape[0], 1), uv_c.dtype)
    xc = jnp.concatenate([uv_c, ones_c], axis=1)  # (M, 3)
    l = xc @ F.T  # (M, 3) epipolar lines in the query image
    norm = jnp.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2)
    l = l / jnp.maximum(norm, 1e-12)[:, None]
    ones_q = jnp.ones((uv_q.shape[0], 1), uv_q.dtype)
    xq = jnp.concatenate([uv_q, ones_q], axis=1)
    return jnp.abs(xq @ l.T)  # (N, M)


def ratio_match(
    dist: jax.Array,  # (N, M)
    mask_q: Optional[jax.Array] = None,  # (N,) valid queries
    mask_c: Optional[jax.Array] = None,  # (M,) valid candidates
    max_distance: float = 1000.0,
    min_distance_ratio: float = 0.8,
    unique: bool = False,
) -> MatchResult:
    """Best + second-best per row; accept if best < maxDistance and
    best < ratio * second (Matcher.cpp:48-56).

    ``unique=True`` additionally enforces a one-to-one assignment: when
    several queries match the same candidate, only the lowest-distance query
    (ties broken by query index) keeps the match. The reference matcher is
    query-best-only; uniqueness prevents duplicate landmarks for one physical
    point in the tracking pipeline.
    """
    big = jnp.asarray(jnp.finfo(dist.dtype).max, dist.dtype)
    if mask_c is not None:
        dist = jnp.where(mask_c[None, :], dist, big)
    idx = jnp.argmin(dist, axis=1)
    best = jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0]
    dist2 = jnp.where(
        jax.nn.one_hot(idx, dist.shape[1], dtype=bool), big, dist
    )
    second = jnp.min(dist2, axis=1)
    valid = (best < max_distance) & (best < min_distance_ratio * second)
    if mask_q is not None:
        valid = valid & mask_q
    if unique:
        N, M = dist.shape
        key = jnp.where(valid, best, big)
        best_per_c = jnp.full((M,), big, dist.dtype).at[idx].min(key)
        is_best = valid & (key <= best_per_c[idx])
        qi = jnp.arange(N)
        winner_q = jnp.full((M,), N, qi.dtype).at[idx].min(jnp.where(is_best, qi, N))
        valid = is_best & (winner_q[idx] == qi)
    return MatchResult(idx=idx, distance=best, valid=valid)


def fundamental_matrix(K_ref: jax.Array, rel: "jax.Array", K_cur: jax.Array) -> jax.Array:
    """F from the relative transform cur<-ref and intrinsics (reference
    algorithm.cpp computeF): F = Kcur^-T [t]x R Kref^-1. `rel` is a 4x4 or
    (R, t) SE3; K are 3x3 intrinsic matrices."""
    if hasattr(rel, "R"):
        R, t = rel.R, rel.t
    else:
        R, t = rel[:3, :3], rel[:3, 3]
    tx = jnp.asarray(
        [
            [0.0, -t[2], t[1]],
            [t[2], 0.0, -t[0]],
            [-t[1], t[0], 0.0],
        ]
    )
    E = tx @ R
    return jnp.linalg.inv(K_cur).T @ E @ jnp.linalg.inv(K_ref)
