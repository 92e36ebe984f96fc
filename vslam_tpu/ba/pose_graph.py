"""Pose-graph optimization over SE(3) relative-pose constraints.

The full-SLAM backend named in BASELINE.json's configs ("keyframe graph +
windowed BA + pose-graph backend"); the reference itself stops at windowed
BA, so this is a capability extension built on the framework's Lie core.

Formulation: node poses T_i (world->cam), edges with measured relatives
Z_ij ~ T_j . T_i^-1 and 6x6 information. Residual per edge
r = log(Z_ij^-1 . T_j . T_i^-1); states are tangent offsets around the
initialization (T_i = exp(d_i) . T_i0), so Jacobians come from jax.jacfwd
through the framework's exp/log — exact, no hand-derived adjoints. Graph
sizes here are small (keyframe windows / loop closures), so a dense LM on
the (K*6)-dim state is one solve per iteration. Node 0 is the gauge anchor.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.se3 import SE3

__all__ = ["PoseGraph", "optimize_pose_graph"]


class PoseGraph(NamedTuple):
    poses: SE3  # (K,) initial node poses (world->cam)
    edge_i: jax.Array  # (E,) int32 source node
    edge_j: jax.Array  # (E,) int32 target node
    edge_rel: SE3  # (E,) measured T_j . T_i^-1
    edge_info: jax.Array  # (E, 6, 6) information matrices
    edge_mask: jax.Array  # (E,) bool


def _residuals(g: PoseGraph, d: jax.Array) -> jax.Array:
    """(E, 6) stacked edge residuals at tangent offsets d (K, 6)."""
    T = se3.compose(se3.exp(d), g.poses)  # (K,)
    Ti = jax.tree_util.tree_map(lambda x: x[g.edge_i], T)
    Tj = jax.tree_util.tree_map(lambda x: x[g.edge_j], T)
    rel = se3.compose(Tj, se3.inverse(Ti))
    err = se3.compose(se3.inverse(g.edge_rel), rel)
    r = se3.log(err)
    return jnp.where(g.edge_mask[:, None], r, 0.0)


def optimize_pose_graph(
    g: PoseGraph,
    max_iterations: int = 30,
    lambda0: float = 1e-4,
) -> Tuple[SE3, jax.Array, jax.Array]:
    """LM over the stacked tangent state. Returns (poses, chi2_before,
    chi2_after)."""
    K = g.poses.t.shape[0]
    E = g.edge_i.shape[0]
    dtype = g.poses.t.dtype

    # edge weights via Cholesky of the information: w-residual = L^T r
    Lt = jnp.linalg.cholesky(
        g.edge_info + 1e-9 * jnp.eye(6, dtype=dtype)
    ).transpose(0, 2, 1)

    def wres(d):
        r = _residuals(g, d.reshape(K, 6))
        return jnp.einsum("eij,ej->ei", Lt, r).reshape(-1)

    def chi2(d):
        r = wres(d)
        return jnp.sum(r * r)

    jac = jax.jacfwd(wres)

    def body(carry):
        d, c_prev, lam, it, done = carry
        r = wres(d)
        J = jac(d)  # (E*6, K*6)
        A = J.T @ J
        b = J.T @ r
        # gauge: freeze node 0
        free = jnp.repeat(jnp.arange(K) > 0, 6)
        A = jnp.where(free[:, None] & free[None, :], A, 0.0)
        A = A + jnp.diag(jnp.where(free, lam, 1.0))
        b = jnp.where(free, b, 0.0)
        dx = jnp.linalg.solve(A, b)
        d_new = d - dx
        c_new = chi2(d_new)
        accept = (c_new < c_prev) & jnp.isfinite(c_new)
        d = jnp.where(accept, d_new, d)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 5.0, 1e8))
        done = (accept & (jnp.linalg.norm(dx) < 1e-8)) | (lam >= 1e8)
        return d, jnp.where(accept, c_new, c_prev), lam, it + 1, done

    def cond(carry):
        return (~carry[4]) & (carry[3] < max_iterations)

    d0 = jnp.zeros(K * 6, dtype)
    c0 = chi2(d0)
    out = jax.lax.while_loop(
        cond, body, (d0, c0, jnp.asarray(lambda0, dtype), jnp.asarray(0), jnp.asarray(False))
    )
    d_fin, c_fin = out[0], out[1]
    poses = se3.compose(se3.exp(d_fin.reshape(K, 6)), g.poses)
    poses = se3.orthonormalize(poses)
    return poses, c0, c_fin


optimize_pose_graph_jit = jax.jit(optimize_pose_graph, static_argnames=("max_iterations",))
