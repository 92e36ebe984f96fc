"""Pose-graph optimization tests: noisy odometry chain + loop closure."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.ba.pose_graph import PoseGraph, optimize_pose_graph
from vslam_tpu.core import lie_np
from vslam_tpu.core.se3 import SE3


def build_loop(rng, K=8, odo_noise=0.02):
    """Ground-truth loop of K poses; odometry edges with noise + one exact
    loop-closure edge (K-1 -> 0)."""
    poses_gt = [np.eye(4)]
    step = np.array([0.4, 0.0, 0.1, 0.0, 2 * np.pi / K, 0.0])
    for k in range(1, K):
        poses_gt.append(lie_np.exp(step) @ poses_gt[-1])

    edges = []
    for k in range(K - 1):
        rel_true = lie_np.relative(poses_gt[k], poses_gt[k + 1])
        noise = lie_np.exp(rng.normal(0, odo_noise, 6))
        edges.append((k, k + 1, noise @ rel_true, 1.0))
    # exact loop closure with high information
    edges.append((K - 1, 0, lie_np.relative(poses_gt[K - 1], poses_gt[0]), 100.0))

    # initialize by integrating the NOISY odometry
    init = [np.eye(4)]
    for k in range(K - 1):
        init.append(edges[k][2] @ init[-1])

    E = len(edges)
    g = PoseGraph(
        poses=SE3(
            jnp.asarray(np.stack([T[:3, :3] for T in init]), jnp.float32),
            jnp.asarray(np.stack([T[:3, 3] for T in init]), jnp.float32),
        ),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        edge_rel=SE3(
            jnp.asarray(np.stack([e[2][:3, :3] for e in edges]), jnp.float32),
            jnp.asarray(np.stack([e[2][:3, 3] for e in edges]), jnp.float32),
        ),
        edge_info=jnp.asarray(
            np.stack([np.eye(6) * e[3] for e in edges]), jnp.float32
        ),
        edge_mask=jnp.ones(E, bool),
    )
    return g, poses_gt, init


def _pose_errors(poses, poses_gt):
    errs = []
    for k in range(len(poses_gt)):
        T = np.eye(4)
        T[:3, :3] = np.asarray(poses.R[k], np.float64)
        T[:3, 3] = np.asarray(poses.t[k], np.float64)
        errs.append(np.linalg.norm(lie_np.log(lie_np.relative(T, poses_gt[k]))))
    return np.asarray(errs)


def test_loop_closure_reduces_drift(rng):
    g, poses_gt, init = build_loop(rng)
    poses, c0, c1 = optimize_pose_graph(g, max_iterations=30)
    assert float(c1) < 0.1 * float(c0)
    err_init = _pose_errors(
        SE3(g.poses.R, g.poses.t), poses_gt
    )
    err_opt = _pose_errors(poses, poses_gt)
    # drift at the loop end must shrink substantially
    assert err_opt.max() < 0.5 * err_init.max(), (err_init.max(), err_opt.max())
    assert err_opt.mean() < 0.6 * err_init.mean()


def test_consistent_graph_stays_put(rng):
    g, poses_gt, _ = build_loop(rng, odo_noise=0.0)
    poses, c0, c1 = optimize_pose_graph(g, max_iterations=10)
    assert float(c0) < 1e-6
    assert float(c1) <= float(c0) + 1e-9


def test_padded_graph_matches_unpadded():
    """pad_pose_graph bucketing (the live backend's bounded-recompile
    mechanism): frozen padding nodes and masked padding edges must not
    change the solution."""
    from vslam_tpu.ba.pose_graph import pad_pose_graph

    rng = np.random.default_rng(11)
    g, _, _ = build_loop(rng, K=8)
    opt_a, c0_a, c1_a = optimize_pose_graph(g)
    gp, node_mask = pad_pose_graph(g, 16, 32)
    opt_b, c0_b, c1_b = optimize_pose_graph(gp, node_mask=node_mask)
    np.testing.assert_allclose(float(c0_a), float(c0_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(opt_a.t), np.asarray(opt_b.t)[:8], atol=1e-4)
    np.testing.assert_allclose(float(c1_a), float(c1_b), rtol=0.05, atol=1e-6)


def test_large_graph_scales():
    """Hundreds of nodes: the O(E) block-Jacobian formulation must optimize
    a 200-node drift loop (the old stacked-jacfwd formulation was O(K*E) and
    ran out of practicality here)."""
    import time

    rng = np.random.default_rng(5)
    K = 200
    g, _, _ = build_loop(rng, K=K, odo_noise=0.01)
    t0 = time.perf_counter()
    opt, c0, c1 = optimize_pose_graph(g, max_iterations=25)
    elapsed = time.perf_counter() - t0
    assert float(c1) < 0.1 * float(c0), (float(c0), float(c1))
    # drift at the loop end collapses toward the closure constraint
    d_end = np.linalg.norm(np.asarray(opt.t)[K - 1] - np.asarray(g.poses.t)[K - 1])
    assert np.isfinite(d_end)
    assert elapsed < 300, f"200-node graph took {elapsed:.0f}s"


def test_pcg_matches_dense(rng):
    """The matrix-free block-Jacobi PCG path must reproduce the dense exact
    solve on the same LM trajectory (inexact inner solves may change the
    path slightly; the optimum and the chi2 reduction must agree)."""
    g, poses_gt, _ = build_loop(rng, K=16, odo_noise=0.02)
    opt_d, c0_d, c1_d = optimize_pose_graph(g, max_iterations=30, solver="dense")
    opt_p, c0_p, c1_p = optimize_pose_graph(
        g, max_iterations=30, solver="pcg", max_cg=256, cg_rtol=1e-8
    )
    np.testing.assert_allclose(float(c0_d), float(c0_p), rtol=1e-5)
    assert float(c1_p) < 0.1 * float(c0_p)
    # both land on the same optimum
    np.testing.assert_allclose(np.asarray(opt_p.t), np.asarray(opt_d.t), atol=5e-3)
    err_d = _pose_errors(opt_d, poses_gt)
    err_p = _pose_errors(opt_p, poses_gt)
    assert err_p.max() < err_d.max() * 1.5 + 1e-3


def test_pcg_large_chain_with_loops():
    """Beyond-dense regime rehearsal: a 400-node noisy chain with 5 loop
    closures solved with the explicit matrix-free PCG path (auto routes to
    dense below 768 nodes — measured faster AND exact there; this pins the
    PCG path that takes over beyond, without ever materializing the
    (K6, K6) Hessian)."""
    import time

    rng = np.random.default_rng(7)
    K = 400
    poses_gt = [np.eye(4)]
    step = np.array([0.4, 0.0, 0.05, 0.0, 2 * np.pi / K, 0.0])
    for k in range(1, K):
        poses_gt.append(lie_np.exp(step) @ poses_gt[-1])

    edges = []
    for k in range(K - 1):
        rel_true = lie_np.relative(poses_gt[k], poses_gt[k + 1])
        noise = lie_np.exp(rng.normal(0, 0.01, 6))
        edges.append((k, k + 1, noise @ rel_true, 1.0))
    # loop closures at regular spacing (exact, high information)
    for a, b in [(K - 1, 0), (K // 2, 0), (3 * K // 4, K // 4),
                 (K - 1, K // 2), (K // 3, 0)]:
        edges.append((a, b, lie_np.relative(poses_gt[a], poses_gt[b]), 100.0))

    init = [np.eye(4)]
    for k in range(K - 1):
        init.append(edges[k][2] @ init[-1])

    E = len(edges)
    g = PoseGraph(
        poses=SE3(
            jnp.asarray(np.stack([T[:3, :3] for T in init]), jnp.float32),
            jnp.asarray(np.stack([T[:3, 3] for T in init]), jnp.float32),
        ),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        edge_rel=SE3(
            jnp.asarray(np.stack([e[2][:3, :3] for e in edges]), jnp.float32),
            jnp.asarray(np.stack([e[2][:3, 3] for e in edges]), jnp.float32),
        ),
        edge_info=jnp.asarray(np.stack([np.eye(6) * e[3] for e in edges]), jnp.float32),
        edge_mask=jnp.ones(E, bool),
    )

    t0 = time.perf_counter()
    opt, c0, c1 = optimize_pose_graph(g, max_iterations=30, solver="pcg", max_cg=512)
    elapsed = time.perf_counter() - t0
    assert float(c1) < 0.05 * float(c0), (float(c0), float(c1))
    err_init = _pose_errors(SE3(g.poses.R, g.poses.t), poses_gt)
    err_opt = _pose_errors(opt, poses_gt)
    assert err_opt.max() < 0.3 * err_init.max(), (err_init.max(), err_opt.max())
    assert elapsed < 300, f"400-node PCG graph took {elapsed:.0f}s"
