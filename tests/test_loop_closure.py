"""Loop closure: 3D-3D RANSAC verification, place recognition over keyframe
descriptor sets, and drift collapse through the global pose graph."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.core.frame import create_frame
from vslam_tpu.features.loop_closure import (
    KeyframeDatabase,
    LoopClosureConfig,
    estimate_rel_3d3d,
)
from vslam_tpu.features.tracking import FeatureTracking
from vslam_tpu.io import synthetic
from vslam_tpu.odometry.graph_backend import PoseGraphBackend
from vslam_tpu.odometry.map import HostFrame

H, W, FX = 96, 128, 110.0
K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)


def test_estimate_rel_3d3d_with_outliers():
    rng = np.random.default_rng(0)
    xi = np.array([0.1, -0.05, 0.2, 0.05, -0.03, 0.08])
    T_true = lie_np.exp(xi)
    p_old = rng.uniform(-1, 1, (40, 3)) + [0, 0, 2.5]
    p_new = p_old @ T_true[:3, :3].T + T_true[:3, 3]
    # corrupt 25% with gross outliers
    bad = rng.choice(40, 10, replace=False)
    p_new[bad] += rng.uniform(0.5, 1.5, (10, 3))
    T, inl = estimate_rel_3d3d(p_old, p_new, iterations=200, threshold=0.02, seed=1)
    assert inl.sum() >= 28
    err = np.linalg.norm(lie_np.log(lie_np.relative(T, T_true)))
    assert err < 0.01, err


def _host_frame(pose_true, pose_est, scene=None, t_ns=0):
    scene = scene or synthetic.BoxScene()
    i, d = synthetic.render_boxes(K, pose_true, (H, W), scene)
    f = HostFrame(
        frame=create_frame(jnp.asarray(i), jnp.asarray(d), CAM, n_levels=2),
        t_ns=t_ns,
        pose=np.asarray(pose_est, np.float64),
    )
    FeatureTracking().extract(f)
    return f


def test_pose_graph_backend_collapses_drift():
    """Out-and-back keyframe chain with injected odometry drift: the loop
    closure at the revisit must pull the final pose back toward truth
    (round-1 VERDICT #10 done-criterion)."""
    scene = synthetic.BoxScene(seed=4)
    # true poses: away (mostly out-of-view translations) and back to start
    offsets = [
        np.zeros(6),
        np.array([1.2, 0.0, 0.0, 0.0, 0.6, 0.0]),
        np.array([2.2, 0.4, 0.0, 0.0, 1.0, 0.0]),
        np.array([1.0, 0.6, 0.0, 0.0, 0.5, 0.0]),
        np.zeros(6),  # revisit of keyframe 0
    ]
    true_poses = [lie_np.exp(o) for o in offsets]
    # drift: growing error on the estimated chain (except the anchor)
    drift = [np.zeros(6)] + [0.05 * k * np.array([1.0, 0.4, 0, 0, 0.3, 0]) for k in range(1, 5)]
    est_poses = [lie_np.exp(d) @ p for d, p in zip(drift, true_poses)]

    backend = PoseGraphBackend(LoopClosureConfig(min_gap=2, min_matches=10, min_inliers=8))
    frames = []
    for k, (pt, pe) in enumerate(zip(true_poses, est_poses)):
        f = _host_frame(pt, pe, scene, t_ns=k)
        frames.append(f)
        backend.add_keyframe(f)
        corrections = backend.try_close(f)

    assert backend.n_closures >= 1, "revisit not detected"
    assert corrections is not None
    # error of the final keyframe pose before vs after closure
    err_before = np.linalg.norm(lie_np.log(lie_np.relative(est_poses[-1], true_poses[-1])))
    fixed = corrections[frames[-1].id]
    err_after = np.linalg.norm(lie_np.log(lie_np.relative(fixed, true_poses[-1])))
    assert err_after < 0.4 * err_before, (err_before, err_after)


def test_shortlist_bounds_verification_work(monkeypatch):
    """Place-recognition scaling: with `max_candidates` set, a query against a
    large database runs the cheap global-descriptor scan over every entry but
    the expensive (N, M) descriptor matrix + RANSAC for at most k entries —
    and still finds the true revisit among distractors."""
    from vslam_tpu.features import loop_closure as lc
    from vslam_tpu.features import matcher as match_mod

    rng = np.random.default_rng(11)
    scene = synthetic.BoxScene(seed=6)
    db = KeyframeDatabase(
        LoopClosureConfig(min_gap=0, min_matches=10, min_inliers=8, max_candidates=4)
    )
    f0 = _host_frame(np.eye(4), np.eye(4), scene, t_ns=0)
    f0.id = 0
    db.add(f0)
    # distractors: random binary descriptor sets + random geometry (no real
    # rendering needed — only the shortlist must reject them)
    for k in range(60):
        desc = (rng.random((80, 256)) < 0.5).astype(np.float32)
        pts = rng.uniform(-1, 1, (80, 3)) + [0, 0, 2.0]
        db._entries.append(
            lc._Entry(
                kf_id=100 + k,
                descriptors=desc,
                p_cam=pts,
                gdesc=lc._global_descriptor(desc),
            )
        )

    n_full = 0
    orig = match_mod.descriptor_l1_matrix

    def counted(a, b):
        nonlocal n_full
        n_full += 1
        return orig(a, b)

    monkeypatch.setattr(match_mod, "descriptor_l1_matrix", counted)

    # exact revisit of keyframe 0 (same view; repeatability under viewpoint
    # change is covered by test_pose_graph_backend_collapses_drift)
    f1 = _host_frame(np.eye(4), np.eye(4), scene, t_ns=1)
    f1.id = 999
    cand = db.query(f1)
    assert n_full <= 4, f"shortlist leaked: {n_full} full comparisons"
    assert cand is not None and cand.kf_id == 0, cand


def test_database_rejects_unrelated_views():
    """Views of disjoint scene regions must not produce verified loops."""
    scene = synthetic.BoxScene(seed=5)
    db = KeyframeDatabase(LoopClosureConfig(min_gap=0, min_matches=10, min_inliers=8))
    f0 = _host_frame(np.eye(4), np.eye(4), scene, t_ns=0)
    db.add(f0)
    # far sideways + large yaw: almost no shared surface
    far = lie_np.exp(np.array([3.0, 0.0, 0.0, 0.0, 1.2, 0.0]))
    f1 = _host_frame(far, far, scene, t_ns=1)
    cand = db.query(f1)
    assert cand is None


def test_estimate_rel_3d3d_survives_degenerate_hypotheses():
    """NaN-contaminated or collinear point triples among the RANSAC
    hypotheses must not abort the whole batched-Horn stack (np.linalg.svd
    raises for the full (K,3,3) batch): the remaining hypotheses still find
    the transform."""
    rng = np.random.default_rng(5)
    R = lie_np.exp(np.array([0.05, -0.2, 0.1, 0.2, -0.1, 0.15]))[:3, :3]
    t = np.array([0.3, -0.1, 0.2])
    p_old = rng.uniform(-1, 1, (40, 3))
    p_old[::7] = np.nan  # contaminated rows land in many sampled triples
    p_new = np.where(np.isfinite(p_old), p_old @ R.T + t, np.nan)
    T, inl = estimate_rel_3d3d(p_old, p_new, iterations=200, threshold=0.05)
    finite = np.isfinite(p_old).all(axis=1)
    assert inl.sum() >= 0.9 * finite.sum(), (inl.sum(), finite.sum())
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-6)
