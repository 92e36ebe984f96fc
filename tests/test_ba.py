"""Bundle-adjustment tests: synthetic observations, perturbed initialization,
assert errorAfter << errorBefore and pose recovery (mirrors reference
`test_ba.cpp` / `test_ceres_ba.cpp` expectations)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.ba.bundle_adjustment import BaProblem, solve_ba
from vslam_tpu.core import lie_np
from vslam_tpu.core.se3 import SE3

FX = FY = 200.0
CX, CY = 160.0, 120.0


def make_problem(rng, K=3, M=40, noise_pose=0.03, noise_point=0.05):
    # ground-truth poses along a small arc; world points in front
    poses_gt = [lie_np.exp(np.array([0.2 * k, 0.05 * k, 0.0, 0.0, 0.1 * k, 0.0])) for k in range(K)]
    points_gt = np.stack(
        [rng.uniform(-1.5, 1.5, M), rng.uniform(-1.0, 1.0, M), rng.uniform(2.5, 5.0, M)], axis=1
    )

    obs_frame, obs_point, obs_uv = [], [], []
    for k, T in enumerate(poses_gt):
        pc = lie_np.transform(T, points_gt)
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        for m in range(M):
            if pc[m, 2] > 0.5 and 0 < u[m] < 2 * CX and 0 < v[m] < 2 * CY:
                obs_frame.append(k)
                obs_point.append(m)
                obs_uv.append([u[m], v[m]])

    # perturb everything except pose 0 (gauge anchor)
    poses_init = [poses_gt[0]] + [
        lie_np.exp(rng.normal(0, noise_pose, 6)) @ T for T in poses_gt[1:]
    ]
    points_init = points_gt + rng.normal(0, noise_point, points_gt.shape)

    O = len(obs_frame)
    problem = BaProblem(
        poses=SE3(
            jnp.asarray(np.stack([T[:3, :3] for T in poses_init]), jnp.float32),
            jnp.asarray(np.stack([T[:3, 3] for T in poses_init]), jnp.float32),
        ),
        pose_mask=jnp.ones(K, bool),
        points=jnp.asarray(points_init, jnp.float32),
        point_mask=jnp.ones(M, bool),
        obs_frame=jnp.asarray(obs_frame, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_mask=jnp.ones(O, bool),
        fx=jnp.float32(FX), fy=jnp.float32(FY), cx=jnp.float32(CX), cy=jnp.float32(CY),
    )
    return problem, poses_gt, points_gt


def test_ba_reduces_error_and_recovers_poses(rng):
    problem, poses_gt, points_gt = make_problem(rng)
    poses, points, err0, err1 = solve_ba(problem, max_iterations=40)
    assert err1 < 1e-3 * err0, (err0, err1)
    # reprojection-only BA leaves the similarity gauge (global scale) free —
    # the anchor pins only 6 DOF (the reference's Ceres setup pins none), so
    # compare gauge-invariant quantities: rotation and translation direction.
    # The depth-anchored variant below shows tight absolute recovery.
    for k in range(1, 3):
        R = np.asarray(poses.R[k], np.float64)
        t = np.asarray(poses.t[k], np.float64)
        rot_err = np.linalg.norm(
            lie_np.matrix_to_rotvec(R.T @ poses_gt[k][:3, :3])
        )
        assert rot_err < 0.01, f"pose {k} rotation error {rot_err}"
        t_gt = poses_gt[k][:3, 3]
        cos = np.dot(t, t_gt) / (np.linalg.norm(t) * np.linalg.norm(t_gt))
        assert cos > 0.999, f"pose {k} translation direction cos {cos}"
        scale = np.linalg.norm(t) / np.linalg.norm(t_gt)
        assert 0.7 < scale < 1.3, f"pose {k} gauge scale {scale}"  # flat direction


def test_ba_depth_anchored_recovers_tightly(rng):
    """With RGB-D depth residuals the scale gauge is pinned and poses recover
    to sub-0.01 accuracy (capability beyond the reference's mono BA)."""
    problem, poses_gt, points_gt = make_problem(rng)
    # synthesize measured depths from ground truth geometry
    obs_z = []
    for o in range(len(np.asarray(problem.obs_frame))):
        k = int(problem.obs_frame[o]); m = int(problem.obs_point[o])
        pc = lie_np.transform(poses_gt[k], points_gt[m][None, :])[0]
        obs_z.append(pc[2])
    problem = problem._replace(obs_z=jnp.asarray(obs_z, jnp.float32))
    poses, points, err0, err1 = solve_ba(problem, max_iterations=40)
    assert err1 < 1e-2 * err0
    for k in range(1, 3):
        T = np.eye(4)
        T[:3, :3] = np.asarray(poses.R[k], np.float64)
        T[:3, 3] = np.asarray(poses.t[k], np.float64)
        err = np.linalg.norm(lie_np.log(lie_np.relative(T, poses_gt[k])))
        assert err < 0.01, f"pose {k} error {err}"


def test_ba_noise_free_stays_put(rng):
    problem, poses_gt, _ = make_problem(rng, noise_pose=0.0, noise_point=0.0)
    poses, points, err0, err1 = solve_ba(problem, max_iterations=10)
    assert err0 < 1e-4
    assert err1 <= err0 + 1e-6


def test_ba_behind_camera_observations_ignored(rng):
    problem, _, _ = make_problem(rng)
    # corrupt some points to sit behind the cameras; solve must not blow up
    pts = np.asarray(problem.points).copy()
    pts[:3, 2] = -1.0
    problem = problem._replace(points=jnp.asarray(pts))
    poses, points, err0, err1 = solve_ba(problem, max_iterations=20)
    assert np.isfinite(err1)
    assert err1 <= err0


def test_ba_host_wrapper(rng):
    """End-to-end through Map/Landmark bookkeeping."""
    from vslam_tpu.ba.bundle_adjustment import BundleAdjustment
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.core.frame import create_frame
    from vslam_tpu.odometry.map import HostFrame, Landmark, Map

    K_POSES = 3
    problem, poses_gt, points_gt = make_problem(rng)
    m = Map()
    cam = Camera.create(FX, FY, CX, CY)
    dummy = create_frame(
        jnp.zeros((24, 32), jnp.float32), jnp.ones((24, 32), jnp.float32),
        Camera.create(FX, FY, CX, CY), n_levels=1
    )
    frames = []
    for k in range(K_POSES):
        T = np.eye(4)
        T[:3, :3] = np.asarray(problem.poses.R[k], np.float64)
        T[:3, 3] = np.asarray(problem.poses.t[k], np.float64)
        f = HostFrame(frame=dummy, t_ns=k, pose=T)
        f.keypoints = np.zeros((0, 2), np.float32)
        f.kp_landmark = np.zeros(0, np.int64)
        frames.append(f)
        m.insert(f, is_keyframe=True)

    # landmarks + observations from the synthetic problem
    lms = {}
    obs_f = np.asarray(problem.obs_frame)
    obs_p = np.asarray(problem.obs_point)
    obs_uv = np.asarray(problem.obs_uv)
    kp_lists = [[] for _ in range(K_POSES)]
    for o in range(len(obs_f)):
        k, mm = int(obs_f[o]), int(obs_p[o])
        if mm not in lms:
            lms[mm] = Landmark(position=np.asarray(problem.points)[mm].astype(np.float64))
        fi = len(kp_lists[k])
        kp_lists[k].append(obs_uv[o])
        lms[mm].observations[frames[k].id] = fi
    for k in range(K_POSES):
        frames[k].keypoints = np.asarray(kp_lists[k], np.float32)
    m.insert_points(list(lms.values()))

    ba = BundleAdjustment(max_iterations=40)
    poses, points, err0, err1 = ba.optimize(m)
    assert err1 < err0
    assert set(poses.keys()) == {f.id for f in frames}


# ---------------------------------------------------------------------------
# Reference-fixture parity: the exact BA problem the reference tests ship
# (test_ba.cpp TestBundleAdjustment: Rt.csv / points3d.csv / observations{1,2}
# .csv, camera 525/525/319.5/239.5, points perturbed by U(-1,1) per axis,
# poses left at ground truth, EXPECT errorAfter < errorBefore).
# ---------------------------------------------------------------------------

from vslam_tpu.io import real_fixtures as rf


@pytest.mark.skipif(not rf.available(), reason="reference fixtures not present")
def test_ba_reference_csv_fixture():
    import os

    res = rf._ODOM_RES
    Rt = np.loadtxt(os.path.join(res, "Rt.csv"), delimiter=",")
    # the reference loads fixed-size matrices — the FIRST 100 rows of each
    # file (Eigen::Matrix<double,100,3>, test_ba.cpp TestBundleAdjustment)
    points_gt = np.loadtxt(os.path.join(res, "points3d.csv"), delimiter=",")[:100]
    obs1 = np.loadtxt(os.path.join(res, "observations1.csv"), delimiter=",")[:100]
    obs2 = np.loadtxt(os.path.join(res, "observations2.csv"), delimiter=",")[:100]
    assert Rt.shape == (4, 4) and points_gt.shape == (100, 3)

    fx = fy = 525.0
    cx, cy = 319.5, 239.5
    poses_gt = [np.eye(4), Rt]

    # same init as the reference: poses at ground truth, points perturbed by
    # U(-1,1) per axis (test_ba.cpp TestBundleAdjustment ctor)
    r = np.random.default_rng(7)
    points_init = points_gt + r.uniform(-1.0, 1.0, points_gt.shape)

    M = points_gt.shape[0]
    obs_frame = np.concatenate([np.zeros(M, np.int32), np.ones(M, np.int32)])
    obs_point = np.concatenate([np.arange(M), np.arange(M)]).astype(np.int32)
    obs_uv = np.concatenate([obs1, obs2], axis=0)

    problem = BaProblem(
        poses=SE3(
            jnp.asarray(np.stack([T[:3, :3] for T in poses_gt]), jnp.float32),
            jnp.asarray(np.stack([T[:3, 3] for T in poses_gt]), jnp.float32),
        ),
        pose_mask=jnp.ones(2, bool),
        points=jnp.asarray(points_init, jnp.float32),
        point_mask=jnp.ones(M, bool),
        obs_frame=jnp.asarray(obs_frame),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_mask=jnp.ones(2 * M, bool),
        fx=jnp.float32(fx), fy=jnp.float32(fy), cx=jnp.float32(cx), cy=jnp.float32(cy),
    )
    poses, points, err0, err1 = solve_ba(problem, max_iterations=60)

    # the reference's own assertion
    assert err1 < err0
    # stronger: the perturbation must be substantially recovered (the floor is
    # the fixtures' pixel quantization; measured 61249 -> 28)
    assert err1 < 0.01 * err0, (err0, err1)
    # Pose recovery is gauge-invariant only: reprojection-only two-view BA
    # leaves the monocular scale free (the reference's Ceres setup has the
    # same flat direction, which is why test_ba.cpp asserts error decrease
    # only). Rotation and translation DIRECTION must match the fixture's Rt.
    R1 = np.asarray(poses.R[1], np.float64)
    t1 = np.asarray(poses.t[1], np.float64)
    rot_err = np.linalg.norm(lie_np.matrix_to_rotvec(R1.T @ Rt[:3, :3]))
    assert rot_err < 0.02, f"rotation off fixture Rt: {rot_err}"
    cos = t1 @ Rt[:3, 3] / (np.linalg.norm(t1) * np.linalg.norm(Rt[:3, 3]))
    assert cos > 0.999, f"translation direction cos: {cos}"
