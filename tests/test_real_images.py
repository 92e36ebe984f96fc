"""Real-image validation tier, built on the reference's own shipped fixtures.

Mirrors the reference's real-image tests with exact known ground truth:
- warp-recovery on the rendered sim scene (`test_lukas_kanade_se3.cpp:59-77`,
  fixtures sim.jpg / sim.exr at quarter scale, fx = 381/4);
- warp-recovery on the real photo at constant depth (the commented person.jpg
  variant, `test_lukas_kanade_se3.cpp:48-49`);
- feature extraction / matching / triangulation invariants on the real RGB-D
  pair (`test_tracking.cpp:33-120`, fixtures rgb.png / depth.png,
  cam 525/525/319.5/239.5, depth / 5000);
- a short full-pipeline odometry run on real texture;
- per-pair alignment within the reference's 0.01 SE(3) budget
  (`test_alignment_se3.cpp:119`).

All ground-truth pairs are synthesized by *exact* view synthesis
(`io/real_fixtures.py`): inverse RGB-D warp, plane-induced homography, or
pure-rotation re-rendering — no approximation in the photometric model.
"""

import dataclasses

import numpy as np
import pytest

from vslam_tpu.alignment import AlignmentConfig, RgbdAligner
from vslam_tpu.config import PipelineConfig
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.core.frame import create_frame
from vslam_tpu.eval import metrics
from vslam_tpu.io import real_fixtures as rf
from vslam_tpu.io import synthetic
from vslam_tpu.odometry.pipeline import OdometryPipeline
from vslam_tpu.solvers import LossConfig, SolverConfig

pytestmark = pytest.mark.skipif(
    not rf.available(), reason="reference fixture images not present"
)


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    """Free accumulated jit executables before this module's large pipeline
    compiles: after ~170 prior tests the XLA:CPU JIT sporadically segfaults
    compiling the coarse-to-fine align program (observed repeatedly at
    test_real_texture_odometry_sequence in full-suite runs; never in
    isolation). Dropping the cached executables keeps the compiler's memory
    state within what it tolerates."""
    import jax

    jax.clear_caches()
    yield


def _aligner_cfg(**kw):
    base = dict(
        min_gradient=10.0,
        solver=SolverConfig(max_iterations=60, min_step_size=1e-8),
        loss=LossConfig("None"),
        include_prior=False,
        interpolation="bilinear",
        max_points=8192,
    )
    base.update(kw)
    return AlignmentConfig(**base)


@pytest.fixture(scope="module")
def sim_quarter():
    """sim scene at quarter scale, the reference test's exact setup
    (`test_lukas_kanade_se3.cpp:43-50`): fx = 381/4, principal point at the
    image center."""
    img, depth = rf.load_sim()
    img = rf.resize_half(img, 2)
    depth = rf.resize_half(depth, 2)
    H, W = img.shape
    K = synthetic.camera_matrix(381 / 4, 381 / 4, W / 2, H / 2)
    return img, depth, K


@pytest.fixture(scope="module")
def rgbd_pair():
    img, depth = rf.load_rgbd_pair()
    K = synthetic.camera_matrix(525.0, 525.0, 319.5, 239.5)
    return img, depth, K


def test_exr_fixture_decodes():
    _, depth = rf.load_sim()
    assert depth.shape == (480, 640)
    assert float(np.min(depth)) >= 0.0
    valid = depth[depth > 0]
    assert 0.1 < float(np.median(valid)) < 100.0
    assert (depth > 0).mean() > 0.9


def test_exr_roundtrip(tmp_path):
    from vslam_tpu.io.exr import read_exr, write_exr

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 8, (70, 90)).astype(np.float32)
    p = str(tmp_path / "d.exr")
    write_exr(p, x)
    np.testing.assert_array_equal(read_exr(p), x)


@pytest.mark.parametrize(
    "profile, budget",
    [
        ({"sampler": "gather"}, 0.01),
        # Robust losses (reference option, not its canonical config): on
        # scenes where texture is concentrated, the M-estimator's scale
        # treats the informative heavy-tail residuals as outliers and the
        # robust minimum sits a few hundredths off the true pose — a property
        # of the reference formulation itself (Scaler.cpp:21-35 pairing),
        # reproduced here; the reference's own sim test budget is 0.1
        # (test_lukas_kanade_se3.cpp:75).
        ({"sampler": "gather", "loss": LossConfig("Tukey")}, 0.05),
        ({"sampler": "gather", "loss": LossConfig("tdistribution")}, 0.05),
        ({"sampler": "fused_gn", "interpolation": "bilinear"}, 0.01),
        ({"sampler": "fused_gn", "image_dtype": "bfloat16"}, 0.01),
    ],
    ids=["gather", "tukey", "tdist", "fused_gn", "fused_gn_bf16"],
)
@pytest.mark.parametrize("seed", [0, 1])
def test_sim_warp_recovery(sim_quarter, profile, budget, seed):
    """Known SE(3) warp on the real sim render + EXR depth is recovered within
    the reference's 0.01 budget (default profile; looser for the robust-loss
    options, see parametrization note)."""
    img, depth, K = sim_quarter
    rng = np.random.default_rng(seed)
    xi = np.zeros(6)
    xi[:3] = rng.uniform(0.02, 0.03, 3) * rng.choice([-1, 1], 3)
    xi[3:] = rng.uniform(0.004, 0.006, 3) * rng.choice([-1, 1], 3)
    rel_true = lie_np.exp(xi)

    i_ref, d_ref = rf.warp_rgbd_pair(img, depth, K, rel_true)
    cam = Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    f_ref = create_frame(i_ref, d_ref, cam, n_levels=3)
    f_cur = create_frame(img, depth, cam, n_levels=3)

    cfg = _aligner_cfg(**profile)
    pose_est, _, ok = RgbdAligner(cfg).align([f_ref], [np.eye(4)], f_cur, np.eye(4))
    assert ok
    err = np.linalg.norm(lie_np.log(lie_np.relative(pose_est, rel_true)))
    assert err < budget, f"pose error {err} (profile {profile})"


def test_person_constant_depth_recovery():
    """Full-SE(3) warp of the real photo on a constant-depth plane (the
    reference's commented person.jpg-at-constant-depth variant)."""
    tex = rf.resize_half(rf.load_person(), 1)  # 240x320
    H, W = tex.shape
    K = synthetic.camera_matrix(262.5, 262.5, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    xi = np.array([0.02, -0.015, 0.025, 0.006, -0.005, 0.008])
    pose_cur = lie_np.exp(xi)

    i0, d0 = rf.render_plane_texture(tex, K, np.eye(4), plane_depth=2.0)
    i1, d1 = rf.render_plane_texture(tex, K, pose_cur, plane_depth=2.0)
    f_ref = create_frame(i0, d0, cam, n_levels=3)
    f_cur = create_frame(i1, d1, cam, n_levels=3)

    pose_est, _, ok = RgbdAligner(_aligner_cfg()).align(
        [f_ref], [np.eye(4)], f_cur, np.eye(4)
    )
    assert ok
    err = np.linalg.norm(lie_np.log(lie_np.relative(pose_est, pose_cur)))
    assert err < 0.01, f"pose error {err}"


def test_real_rgbd_pair_alignment(rgbd_pair):
    """Per-pair alignment on the real RGB-D fixture with a full SE(3) motion,
    synthesized exactly on the real depth (sensor holes, occlusion structure)
    — the per-pair budget of test_alignment_se3.cpp:119."""
    img, depth, K = rgbd_pair
    img = rf.resize_half(img, 1)
    depth = rf.resize_half(depth, 1)
    K2 = K / 2.0
    K2[2, 2] = 1.0
    xi = np.array([0.015, -0.01, 0.02, 0.004, -0.006, 0.005])
    rel_true = lie_np.exp(xi)
    i_ref, d_ref = rf.warp_rgbd_pair(img, depth, K2, rel_true)

    cam = Camera.create(K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2])
    f_ref = create_frame(i_ref, d_ref, cam, n_levels=3)
    f_cur = create_frame(img, depth, cam, n_levels=3)
    pose_est, _, ok = RgbdAligner(_aligner_cfg()).align(
        [f_ref], [np.eye(4)], f_cur, np.eye(4)
    )
    assert ok
    err = np.linalg.norm(lie_np.log(lie_np.relative(pose_est, rel_true)))
    assert err < 0.01, f"pose error {err}"


def test_self_alignment_real_rgbd_perturbed(rgbd_pair):
    """The reference's own sim-test structure (test_lukas_kanade_se3.cpp:
    51-76, img1 == img0): align the real RGB-D frame to itself starting from
    a perturbed relative pose; the solve must drive the warp back to
    identity. Exercises real depth + texture with an exact ground truth and
    no synthesis interpolation at the solution."""
    img, depth, K = rgbd_pair
    img = rf.resize_half(img, 1)
    depth = rf.resize_half(depth, 1)
    K2 = K / 2.0
    K2[2, 2] = 1.0
    cam = Camera.create(K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2])
    f = create_frame(img, depth, cam, n_levels=3)
    xi = np.array([0.01, -0.008, 0.012, 0.003, -0.004, 0.004])
    pred = lie_np.exp(xi)  # wrong initial guess; truth is identity

    pose_est, _, ok = RgbdAligner(_aligner_cfg()).align(
        [f], [np.eye(4)], f, pred
    )
    assert ok
    err = np.linalg.norm(lie_np.log(pose_est))
    assert err < 0.005, f"did not return to identity: {err}"


def test_rotation_view_synthesis_consistency(rgbd_pair):
    """render_rotated_view produces a photometrically consistent novel view:
    warping the source by the same rotation reproduces it up to bilinear
    double-resampling noise (real indoor texture: a few intensity units)."""
    img, depth, K = rgbd_pair
    img = rf.resize_half(img, 1)
    depth = rf.resize_half(depth, 1)
    K2 = K / 2.0
    K2[2, 2] = 1.0
    w = np.array([0.008, -0.012, 0.006])
    R = lie_np.exp(np.concatenate([np.zeros(3), w]))[:3, :3]
    i1, d1 = rf.render_rotated_view(img, depth, K2, R)
    assert (d1 > 0).mean() > 0.4  # holes from sensor gaps + boundary guard
    fx, fy, cx, cy = K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]
    H, W = img.shape
    xs, ys = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    dvalid = depth > 0
    z = np.where(dvalid, depth, 1.0)
    p = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z], -1)
    q = p @ R.T
    u = fx * q[..., 0] / q[..., 2] + cx
    v = fy * q[..., 1] / q[..., 2] + cy
    val, vis = rf.bilinear(i1, u, v)
    z1, _ = rf.bilinear(d1, u, v)
    ok = dvalid & vis & (z1 > 0)
    r = np.abs(val - img)[ok]
    assert ok.mean() > 0.4
    assert float(np.median(r)) < 5.0, float(np.median(r))


# --- feature tracking invariants on the real RGB-D pair (test_tracking.cpp) ---


def _host_frame(img, depth, cam, t_ns=0, pose=None):
    from vslam_tpu.odometry.map import HostFrame

    return HostFrame(
        frame=create_frame(img, depth, cam, n_levels=3),
        t_ns=t_ns,
        pose=np.eye(4) if pose is None else pose,
    )


def test_tracking_extract_real_pair(rgbd_pair):
    """FAST + grid NMS + descriptors on the real image find a healthy feature
    set, all with valid depth (extractFeatures masks by depth,
    FeatureTracking.cpp:81-95)."""
    from vslam_tpu.features.tracking import FeatureTracking

    img, depth, K = rgbd_pair
    cam = Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    f0 = _host_frame(img, depth, cam)
    FeatureTracking().extract(f0)
    assert f0.keypoints is not None and len(f0.keypoints) >= 100
    assert np.all(f0.kp_depth > 0)
    # grid NMS invariant: at most one keypoint per 30px grid cell
    # (FeatureTracking.cpp:95-120)
    cells = (f0.keypoints // 30).astype(np.int64)
    keys = cells[:, 0] * 10000 + cells[:, 1]
    assert len(np.unique(keys)) == len(keys)


def test_tracking_select_candidates_real_pair(rgbd_pair):
    """selectCandidates returns every (unassociated) reference feature
    (TrackingTest.SelectVisible: candidate count == f0 feature count)."""
    from vslam_tpu.features.tracking import FeatureTracking
    from vslam_tpu.odometry.map import Map

    img, depth, K = rgbd_pair
    cam = Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    f0 = _host_frame(img, depth, cam, t_ns=0)
    f1 = _host_frame(img, depth, cam, t_ns=1)
    tr = FeatureTracking()
    tr.extract(f0)
    tr.extract(f1)
    groups = tr.select_candidates(f1, [f0], Map())
    assert sum(len(idxs) for _, idxs in groups) == len(f0.keypoints)


def test_tracking_match_and_triangulate_real_pair(rgbd_pair):
    """track() on the real pair under a small known translation creates
    landmarks observed in both frames (TrackingTest.TrackAndOptimize)."""
    from vslam_tpu.features.tracking import FeatureTracking
    from vslam_tpu.odometry.map import Map

    img, depth, K = rgbd_pair
    cam = Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    pose1 = np.eye(4)
    pose1[0, 3] += 0.01
    pose1[1, 3] -= 0.01
    f0 = _host_frame(img, depth, cam, t_ns=0)
    f1 = _host_frame(img, depth, cam, t_ns=10**9, pose=pose1)

    m = Map()
    tr = FeatureTracking()
    tr.extract(f0)
    m.insert(f0, is_keyframe=True)
    points = tr.track(f1, m)
    m.insert(f1, is_keyframe=True)
    assert len(points) >= 50, f"only {len(points)} landmarks from the real pair"
    for p in points[:50]:
        assert f1.id in p.observations
    # identical images, small pose offset: matched descriptors are exact
    n_assoc0 = int(np.sum(f0.kp_landmark >= 0))
    assert n_assoc0 >= 50


def test_real_texture_odometry_sequence():
    """Short full-pipeline odometry run on real texture: person.jpg on a
    plane, smooth SE(3) trajectory, exact renders -> ATE well inside the
    reference per-pair budget."""
    tex = rf.resize_half(rf.load_person(), 1)
    H, W = tex.shape
    K = synthetic.camera_matrix(262.5, 262.5, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])

    n, dt_ns = 12, int(1e9 / 30)
    poses = synthetic.smooth_trajectory(n, trans_amp=0.04, rot_amp=0.02, seed=11)
    p0_inv = lie_np.inv(poses[0])
    poses = [p @ p0_inv for p in poses]

    def stream():
        for i, p in enumerate(poses):
            intensity, d = rf.render_plane_texture(tex, K, p, plane_depth=2.0)
            yield i * dt_ns, intensity, d

    cfg = PipelineConfig(
        features_min_gradient=10.0,
        solver_max_iterations=50,
        solver_min_step_size=1e-8,
        keyframe_selection_idx_period=4,
        prediction_model="ConstantMotion",
    )
    traj = OdometryPipeline(cam, cfg).run(stream())
    gt = {i * dt_ns / 1e9: lie_np.inv(p) for i, p in enumerate(poses)}
    est = {t_ns / 1e9: lie_np.inv(p) for t_ns, p in traj.items()}
    ate, _ = metrics.ate_rmse(gt, est)
    assert ate < 0.01, f"ATE on real texture {ate}"
