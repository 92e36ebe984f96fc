"""End-to-end sequential odometry on a synthetic sequence (mirrors the
reference's DISABLED_ dataset tests `test_odometry.cpp` /
`test_alignment_se3.cpp:150-188`, using the analytic plane scene instead of
TUM files). The pipeline must track a smooth trajectory with RPE well under
the reference's 0.036 m budget."""

import numpy as np
import pytest

from vslam_tpu.config import PipelineConfig
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.io import synthetic
from vslam_tpu.eval import metrics
from vslam_tpu.odometry.pipeline import OdometryPipeline

H, W = 96, 128
FX = FY = 110.0
CX, CY = (W - 1) / 2, (H - 1) / 2
K = synthetic.camera_matrix(FX, FY, CX, CY)

N_FRAMES = 25
DT_NS = int(1e9 / 30)


def normalized_traj(n):
    poses = synthetic.smooth_trajectory(n, trans_amp=0.08, rot_amp=0.03, seed=5)
    p0_inv = lie_np.inv(poses[0])
    return [p @ p0_inv for p in poses]


def stream(poses):
    for i, p in enumerate(poses):
        intensity, depth = synthetic.render(K, p, (H, W))
        yield i * DT_NS, intensity, depth


@pytest.fixture(scope="module")
def tracked():
    poses = normalized_traj(N_FRAMES)
    cfg = PipelineConfig(
        features_min_gradient=10.0,
        solver_max_iterations=50,
        solver_min_step_size=1e-7,
        keyframe_selection_idx_period=5,
        prediction_model="ConstantMotion",
    )
    pipeline = OdometryPipeline(Camera.create(FX, FY, CX, CY), cfg)
    traj = pipeline.run(stream(poses))
    return poses, traj


def test_sequence_rpe_ate(tracked):
    poses, traj = tracked
    assert len(traj) == N_FRAMES
    # metrics expect cam->world (TUM convention)
    gt = {i * DT_NS / 1e9: lie_np.inv(p) for i, p in enumerate(poses)}
    est = {t_ns / 1e9: lie_np.inv(p) for t_ns, p in traj.items()}
    ate, _ = metrics.ate_rmse(gt, est)
    # the sequence spans <1 s, so use a 0.5 s RPE delta
    rpe_t, _, n = metrics.rpe(gt, est, fixed_delta=0.5)
    # clean synthetic scene: drift must sit far inside the reference's
    # fr2_desk budget (RPE 0.036 m / ATE 0.21 m)
    assert n > 5
    assert rpe_t < 0.01, rpe_t
    assert ate < 0.01, ate


def test_per_frame_error(tracked):
    poses, traj = tracked
    errs = []
    for i, p_gt in enumerate(poses):
        p_est = traj.pose_at(i * DT_NS)
        errs.append(np.linalg.norm(lie_np.log(lie_np.relative(p_est, p_gt))))
    # absolute (unaligned) pose drift; the motion prior biases toward the
    # constant-motion prediction, which lags the sinusoidal ground truth at
    # this test resolution. RPE/ATE (the benchmark metrics) are the tight check.
    assert np.mean(errs) < 0.025, f"mean pose error {np.mean(errs)}"


def test_pipelined_matches_strict_loop(tracked):
    """OdometryPipeline.run's software-pipelined schedule (device-side
    prediction, fetch of frame i overlapped with frame i+1's dispatch) must
    track the same trajectory as the strict one-frame-at-a-time loop. Not
    bit-identical — the pipelined chain composes poses on device in f32
    (like the fused scan) while the strict loop composes on host in f64 —
    but the keyframe cadence is identical and per-frame poses agree to well
    under the accuracy budget."""
    poses, traj_pipelined = tracked  # module fixture runs the pipelined path
    cfg = PipelineConfig(
        features_min_gradient=10.0,
        solver_max_iterations=50,
        solver_min_step_size=1e-7,
        keyframe_selection_idx_period=5,
        prediction_model="ConstantMotion",
    )
    pipeline = OdometryPipeline(Camera.create(FX, FY, CX, CY), cfg)
    assert pipeline._pipelined_eligible()
    traj_strict = pipeline.run(stream(poses), pipelined=False)
    assert len(traj_strict) == len(traj_pipelined) == N_FRAMES
    for t_ns, p_strict in traj_strict.items():
        p_pipe = traj_pipelined.pose_at(t_ns)
        d = np.linalg.norm(lie_np.log(lie_np.relative(p_strict, p_pipe)))
        assert d < 2e-3, (t_ns, d)


@pytest.mark.quick  # the quick tier's one e2e smoke (full pipeline, 8 frames)
def test_fallback_on_bad_frame():
    """A textureless (information-free) frame mid-sequence must not crash the
    pipeline; it falls back to the motion prediction (Odometry.cpp:52-56)."""
    poses = normalized_traj(8)
    cfg = PipelineConfig(
        features_min_gradient=10.0,
        solver_max_iterations=30,
        solver_min_step_size=1e-7,
    )
    pipeline = OdometryPipeline(Camera.create(FX, FY, CX, CY), cfg)
    for i, p in enumerate(poses):
        if i == 4:
            intensity = np.zeros((H, W), np.float32)
            depth = np.zeros((H, W), np.float32)  # all-invalid depth
        else:
            intensity, depth = synthetic.render(K, p, (H, W))
        pipeline.process_frame(i * DT_NS, intensity, depth)
    assert len(pipeline.trajectory) == 8


def test_keyframe_selection_visible_map():
    """KeyFrameSelectionCustom: new keyframe on large translation or too few
    visible landmarks (KeyFrameSelection.cpp:30-54)."""
    import jax.numpy as jnp

    from vslam_tpu.core.camera import Camera
    from vslam_tpu.core.frame import create_frame
    from vslam_tpu.odometry.keyframe import KeyFrameSelectionCustom
    from vslam_tpu.odometry.map import HostFrame, Landmark, Map

    cam = Camera.create(FX, FY, CX, CY)
    dummy = create_frame(
        jnp.zeros((H, W), jnp.float32), jnp.ones((H, W), jnp.float32), cam, n_levels=1
    )
    m = Map()
    sel = KeyFrameSelectionCustom(m, min_visible_points=2, max_translation=0.2)

    kf = HostFrame(frame=dummy, t_ns=0, pose=np.eye(4))
    # landmarks in front of the keyframe, linked to its features
    lms = [Landmark(position=np.array([x, 0.0, 2.0])) for x in (-0.2, 0.0, 0.2)]
    kf.keypoints = np.zeros((3, 2), np.float32)
    kf.kp_landmark = np.array([lm.id for lm in lms])
    for i, lm in enumerate(lms):
        lm.observations[kf.id] = i
    m.insert(kf, is_keyframe=True)
    m.insert_points(lms)

    # nearby frame, everything visible -> not a keyframe
    f1 = HostFrame(frame=dummy, t_ns=1, pose=lie_np.exp(np.array([0.01, 0, 0, 0, 0, 0])))
    sel.update(f1)
    assert not sel.is_keyframe()

    # large translation -> keyframe
    f2 = HostFrame(frame=dummy, t_ns=2, pose=lie_np.exp(np.array([0.5, 0, 0, 0, 0, 0])))
    sel.update(f2)
    assert sel.is_keyframe()

    # rotated away so landmarks leave the view -> keyframe
    f3 = HostFrame(frame=dummy, t_ns=3, pose=lie_np.exp(np.array([0, 0, 0, 0, 1.2, 0])))
    sel.update(f3)
    assert sel.is_keyframe()


def test_fast_motion_sequence():
    """BASELINE config #2 (fr1_xyz role): fast, jerky motion — white-noise
    per-frame twists (worst case for the constant-velocity predictor, ~10 px
    inter-frame displacement) must be recovered through the coarse pyramid
    levels within the reference per-pair budget (test_alignment_se3.cpp:119).
    """
    rng = np.random.default_rng(17)
    n = 10
    poses = [np.eye(4)]
    for _ in range(n - 1):
        # ~10x the smooth-test inter-frame motion, direction-uncorrelated
        # (fr1_xyz pace: a few cm/frame at 30 Hz)
        xi = np.concatenate(
            [rng.uniform(-0.03, 0.03, 3), rng.uniform(-0.015, 0.015, 3)]
        )
        poses.append(lie_np.exp(xi) @ poses[-1])

    cfg = PipelineConfig(
        features_min_gradient=10.0,
        solver_max_iterations=100,
        solver_min_step_size=1e-11,
        keyframe_selection_idx_period=5,
        prediction_model="ConstantMotion",
        # the motion prior couples the estimate to the predictor; under
        # direction-uncorrelated motion the prediction is systematically
        # wrong and the prior biases per-pair error to ~0.02 at this
        # resolution (measured) — a fast-motion profile runs prior-off
        include_prior=False,
    )
    pipeline = OdometryPipeline(Camera.create(FX, FY, CX, CY), cfg)
    traj = pipeline.run(stream(poses))
    assert len(traj) == n
    # per-pair budget: the estimated inter-frame MOTION must match ground
    # truth (the absolute chain accumulates drift; the reference's 0.01 is a
    # per-pair assertion)
    errs = []
    for i in range(1, n):
        m_est = traj.pose_at(i * DT_NS) @ lie_np.inv(traj.pose_at((i - 1) * DT_NS))
        m_gt = poses[i] @ lie_np.inv(poses[i - 1])
        errs.append(np.linalg.norm(lie_np.log(lie_np.relative(m_est, m_gt))))
    assert np.mean(errs) < 0.01, f"fast-motion mean per-pair error {np.mean(errs):.4f}"
