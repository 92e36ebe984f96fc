"""BA pose write-back gating (ba.bundle_adjustment.drift_significant).

Measured failure mode this guards (round 3): with a dense front end whose
pose error is ~1e-3, persisting every BA solution into the sliding window
re-anchors each round's gauge on the previous round's BA noise — keyframe
pose error random-walks UP chunk over chunk (0.01 -> 0.09 over 96 frames on
clean data), and unconditional write-back injects the sparse solver's noise
floor (~10x the dense error at a few dozen landmarks) into the pose chain.
The gate folds a correction only when it is statistically significant under
BA's OWN pose covariance (residual-variance-scaled Schur inverse block)."""

import numpy as np
import pytest

from vslam_tpu.alignment.ic import AlignmentConfig
from vslam_tpu.ba.bundle_adjustment import BundleAdjustment, drift_significant
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.eval import metrics
from vslam_tpu.io import synthetic
from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry
from vslam_tpu.odometry.sequential_mapping import ChunkMappingBackend
from vslam_tpu.solvers import SolverConfig

H, W, FX = 96, 128, 110.0


def _fake_ba(sigma2: float) -> BundleAdjustment:
    ba = BundleAdjustment(max_iterations=1)
    ba.last_newest_cov = np.eye(6) * sigma2
    return ba


def test_drift_significant_mahalanobis():
    est = np.eye(4)
    corrected = lie_np.exp(np.array([0.05, 0.0, 0.0, 0.0, 0.0, 0.0]))
    # tight solver (sigma 1 mm): a 5 cm correction is 50-sigma -> real drift
    assert drift_significant(_fake_ba(1e-6), est, corrected)
    # loose solver (sigma ~7 cm): the same 5 cm is sub-sigma -> noise
    assert not drift_significant(_fake_ba(5e-3), est, corrected)
    # sub-floor corrections never fold, however confident the solver
    tiny = lie_np.exp(np.full(6, 1e-5))
    assert not drift_significant(_fake_ba(1e-12), est, tiny)
    # no covariance available -> absolute-floor fallback
    ba = BundleAdjustment(max_iterations=1)
    assert ba.last_newest_cov is None
    assert drift_significant(ba, est, corrected, min_correction=1e-3)
    assert not drift_significant(ba, est, corrected, min_correction=0.1)


def _noisy_stream(n, seed=7):
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(n, trans_amp=0.10, rot_amp=0.04)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    rng = np.random.default_rng(seed)
    dt_ns = int(1e9 / 30)
    stream = []
    for i, p in enumerate(poses):
        inten, depth = synthetic.render(K, p, (H, W))
        z = np.maximum(depth, 0.0)
        depth_n = z + rng.normal(0, 1, z.shape) * (0.0012 + 0.0019 * (z - 0.4) ** 2)
        inten_n = inten + rng.normal(0, 1.5, inten.shape)
        stream.append(
            (
                i * dt_ns,
                np.clip(np.round(inten_n), 0, 255).astype(np.uint8),
                np.clip(np.round(depth_n * 5000), 0, 65535).astype(np.uint16),
            )
        )
    gt = {i * dt_ns / 1e9: lie_np.inv(p) for i, p in enumerate(poses)}
    return stream, gt


def _run(stream, gt, mapping):
    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
            prior_weight=(FX / 525.0) ** 2,
            interpolation="bilinear",
        ),
        depth_scale=1 / 5000,
        n_levels=3,
        kf_period=5,
    )
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    odo = SequentialOdometry(cam, cfg, chunk=16, mapping=mapping, async_mapping=False)
    res = odo.run(iter(stream))
    est = {t / 1e9: lie_np.inv(p) for t, p, _ in res}
    ate, _ = metrics.ate_rmse(gt, est)
    return float(ate)


def test_gated_write_back_no_harm_on_noisy_stream():
    """On a Kinect-noise stream where the dense front end is tighter than
    sparse BA, the gated default must track at odometry accuracy (the
    'always' reference semantics measurably degrade it), while the map still
    builds and BA publishes its pose covariance."""
    stream, gt = _noisy_stream(48)
    ate_odo = _run(stream, gt, None)
    gated = ChunkMappingBackend(enable_ba=True)  # default pose_write_back
    ate_gated = _run(stream, gt, gated)
    assert gated.n_landmarks > 0
    cov = gated._ba.last_newest_cov
    assert cov is not None and cov.shape == (6, 6) and np.all(np.isfinite(cov))
    # no harm: within 20% (or 1 mm absolute) of pure odometry
    assert ate_gated <= max(ate_odo * 1.2, ate_odo + 1e-3), (ate_gated, ate_odo)

    off = ChunkMappingBackend(enable_ba=True, pose_write_back="off")
    ate_off = _run(stream, gt, off)
    assert abs(ate_off - ate_odo) < 1e-6  # map-only mode never touches poses


def test_always_mode_preserves_reference_semantics():
    """pose_write_back='always' must still persist BA poses into the map
    (Map::updatePoses parity), whatever that costs in accuracy."""
    stream, gt = _noisy_stream(32)
    backend = ChunkMappingBackend(enable_ba=True, pose_write_back="always")
    _run(stream, gt, backend)
    assert backend.n_landmarks > 0
    assert len(backend.map.keyframes()) >= 3


def test_light_arrays_scale_float_depth_like_the_scan():
    """The backend keyframe's depth conversion must mirror the scan step
    EXACTLY (sequential._step multiplies by cfg.depth_scale whatever the
    dtype): a float depth-count stream must not silently skip the metres
    conversion — u16 counts and the same counts as f32 give identical
    keyframe depth."""
    import jax.numpy as jnp

    from vslam_tpu.odometry.sequential_mapping import _light_arrays

    rng = np.random.default_rng(11)
    counts = (rng.uniform(500, 30000, (24, 32))).astype(np.uint16)
    inten = rng.uniform(0, 255, (24, 32)).astype(np.uint8)
    kw = dict(depth_scale=1.0 / 5000.0, stereo_baseline=0.0, max_disparity=96)
    _, d_u16, _ = _light_arrays(jnp.asarray(inten), jnp.asarray(counts), 100.0, **kw)
    _, d_f32, _ = _light_arrays(
        jnp.asarray(inten), jnp.asarray(counts.astype(np.float32)), 100.0, **kw
    )
    np.testing.assert_allclose(np.asarray(d_u16), np.asarray(d_f32), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d_u16), counts.astype(np.float32) / 5000.0, rtol=1e-5
    )
