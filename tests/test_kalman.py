"""Kalman-layer tests (mirrors reference `test_kalman.cpp`'s constant-velocity
sanity simulation, plus EKF-SE3 behavior)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)

from vslam_tpu.core import lie_np, se3
from vslam_tpu.kalman import ekf_se3, filter as kf


def test_linear_kf_constant_velocity_2d():
    """1-D position/velocity model tracking a constant-velocity target from
    noisy position measurements."""
    rng = np.random.default_rng(0)
    dt = 0.1
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    H = jnp.asarray([[1.0, 0.0]])
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 0.01
    v_true = 1.5
    state = kf.KalmanState(jnp.zeros(2), jnp.eye(2))
    for i in range(1, 120):
        state = kf.predict(state, A, Q)
        z = jnp.asarray([v_true * i * dt + rng.normal(0, 0.1)])
        state, _ = kf.update(state, z, H, R)
    assert float(state.x[1]) == pytest.approx(v_true, abs=0.15)
    assert float(state.x[0]) == pytest.approx(v_true * 119 * dt, abs=0.2)


def test_ekf_se3_predicts_constant_motion():
    """Feed a constant speed twist; the filter's prediction should converge to
    extrapolating that motion."""
    twist = np.array([0.1, -0.05, 0.2, 0.01, 0.02, -0.01])
    dt = 0.1
    state = ekf_se3.init(dtype=jnp.float32)
    pose = np.eye(4)
    for _ in range(30):
        state, _ = ekf_se3.predict(state, dt)
        state = ekf_se3.update(
            state, jnp.asarray(twist, jnp.float32), jnp.eye(6, dtype=jnp.float32) * 1e-4
        )
    np.testing.assert_allclose(np.asarray(state.velocity), twist, atol=5e-3)
    # prediction advances the pose by ~exp(twist * dt)
    p0 = state.pose
    state2, p1 = ekf_se3.predict(state, dt)
    rel = se3.compose(se3.inverse(p0), p1)
    np.testing.assert_allclose(np.asarray(se3.log(rel)), twist * dt, atol=1e-3)


def test_ekf_covariance_grows_without_updates():
    state = ekf_se3.init(dtype=jnp.float32)
    p0 = float(jnp.trace(state.P))
    for _ in range(5):
        state, _ = ekf_se3.predict(state, 0.1)
    assert float(jnp.trace(state.P)) > p0


def test_measurement_noise_from_cov():
    """The aligner covariance shapes R: structure preserved, scale
    recalibrated, degenerate input falls back to scaled identity."""
    cov = np.diag([1.0, 1.0, 1.0, 100.0, 100.0, 100.0]).astype(np.float32)
    R = np.asarray(ekf_se3.measurement_noise_from_cov(jnp.asarray(cov), scale=1e-2))
    assert np.trace(R) == pytest.approx(6 * 1e-2, rel=1e-2)
    assert R[3, 3] / R[0, 0] == pytest.approx(100.0, rel=0.05)
    bad = np.full((6, 6), np.nan, np.float32)
    R2 = np.asarray(ekf_se3.measurement_noise_from_cov(jnp.asarray(bad), scale=1e-2))
    np.testing.assert_allclose(np.diag(R2), 1e-2 * 1.001 * np.ones(6), rtol=1e-3)


def test_ekf_gain_depends_on_alignment_covariance():
    """Covariance-dependent Kalman gain: axes the aligner reports as
    uncertain converge slower than well-constrained axes."""
    twist = np.array([0.2, 0.0, 0.0, 0.1, 0.0, 0.0], np.float32)
    # translation well constrained, rotation very uncertain (scale chosen so
    # R is comparable to the filter's prior P and the gain difference shows)
    cov = np.diag([1e-2] * 3 + [1e2] * 3).astype(np.float32)
    R = ekf_se3.measurement_noise_from_cov(jnp.asarray(cov), scale=10.0)
    state = ekf_se3.init(dtype=jnp.float32)
    state, _ = ekf_se3.predict(state, 0.1)
    state = ekf_se3.update(state, jnp.asarray(twist), R)
    v = np.asarray(state.velocity)
    # relative progress toward the measured twist per axis
    prog_t = v[0] / twist[0]
    prog_r = v[3] / twist[3]
    assert prog_t > 5 * prog_r, (prog_t, prog_r)


def test_motion_prediction_models():
    from vslam_tpu.odometry.motion_model import make_motion_prediction

    twist = np.array([0.3, 0.0, 0.1, 0.0, 0.05, 0.0])
    ns = int(1e8)  # 0.1 s
    for name, tol in [("ConstantMotion", 1e-9), ("Kalman", 0.05), ("NoMotion", None)]:
        m = make_motion_prediction(name)
        pose = np.eye(4)
        m.update(pose, 0)
        for i in range(1, 12):
            pose = lie_np.exp(twist * 0.1) @ pose
            m.update(pose, i * ns)
        pred = m.predict(12 * ns)
        if name == "NoMotion":
            np.testing.assert_allclose(pred, pose, atol=1e-12)
        else:
            want = lie_np.exp(twist * 0.1) @ pose
            err = np.linalg.norm(lie_np.log(lie_np.relative(pred, want)))
            assert err < (tol or 1), f"{name}: {err}"
