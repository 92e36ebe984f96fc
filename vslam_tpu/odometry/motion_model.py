"""Motion prediction models (reference `odometry/src/MotionPrediction.{h,cpp}`).

String factory + three models exactly as the reference's `prediction.model`
parameter: NoMotion, ConstantMotion (twist extrapolation,
MotionPrediction.cpp:38-55) and Kalman (EKF-backed,
MotionPrediction.cpp:57-81). Host-facing; the Kalman model delegates to the
jit-compiled EKF in `vslam_tpu.kalman.ekf_se3`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import lie_np
from ..core.se3 import SE3
from ..kalman import ekf_se3

__all__ = [
    "MotionPrediction",
    "MotionPredictionNoMotion",
    "MotionPredictionConstant",
    "MotionPredictionKalman",
    "make_motion_prediction",
]

_NS = 1e9


class MotionPrediction:
    def predict(self, t_ns: int) -> np.ndarray:
        raise NotImplementedError

    def update(self, pose: np.ndarray, t_ns: int, cov: Optional[np.ndarray] = None) -> None:
        """``cov`` is the 6x6 covariance of the pose estimate (the aligner's
        A^-1); models that filter use it as measurement noise."""
        raise NotImplementedError

    def speed(self) -> np.ndarray:
        """Current twist estimate [v; w] in 1/s — the reference's
        ``Odometry::speed()`` published as the /odom twist
        (NodeMapping.cpp:263). Zero for models without a velocity state."""
        return np.zeros(6)

    def speed_host(self) -> np.ndarray:
        """Host-cached twist for per-frame display/publish paths: must never
        touch the device (the Kalman model's filtered velocity lives in a JAX
        array; reading it per frame would block on a host-device transfer).
        Defaults to speed(), which is host-side for every non-device model."""
        return self.speed()


class MotionPredictionNoMotion(MotionPrediction):
    """Prediction = last pose (MotionPrediction.h:36-60)."""

    def __init__(self):
        self._pose = np.eye(4)

    def predict(self, t_ns: int) -> np.ndarray:
        return self._pose.copy()

    def update(self, pose: np.ndarray, t_ns: int, cov: Optional[np.ndarray] = None) -> None:
        self._pose = np.asarray(pose, np.float64)


class MotionPredictionConstant(MotionPrediction):
    """Constant-twist extrapolation: speed = log(rel)/dt, prediction =
    exp(speed dt) . last_pose (MotionPrediction.cpp:38-55)."""

    def __init__(self):
        self._pose = np.eye(4)
        self._speed = np.zeros(6)
        self._t_ns = 0

    def predict(self, t_ns: int) -> np.ndarray:
        dt = (int(t_ns) - self._t_ns) / _NS
        return lie_np.exp(self._speed * dt) @ self._pose

    def update(self, pose: np.ndarray, t_ns: int, cov: Optional[np.ndarray] = None) -> None:
        if int(t_ns) < self._t_ns:
            raise ValueError("New timestamp is older than last one!")
        dt = (int(t_ns) - self._t_ns) / _NS
        if dt > 0 and self._t_ns > 0:
            self._speed = lie_np.log(lie_np.relative(self._pose, pose)) / dt
        self._pose = np.asarray(pose, np.float64)
        self._t_ns = int(t_ns)

    def speed(self) -> np.ndarray:
        return self._speed.copy()


class MotionPredictionKalman(MotionPrediction):
    """EKF-backed prediction (MotionPrediction.cpp:57-81): the measurement is
    the per-second speed twist between consecutive odometry poses."""

    def __init__(self, process_noise: float = 1e-2, measurement_noise: float = 1e-2):
        self._state = ekf_se3.init(process_noise=process_noise, dtype=jnp.float32)
        self._measurement_noise = float(measurement_noise)
        self._R = jnp.eye(6, dtype=jnp.float32) * measurement_noise
        self._pose = np.eye(4)
        self._t_ns = 0
        self._speed_host = np.zeros(6)  # measured odometry twist (see speed_host)

    def _pose_np(self, g: SE3) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = np.asarray(g.R, np.float64)
        T[:3, 3] = np.asarray(g.t, np.float64)
        u, _, vt = np.linalg.svd(T[:3, :3])
        T[:3, :3] = u @ vt
        return T

    def predict(self, t_ns: int) -> np.ndarray:
        dt = (int(t_ns) - self._t_ns) / _NS
        _, pose = ekf_se3.predict(self._state, dt)
        return self._pose_np(pose)

    def update(self, pose: np.ndarray, t_ns: int, cov: Optional[np.ndarray] = None) -> None:
        if int(t_ns) < self._t_ns:
            raise ValueError("New timestamp is older than last one!")
        dt = (int(t_ns) - self._t_ns) / _NS
        if dt > 0 and self._t_ns > 0:
            speed = lie_np.log(lie_np.relative(self._pose, pose)) / dt
            self._speed_host = np.asarray(speed, np.float64)
            state, _ = ekf_se3.predict(self._state, dt)
            # re-anchor the filter pose at the measured odometry pose
            state = ekf_se3.EkfState(
                pose=SE3(
                    jnp.asarray(pose[:3, :3], jnp.float32),
                    jnp.asarray(pose[:3, 3], jnp.float32),
                ),
                velocity=state.velocity,
                P=state.P,
                Q=state.Q,
            )
            # measurement noise: the aligner covariance's per-axis structure
            # at the calibrated default scale when provided, else the fixed
            # default (the reference EKF accepts covMotion but its prediction
            # wiring feeds identity, MotionPrediction.cpp:84; see
            # ekf_se3.measurement_noise_from_cov)
            if cov is not None:
                R = ekf_se3.measurement_noise_from_cov(
                    jnp.asarray(cov, jnp.float32), scale=self._measurement_noise
                )
            else:
                R = self._R
            self._state = ekf_se3.update(state, jnp.asarray(speed, jnp.float32), R)
        else:
            self._state = self._state._replace(
                pose=SE3(
                    jnp.asarray(pose[:3, :3], jnp.float32),
                    jnp.asarray(pose[:3, 3], jnp.float32),
                )
            )
        self._pose = np.asarray(pose, np.float64)
        self._t_ns = int(t_ns)

    def speed(self) -> np.ndarray:
        return np.asarray(self._state.velocity, np.float64)

    def speed_host(self) -> np.ndarray:
        """The measured odometry twist cached at update() time — what the
        reference actually publishes as the /odom twist (Odometry.cpp:44-50
        computes speed from consecutive poses); reading the filtered velocity
        would block on a device transfer on the per-frame publish path."""
        return self._speed_host.copy()


def make_motion_prediction(model: str) -> MotionPrediction:
    """String factory (MotionPrediction.cpp:22-36); unknown names fall back
    to the constant-motion model, as the reference does."""
    if model == "NoMotion":
        return MotionPredictionNoMotion()
    if model == "ConstantMotion":
        return MotionPredictionConstant()
    if model == "Kalman":
        return MotionPredictionKalman()
    return MotionPredictionConstant()
