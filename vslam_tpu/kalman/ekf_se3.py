"""EKF with constant-velocity SE(3) motion model, in JAX.

Rebuild of reference `kalman/src/EKFConstantVelocitySE3.{h,cpp}`: state is
[pose xi (6); body velocity twist (6)], prediction composes pose with
exp(velocity * dt), and the measurement is a velocity twist (the odometry
speed estimate, `MotionPrediction.cpp:57-81`).

Deviations from the reference, deliberate and documented:
- The reference's process Jacobian writes an out-of-bounds Eigen block
  (`EKFConstantVelocitySE3.cpp:66-79` uses block(6,6,12,12) on a 12x12) and
  mixes nanosecond/second units between predict and update. We implement the
  *intended* filter with consistent seconds: F = [[Ad(exp(-v dt)), dt*I],
  [0, I]], H = [0, I] (direct velocity measurement).
- State and covariance are a jit/vmap-friendly pytree so a batch of
  per-sequence filters advances in one fused device step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.se3 import SE3

__all__ = ["EkfState", "init", "predict", "update", "measurement_noise_from_cov"]


def measurement_noise_from_cov(cov: jax.Array, scale: float = 1e-2) -> jax.Array:
    """Measurement noise from an aligner covariance (A^-1).

    The absolute scale of a photometric normal-equation inverse is arbitrary
    (intensity units, 1/255^2 and prior normalizers), so only its STRUCTURE
    — the per-axis relative uncertainty — is trusted: the matrix is
    normalized to mean diagonal = ``scale`` (the reference feeds a plain
    identity here, MotionPrediction.cpp:84; this keeps that calibration while
    letting poorly-constrained axes see a weaker Kalman gain). Degenerate
    inputs fall back to scale * I.
    """
    cov = jnp.asarray(cov)
    dtype = cov.dtype
    tr = jnp.trace(cov) / 6.0
    ok = jnp.isfinite(tr) & (tr > 0.0) & jnp.all(jnp.isfinite(cov))
    R = jnp.where(ok, cov * (scale / jnp.where(ok, tr, 1.0)), jnp.eye(6, dtype=dtype) * scale)
    # keep R symmetric positive definite under f32 roundoff
    return 0.5 * (R + R.T) + jnp.eye(6, dtype=dtype) * (scale * 1e-3)


class EkfState(NamedTuple):
    pose: SE3  # world -> camera
    velocity: jax.Array  # (6,) body twist, units: per second
    P: jax.Array  # (12, 12) covariance of [d pose; d velocity]
    Q: jax.Array  # (12, 12) process noise per second


def init(
    pose: SE3 | None = None,
    process_noise: float = 1e-2,
    dtype=jnp.float32,
) -> EkfState:
    if pose is None:
        pose = se3.identity(dtype=dtype)
    return EkfState(
        pose=pose,
        velocity=jnp.zeros(6, dtype),
        P=jnp.eye(12, dtype=dtype),
        Q=jnp.eye(12, dtype=dtype) * process_noise,
    )


def _process_jacobian(v_dt: jax.Array, dt, dtype) -> jax.Array:
    """F for pose' = pose . exp(v dt): perturbations of the old pose are
    carried through the composition by Ad(exp(-v dt)); velocity enters
    (to first order) with gain dt."""
    step_inv = se3.inverse(se3.exp(v_dt))
    F = jnp.zeros((12, 12), dtype)
    F = F.at[:6, :6].set(se3.adjoint(step_inv))
    F = F.at[:6, 6:].set(dt * jnp.eye(6, dtype=dtype))
    F = F.at[6:, 6:].set(jnp.eye(6, dtype=dtype))
    return F


def predict(state: EkfState, dt: jax.Array) -> Tuple[EkfState, SE3]:
    """Advance the filter by dt seconds; returns (new_state, predicted pose)."""
    dtype = state.velocity.dtype
    dt = jnp.asarray(dt, dtype)
    v_dt = state.velocity * dt
    pose_new = se3.compose(state.pose, se3.exp(v_dt))
    F = _process_jacobian(v_dt, dt, dtype)
    P_new = F @ state.P @ F.T + state.Q * jnp.maximum(dt, 0.0)
    return EkfState(pose_new, state.velocity, P_new, state.Q), pose_new


def update(
    state: EkfState, v_measured: jax.Array, R: jax.Array
) -> EkfState:
    """Velocity-twist measurement update (H = [0, I]); the pose block is
    corrected only through cross-covariance, matching the reference's
    'no position update' comment (EKFConstantVelocitySE3.cpp:48-51)."""
    dtype = state.velocity.dtype
    H = jnp.concatenate([jnp.zeros((6, 6), dtype), jnp.eye(6, dtype=dtype)], axis=1)
    y = v_measured - state.velocity
    S = state.P[6:, 6:] + R
    K = state.P @ H.T @ jnp.linalg.inv(S)  # (12, 6)
    dx = K @ y
    pose_new = se3.compose(state.pose, se3.exp(dx[:6]))
    vel_new = state.velocity + dx[6:]
    P_new = (jnp.eye(12, dtype=dtype) - K @ H) @ state.P
    # re-symmetrize: the plain (I-KH)P form loses symmetry in f32 over
    # thousands of cycles, eventually giving S a negative eigenvalue and a
    # sign-flipped gain (silent divergence, no NaN)
    P_new = 0.5 * (P_new + P_new.T)
    return EkfState(pose_new, vel_new, P_new, state.Q)
