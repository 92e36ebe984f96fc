"""Generic linear Kalman filter as pure JAX functions.

Rebuild of the reference's templated `KalmanFilter<N,M>`
(`src/vslam/src/kalman/src/KalmanFilter.h:31-86`): the virtual A(dt)/H(dt)
hooks become plain callables, state is an explicit pytree, and everything
jits/vmaps (so a fleet of per-sequence filters runs on-device in batched
tracking mode).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["KalmanState", "predict", "update"]


class KalmanState(NamedTuple):
    x: jax.Array  # (N,) state mean
    P: jax.Array  # (N, N) state covariance


def predict(state: KalmanState, A: jax.Array, Q: jax.Array) -> KalmanState:
    """x' = A x, P' = A P A^T + Q (KalmanFilter.h:47-58)."""
    x = A @ state.x
    P = A @ state.P @ A.T + Q
    return KalmanState(x, P)


def update(
    state: KalmanState, z: jax.Array, H: jax.Array, R: jax.Array
) -> Tuple[KalmanState, jax.Array]:
    """Measurement update with gain K = P H^T (H P H^T + R)^-1
    (KalmanFilter.h:59-72). Returns (new_state, innovation)."""
    y = z - H @ state.x
    S = H @ state.P @ H.T + R
    K = state.P @ H.T @ jnp.linalg.inv(S)
    x = state.x + K @ y
    n = state.x.shape[0]
    P = (jnp.eye(n, dtype=state.P.dtype) - K @ H) @ state.P
    P = 0.5 * (P + P.T)  # f32 symmetry drift guard (see ekf_se3.update)
    return KalmanState(x, P), y
