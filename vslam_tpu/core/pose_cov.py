"""SE(3) pose with 6x6 covariance — the composition algebra type.

TPU-native equivalent of the reference `PoseWithCovariance`
(`core/src/PoseWithCovariance.h:23-51`, `.cpp:18-28`): an SE(3) pose paired
with its 6x6 twist covariance, plus the composition operator
``SE3d * PoseWithCovariance`` that transports the covariance into the new
frame. The pipeline threads (pose, cov) pairs through alignment, EKF and the
trajectory writer; this type packages the same data as one pytree with the
reference's algebra for parity.

Two transport modes:
- ``compose`` mirrors the reference exactly: block-diagonal rotation of the
  covariance, ``R6 C R6^T`` with ``R6 = diag(R, R)``
  (`PoseWithCovariance.cpp:19-28`).
- ``compose_adjoint`` is the rigorous version: the full SE(3) adjoint
  ``Ad C Ad^T`` (couples rotation uncertainty into translation through the
  lever arm), offered because the reference's rotation-only transport is an
  approximation it itself links a caveat for.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .se3 import SE3

__all__ = ["PoseWithCovariance", "compose", "compose_adjoint"]


class PoseWithCovariance(NamedTuple):
    """Pytree pose + covariance (reference `PoseWithCovariance.h:23-51`)."""

    pose: SE3
    cov: jax.Array  # (6, 6) twist covariance

    def mean(self) -> jax.Array:
        """Twist log of the pose (`PoseWithCovariance.h:42`)."""
        return se3.log(self.pose)

    def inverse(self) -> "PoseWithCovariance":
        """Inverse pose, covariance carried unchanged — matching the
        reference (`PoseWithCovariance.h:43`; it does not adjoint-transport
        on inversion either)."""
        return PoseWithCovariance(se3.inverse(self.pose), self.cov)


def _rot6(R: jax.Array) -> jax.Array:
    Z = jnp.zeros_like(R)
    return jnp.block([[R, Z], [Z, R]])


def compose(p1: SE3, p0: PoseWithCovariance) -> PoseWithCovariance:
    """``p1 * p0``: compose poses, rotate the covariance block-diagonally —
    exact reference semantics (`PoseWithCovariance.cpp:19-28`)."""
    R6 = _rot6(p1.R)
    return PoseWithCovariance(se3.compose(p1, p0.pose), R6 @ p0.cov @ R6.T)


def compose_adjoint(p1: SE3, p0: PoseWithCovariance) -> PoseWithCovariance:
    """``p1 * p0`` with full SE(3) adjoint covariance transport
    ``Ad(p1) C Ad(p1)^T`` (includes the translation-rotation coupling the
    reference's rotation-only transport drops)."""
    Ad = se3.adjoint(p1)
    return PoseWithCovariance(se3.compose(p1, p0.pose), Ad @ p0.cov @ Ad.T)
