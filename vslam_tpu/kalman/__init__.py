"""Bayesian motion filtering (reference layer 4, `src/vslam/src/kalman/`)."""

from . import ekf_se3, filter
from .ekf_se3 import EkfState
from .filter import KalmanState

__all__ = ["ekf_se3", "filter", "EkfState", "KalmanState"]
