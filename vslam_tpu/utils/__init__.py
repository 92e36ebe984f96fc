"""Logging, timers, visualization hooks (reference layer 1, `src/vslam/src/utils/`)."""

from . import log, timer
from .log import get_logger, log_img

__all__ = ["pow2_bucket", "log", "timer", "get_logger", "log_img"]


def pow2_bucket(n: int, minimum: int = 8) -> int:
    """Smallest power-of-two >= n, floored at `minimum` — THE shared bucket
    policy for padding dynamic host-side counts (keypoints, observations,
    landmarks, graph nodes/edges) to static device shapes, so each consumer
    compiles one program per bucket instead of one per distinct count."""
    b = int(minimum)
    while b < n:
        b *= 2
    return b
