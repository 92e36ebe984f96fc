"""Logging, timers, visualization hooks (reference layer 1, `src/vslam/src/utils/`)."""

from . import log, timer
from .log import get_logger, log_img

__all__ = ["log", "timer", "get_logger", "log_img"]
