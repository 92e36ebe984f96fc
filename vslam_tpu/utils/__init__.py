"""Logging, timers, visualization hooks (reference layer 1, `src/vslam/src/utils/`)."""

from . import log
from .log import get_logger, log_img

__all__ = ["log", "get_logger", "log_img"]
