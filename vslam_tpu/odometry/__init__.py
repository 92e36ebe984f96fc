"""VO/SLAM pipeline components (reference layer 5, `src/vslam/src/odometry/`)."""

from . import keyframe, map as map_mod, motion_model, odometry, trajectory
from .map import HostFrame, Landmark, Map
from .odometry import OdometryRgbd
from .trajectory import Trajectory

__all__ = [
    "keyframe",
    "map_mod",
    "motion_model",
    "odometry",
    "trajectory",
    "HostFrame",
    "Landmark",
    "Map",
    "OdometryRgbd",
    "Trajectory",
]
