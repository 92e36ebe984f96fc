"""Core geometry and image numerics (reference layer 0, `src/vslam/src/core/`)."""

from . import camera, frame, image, se3
from .camera import Camera
from .frame import Frame, create_frame, frame_pcl
from .se3 import SE3

__all__ = [
    "camera",
    "frame",
    "image",
    "se3",
    "Camera",
    "Frame",
    "SE3",
    "create_frame",
    "frame_pcl",
]
