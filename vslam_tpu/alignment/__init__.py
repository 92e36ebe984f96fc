"""Direct image alignment (reference layers 3+5: lukas_kanade + SE3Alignment + ICP)."""

from . import aligner, ic, icp, lk2d
from .aligner import RgbdAligner, stack_frames
from .ic import AlignmentConfig
from .icp import IcpAligner, IcpConfig

__all__ = [
    "aligner", "ic", "icp", "lk2d",
    "RgbdAligner", "stack_frames", "AlignmentConfig", "IcpAligner", "IcpConfig",
]
