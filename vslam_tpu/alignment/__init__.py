"""Direct image alignment (reference layers 3+5: lukas_kanade + SE3Alignment + ICP)."""

from . import aligner, fa_se3, ic, icp, lk2d
from .aligner import RgbdAligner, stack_frames
from .fa_se3 import FaAlignmentConfig, RgbdAlignerFa
from .ic import AlignmentConfig
from .icp import IcpAligner, IcpConfig

__all__ = [
    "aligner", "fa_se3", "ic", "icp", "lk2d",
    "RgbdAligner", "stack_frames", "AlignmentConfig",
    "FaAlignmentConfig", "RgbdAlignerFa",
    "IcpAligner", "IcpConfig",
]
