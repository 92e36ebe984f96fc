"""Direct image alignment (reference layers 3+5: lukas_kanade + SE3Alignment)."""

from . import aligner, ic
from .aligner import RgbdAligner, stack_frames
from .ic import AlignmentConfig

__all__ = ["aligner", "ic", "RgbdAligner", "stack_frames", "AlignmentConfig"]
