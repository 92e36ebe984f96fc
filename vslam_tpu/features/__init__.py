"""Feature detection, description, matching, tracking (reference FeatureTracking/Matcher)."""

from . import descriptor, detector, matcher, tracking
from .tracking import FeatureTracking

__all__ = ["descriptor", "detector", "matcher", "tracking", "FeatureTracking"]
