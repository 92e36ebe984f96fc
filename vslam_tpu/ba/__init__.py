"""Bundle adjustment backend (replaces reference mapping::BundleAdjustment/Ceres)."""

from . import bundle_adjustment
from .bundle_adjustment import BaProblem, BundleAdjustment, solve_ba

__all__ = ["bundle_adjustment", "BaProblem", "BundleAdjustment", "solve_ba"]
