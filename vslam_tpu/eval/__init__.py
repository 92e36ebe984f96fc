"""Evaluation harness (reference layer 8, `script/vslam_evaluation/`)."""

from . import metrics
from .metrics import associate, ate_rmse, rpe, summarize

__all__ = ["metrics", "associate", "ate_rmse", "rpe", "summarize"]
