"""Batched + multi-chip tracking (TPU scaling layer; reference has none — SURVEY.md §2.9)."""

from . import batched
from .batched import align_pairs, make_mesh, shard_batch, sharded_tracking_step, tracking_step

__all__ = [
    "batched",
    "align_pairs",
    "make_mesh",
    "shard_batch",
    "sharded_tracking_step",
    "tracking_step",
]
