"""Pipeline configuration mirroring the reference's ROS parameter tree.

Key names and defaults match `config/NodeMapping.yaml` and the declared
parameters in `src/ros/nodes/NodeRgbdAlignment.cpp:52-63` /
`NodeMapping.cpp:52-65`, so a reference YAML translates 1:1. A YAML loader is
provided (pyyaml if present, else a minimal parser for the flat subset used
by the reference configs).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from .alignment.ic import AlignmentConfig
from .solvers.gauss_newton import SolverConfig
from .solvers.loss import LossConfig

__all__ = ["PipelineConfig", "load_yaml_config"]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # features.*
    features_min_gradient: float = 30.0
    # pyramid.levels — scale list; the number of entries is the level count
    pyramid_levels: int = 3
    # solver.*
    solver_max_iterations: int = 100
    solver_min_step_size: float = 1e-11
    # f32 production profile (no reference equivalent — its absolute f64
    # thresholds never fire in f32): stop when the relative chi2 improvement
    # drops below this; None = strict reference parity
    solver_min_relative_reduction: Optional[float] = 1e-4
    # loss.*
    loss_function: str = "None"  # None | Tukey | Huber | tdistribution
    loss_huber_c: float = 1.43
    loss_tdistribution_v: float = 5.0
    # prediction.*
    prediction_model: str = "ConstantMotion"  # NoMotion | ConstantMotion | Kalman
    # keyframe_selection.*
    keyframe_selection_method: str = "idx"  # idx | visible_map
    keyframe_selection_idx_period: int = 5
    keyframe_selection_min_visible_points: int = 50
    keyframe_selection_max_translation: float = 0.2
    # odometry behavior (OdometryRgbd ctor, Odometry.h:46-60)
    include_key_frame: bool = True
    track_key_frame: bool = False
    include_prior: bool = True
    # TPU-specific knobs (no reference equivalent)
    interpolation: str = "bilinear"  # bilinear (default) | nearest (reference parity)
    # SLAM backend (NodeMapping: feature tracking + windowed BA on keyframes)
    enable_mapping: bool = False
    ba_max_iterations: int = 50

    def alignment_config(self) -> AlignmentConfig:
        return AlignmentConfig(
            min_gradient=self.features_min_gradient,
            solver=SolverConfig(
                max_iterations=self.solver_max_iterations,
                min_step_size=self.solver_min_step_size,
                min_relative_reduction=self.solver_min_relative_reduction,
            ),
            loss=LossConfig(
                function=self.loss_function,
                huber_c=self.loss_huber_c,
                tdistribution_v=self.loss_tdistribution_v,
            ),
            include_prior=self.include_prior,
            interpolation=self.interpolation,
        )


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def load_yaml_config(path: str) -> PipelineConfig:
    """Build a PipelineConfig from a reference-style YAML parameter file."""
    try:
        import yaml  # type: ignore

        with open(path) as f:
            raw = yaml.safe_load(f)
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("pyyaml not available; construct PipelineConfig directly") from exc

    flat = _flatten(raw or {})
    kw = {}
    if "features.min_gradient" in flat:
        kw["features_min_gradient"] = float(flat["features.min_gradient"])
    if "pyramid.levels" in flat:
        levels = flat["pyramid.levels"]
        kw["pyramid_levels"] = len(levels) if isinstance(levels, list) else int(levels)
    if "solver.max_iterations" in flat:
        kw["solver_max_iterations"] = int(flat["solver.max_iterations"])
    if "solver.min_step_size" in flat:
        kw["solver_min_step_size"] = float(flat["solver.min_step_size"])
    if "loss.function" in flat:
        kw["loss_function"] = str(flat["loss.function"])
    if "loss.huber.c" in flat:
        kw["loss_huber_c"] = float(flat["loss.huber.c"])
    if "loss.tdistribution.v" in flat:
        kw["loss_tdistribution_v"] = float(flat["loss.tdistribution.v"])
    if "prediction.model" in flat:
        kw["prediction_model"] = str(flat["prediction.model"])
    if "keyframe_selection.method" in flat:
        kw["keyframe_selection_method"] = str(flat["keyframe_selection.method"])
    if "keyframe_selection.idx.period" in flat:
        kw["keyframe_selection_idx_period"] = int(flat["keyframe_selection.idx.period"])
    if "keyframe_selection.visible_map.min_visible_points" in flat:
        kw["keyframe_selection_min_visible_points"] = int(
            flat["keyframe_selection.visible_map.min_visible_points"]
        )
    return PipelineConfig(**kw)
