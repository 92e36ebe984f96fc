"""Pipeline configuration mirroring the reference's ROS parameter tree.

Key names and defaults match `config/NodeMapping.yaml` and the declared
parameters in `src/ros/nodes/NodeRgbdAlignment.cpp:52-63` /
`NodeMapping.cpp:52-65`, so a reference YAML translates 1:1. A YAML loader is
provided (pyyaml if present, else a minimal parser for the flat subset used
by the reference configs).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .alignment.ic import AlignmentConfig
from .solvers.gauss_newton import SolverConfig
from .solvers.loss import LossConfig

__all__ = ["PipelineConfig", "load_yaml_config"]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # features.*
    features_min_gradient: float = 30.0
    # pyramid.levels — the reference's scale list [1.0, 0.5, 0.25]
    # (NodeMapping.yaml). NOTE: the reference itself uses only the list's
    # SIZE (NodeMapping.cpp:226 passes .size() to computePyramid; the values
    # are implicitly dyadic via cv::buildPyramid) — we store the values for
    # config fidelity and validate they are dyadic.
    pyramid_scales: Tuple[float, ...] = (1.0, 0.5, 0.25)
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
    # device-side depth conversion for native-dtype transport: when the
    # stream yields integer depth (e.g. TUM uint16 PNG counts), metres =
    # raw * depth_scale, converted ON DEVICE so the host->device link moves
    # the sensor's 16-bit counts, not f32 (mirrors SequentialConfig)
    depth_scale: float = 1.0 / 5000.0
    # interest-point budget per frame at the finest level: 0 / 32768 = all
    # points (reference-parity dense selection); the production tracking
    # profile uses 2048 (accuracy saturates, see bench.py's gate)
    features_max_points: int = 32768
    # alignment compute path: gather (XLA, works everywhere) | mxu | fused |
    # fused_gn (whole-level in-kernel Pallas GN — the bench profile)
    sampler: str = "gather"
    image_dtype: str = "float32"  # bfloat16 halves the fused kernels' MXU time
    # exposure-robust alignment (per-level photometric standardization of
    # both frames; capability extension — see AlignmentConfig)
    normalize_intensity: bool = False
    # SLAM backend (NodeMapping: feature tracking + windowed BA on keyframes)
    enable_mapping: bool = False
    ba_max_iterations: int = 50
    # BA pose write-back policy: "gated" folds a correction into the pose
    # chain only when it is statistically significant under BA's own pose
    # covariance (real drift, not the sparse solver's noise floor — see
    # ba.bundle_adjustment.drift_significant); "always" is the reference's
    # unconditional Map::updatePoses semantics; "off" refines the map only.
    ba_pose_write_back: str = "gated"
    # loop closure + global pose graph (capability extension, SURVEY §7 M5)
    enable_loop_closure: bool = False
    # log.image.<Name>.show / log.plot.<Name>.show flags from the reference
    # YAML (NodeMapping.cpp:125-135): sinks to enable at pipeline startup
    log_image_enabled: Tuple[str, ...] = ()
    log_plot_enabled: Tuple[str, ...] = ()
    # live visualization (the reference's RViz channel, NodeMapping.cpp:
    # 231-272): None = off; a port number starts the in-process HTTP viewer
    # (0 = ephemeral, read pipeline.viz.port). See vslam_tpu.viz.live.
    live_viz_port: Optional[int] = None

    def __post_init__(self):
        scales = tuple(float(s) for s in self.pyramid_scales)
        if not scales:
            raise ValueError("pyramid_scales must be non-empty")
        want = tuple(1.0 / (2**i) for i in range(len(scales)))
        if tuple(sorted(scales, reverse=True)) != want:
            raise ValueError(
                f"pyramid_scales must be dyadic (1, 0.5, 0.25, ...), got {scales} — "
                "the reference's pyramid is cv::buildPyramid (dyadic) and only the "
                "level count is free (NodeMapping.cpp:226)"
            )
        object.__setattr__(self, "pyramid_scales", scales)

    @property
    def pyramid_levels(self) -> int:
        return len(self.pyramid_scales)

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
            max_points=self.features_max_points,
            sampler=self.sampler,
            image_dtype=self.image_dtype,
            normalize_intensity=self.normalize_intensity,
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

    raw = raw or {}
    flat = _flatten(raw)
    kw = {}
    if "features.min_gradient" in flat:
        kw["features_min_gradient"] = float(flat["features.min_gradient"])
    if "pyramid.levels" in flat:
        levels = flat["pyramid.levels"]
        if isinstance(levels, list):
            kw["pyramid_scales"] = tuple(float(s) for s in levels)
        else:  # plain level count
            kw["pyramid_scales"] = tuple(1.0 / (2**i) for i in range(int(levels)))
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
    if "keyframe_selection.visible_map.max_translation" in flat:
        kw["keyframe_selection_max_translation"] = float(
            flat["keyframe_selection.visible_map.max_translation"]
        )
    # odometry behavior knobs (OdometryRgbd ctor, Odometry.h:46-60)
    if "odometry.include_key_frame" in flat:
        kw["include_key_frame"] = bool(flat["odometry.include_key_frame"])
    if "odometry.track_key_frame" in flat:
        kw["track_key_frame"] = bool(flat["odometry.track_key_frame"])
    if "odometry.include_prior" in flat:
        kw["include_prior"] = bool(flat["odometry.include_prior"])
    if "mapping.enabled" in flat:
        kw["enable_mapping"] = bool(flat["mapping.enabled"])
    if "mapping.loop_closure" in flat:
        kw["enable_loop_closure"] = bool(flat["mapping.loop_closure"])
    # visual-log sinks: log.image.<Name>.show / log.plot.<Name>.show
    # (NodeMapping.cpp:125-135)
    img_logs, plt_logs = [], []
    for section, out in (("image", img_logs), ("plot", plt_logs)):
        for name, sub in (raw.get("log", {}) or {}).get(section, {}).items():
            if isinstance(sub, dict) and sub.get("show"):
                out.append(str(name))
    if img_logs:
        kw["log_image_enabled"] = tuple(sorted(img_logs))
    if plt_logs:
        kw["log_plot_enabled"] = tuple(sorted(plt_logs))
    return PipelineConfig(**kw)
