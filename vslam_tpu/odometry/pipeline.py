"""Per-frame odometry/SLAM pipeline — the TPU-native replacement for the
reference's ROS node graph.

The DDS topic plumbing, Queue pairing, and set_ready lock-step of
`NodeRgbdAlignment`/`NodeMapping`/`NodeReplayer` collapse into a
deterministic host loop (the replayer's lock-step IS a Python for-loop's
semantics — SURVEY.md §2.9). Per frame (mirrors NodeMapping::processFrame,
NodeMapping.cpp:142-180):

  frame build (device pyramid) -> motion prediction -> dense alignment on
  TPU -> keyframe policy -> map insert -> [keyframe backend: feature
  tracking + windowed BA] -> trajectory append.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..alignment.aligner import RgbdAligner
from ..config import PipelineConfig
from ..core.camera import Camera
from ..core.frame import create_frame
from ..utils import timer
from ..utils.log import get_logger, log_img, log_plt
from .keyframe import make_keyframe_selection
from .map import HostFrame, Map
from .motion_model import make_motion_prediction
from .odometry import OdometryRgbd
from .trajectory import Trajectory

__all__ = ["OdometryPipeline", "device_prefetch"]


class OdometryPipeline:
    """Streaming odometry: feed (t_ns, intensity, depth) tuples, collect a
    trajectory. Set `cfg.enable_mapping` for the full SLAM backend."""

    def __init__(self, camera: Camera, cfg: PipelineConfig = PipelineConfig()):
        self.cfg = cfg
        self.camera = camera
        self.map = Map()
        self.aligner = RgbdAligner(cfg.alignment_config())
        self.odometry = OdometryRgbd(
            self.aligner,
            self.map,
            include_key_frame=cfg.include_key_frame,
            track_key_frame=cfg.track_key_frame,
        )
        self.prediction = make_motion_prediction(cfg.prediction_model)
        self.keyframe_selection = make_keyframe_selection(
            cfg.keyframe_selection_method,
            self.map,
            period=cfg.keyframe_selection_idx_period,
            min_visible_points=cfg.keyframe_selection_min_visible_points,
            max_translation=cfg.keyframe_selection_max_translation,
        )
        self.trajectory = Trajectory()
        import functools

        align_cfg = cfg.alignment_config()

        def _build(intensity, depth, camera):
            # frame build + alignment precompute fused into ONE dispatch:
            # unjitted, the ~30 pyramid/Sobel ops each pay a device-dispatch
            # round trip (~100 ms/frame on a remote-attached chip vs ~4 ms
            # fused); the precompute is cached on the HostFrame and reused
            # whenever this frame serves as an alignment reference.
            from ..alignment import ic as _ic

            # native-dtype transport: u8/u16 frames convert on device (shared
            # definition with the fused step — core.frame.sensor_to_f32)
            from ..core.frame import sensor_to_f32 as _sensor_to_f32

            intensity, depth = _sensor_to_f32(intensity, depth, cfg.depth_scale)
            frame = create_frame(intensity, depth, camera, n_levels=cfg.pyramid_levels)
            return frame, _ic.precompute_frame(frame, align_cfg)

        self._create_frame_jit = jax.jit(_build)
        self._log = get_logger("odometry")
        # enable visual-log sinks requested by the config (the reference
        # wires log.image/plot show flags at node startup,
        # NodeMapping.cpp:125-135)
        for name in cfg.log_image_enabled:
            log_img(name).enabled = True
        for name in cfg.log_plot_enabled:
            log_plt(name).enabled = True
        self._tracking = None
        self._ba = None
        self._graph = None
        if cfg.enable_mapping or cfg.enable_loop_closure:
            from ..features.tracking import FeatureTracking

            self._tracking = FeatureTracking()
        if cfg.enable_mapping:
            from ..ba.bundle_adjustment import BundleAdjustment

            self._ba = BundleAdjustment(
                max_iterations=cfg.ba_max_iterations,
                compute_pose_covariance=(cfg.ba_pose_write_back == "gated"),
            )
        if cfg.enable_loop_closure:
            from .graph_backend import PoseGraphBackend

            self._graph = PoseGraphBackend()

    def process_frame(
        self, t_ns: int, intensity: np.ndarray, depth: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (pose world->cam 4x4, cov 6x6) for this frame."""
        t0 = time.perf_counter()
        with timer.scope("pipeline.predict"):
            pred = self.prediction.predict(t_ns)

        last, ref_hosts = self.odometry.select_refs()
        sinks_on = any(
            log_img(n).enabled for n in ("ImageWarped", "Residual", "Weights")
        ) or log_plt("SolverGN").enabled
        if (
            last is not None
            and not sinks_on
            and all(h.level_data is not None for h in ref_hosts)
        ):
            # hot path: build + precompute + align as ONE dispatch + ONE fetch
            # (the whole NodeRgbdAlignment callback as a single XLA program)
            with timer.scope("pipeline.step"):
                device_frame, level_data, pose, cov, ok = self.aligner.align_build(
                    intensity,
                    depth,
                    self.camera,
                    self.cfg.pyramid_levels,
                    [h.level_data for h in ref_hosts],
                    [h.pose for h in ref_hosts],
                    pred,
                    depth_scale=self.cfg.depth_scale,
                )
            frame = HostFrame(
                frame=device_frame, t_ns=int(t_ns), pose=pred, level_data=level_data
            )
            self.odometry.commit(frame, pose, cov, ok, last)
        else:
            # first frame / visual-log sinks enabled: separate build and
            # align dispatches (the align services the per-iteration sinks)
            with timer.scope("pipeline.create_frame"):
                # one jitted dispatch: unjitted, the ~30 pyramid/Sobel ops
                # each pay a device-dispatch round trip (~100 ms/frame on a
                # remote-attached chip vs ~4 ms fused)
                device_frame, level_data = self._create_frame_jit(
                    jnp.asarray(intensity),
                    jnp.asarray(depth),
                    self.camera,
                )
            frame = HostFrame(
                frame=device_frame, t_ns=int(t_ns), pose=pred, level_data=level_data
            )
            with timer.scope("pipeline.align"):
                self.odometry.update(frame)
        frame.pose = self.odometry.pose
        frame.cov = self.odometry.cov

        # visual logs (LOG_IMG parity: ImageWarped/Residual/Weights, Log.h:39)
        # are emitted PER GN ITERATION by the aligner itself during
        # odometry.update (RgbdAligner._emit_iteration_logs, the reference's
        # InverseCompositional.cpp:149-151 affordance) — null-objects unless a
        # sink was enabled via utils.log.log_img(name).
        self.prediction.update(frame.pose, t_ns, cov=frame.cov)

        self.keyframe_selection.update(frame)
        is_kf = self.keyframe_selection.is_keyframe() or self.map.last_kf() is None
        self.map.insert(frame, is_kf)

        if is_kf and self._tracking is not None:
            try:
                with timer.scope("pipeline.mapping"):
                    if self.cfg.enable_mapping:
                        new_points = self._tracking.track(frame, self.map)
                        self.map.insert_points(new_points)
                    else:  # loop-closure-only: features without landmarks
                        self._tracking.extract(frame)
                if self._ba is not None and len(self.map.keyframes()) >= 2:
                    from ..ba.bundle_adjustment import drift_significant as _drift_significant

                    poses, points, err0, err1 = self._ba.optimize(self.map)
                    if err1 < err0 and self._ba_sane(poses):
                        self.map.update_points(points)
                        corrected = poses[frame.id]
                        mode = self.cfg.ba_pose_write_back
                        if mode == "always":
                            # reference Map::updatePoses semantics
                            self.map.update_poses(poses)
                            frame.pose = corrected
                            if self._graph is not None:
                                for fid, T in poses.items():
                                    self._graph.update_pose(fid, T)
                        elif mode == "gated" and _drift_significant(
                            self._ba, frame.pose, corrected
                        ):
                            # significant drift: correct the NEWEST keyframe
                            # only; older keyframes (the landmark anchors)
                            # keep their odometry poses — persisting BA noise
                            # into the window gauge random-walks the map
                            self.map.update_pose(frame.id, corrected)
                            frame.pose = corrected
                            if self._graph is not None:
                                self._graph.update_pose(frame.id, corrected)
                if self._graph is not None:
                    with timer.scope("pipeline.loop_closure"):
                        self._graph.add_keyframe(frame)
                        corrections = self._graph.try_close(frame)
                    if corrections:
                        # write corrected keyframe poses back into the live
                        # window and re-anchor the current pose on the
                        # corrected loop-closing keyframe
                        in_window = {f.id for f in self.map.keyframes()} | {
                            f.id for f in self.map.frames()
                        }
                        for fid, T in corrections.items():
                            if fid in in_window:
                                self.map.update_pose(fid, T)
                        frame.pose = corrections.get(frame.id, frame.pose)
                        self.prediction.update(frame.pose, t_ns, cov=frame.cov)
            except Exception as exc:  # graceful degradation, NodeMapping.cpp:176-178
                self._log.warning("mapping backend failed: %s", exc)

        self.trajectory.append(t_ns, frame.pose, frame.cov)
        timer.record("pipeline.frame_total", time.perf_counter() - t0)
        self._log.debug(
            "frame t=%d kf=%s dt=%.1fms", t_ns, is_kf, 1e3 * (time.perf_counter() - t0)
        )
        return frame.pose, frame.cov

    def _ba_sane(self, poses, max_translation: float = 0.3, max_rotation: float = 0.3) -> bool:
        """Reject BA write-backs that move any keyframe implausibly far from
        its odometry estimate — a wrong-correspondence landmark can minimize
        reprojection chi2 while wrecking the trajectory (seen with weak
        texture); the odometry poses are trusted to this tolerance."""
        from ..core import lie_np

        by_id = {f.id: f for f in self.map.keyframes()}
        for fid, T in poses.items():
            f = by_id.get(fid)
            if f is None:
                continue
            xi = lie_np.log(lie_np.relative(f.pose, T))
            if np.linalg.norm(xi[:3]) > max_translation or np.linalg.norm(xi[3:]) > max_rotation:
                self._log.warning("BA rejected: frame %d moved %.3f", fid, np.linalg.norm(xi[:3]))
                return False
        return True

    def run(self, stream: Iterable[Tuple[int, np.ndarray, np.ndarray]]) -> Trajectory:
        for t_ns, intensity, depth in device_prefetch(stream):
            self.process_frame(t_ns, intensity, depth)
        return self.trajectory


def device_prefetch(
    stream: Iterable[Tuple[int, np.ndarray, np.ndarray]], depth: int = 1
) -> Iterable[Tuple[int, jnp.ndarray, jnp.ndarray]]:
    """Stage frames on device one step ahead of the consumer.

    `jax.device_put` is asynchronous, so frame i+1 crosses the host->device
    link while the pipeline is still solving frame i — the transfer leaves
    the per-frame critical path (it is the dominant per-frame cost on a
    remote-attached chip). The NodeReplayer/Queue pairing of the reference
    keeps its lock-step semantics: frames are still consumed strictly in
    order, just staged early."""
    import collections

    buf = collections.deque()
    for t_ns, intensity, depth_img in stream:
        buf.append((t_ns, jax.device_put(intensity), jax.device_put(depth_img)))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
