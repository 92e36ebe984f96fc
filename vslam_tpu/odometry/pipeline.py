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

import functools

from ..alignment import ic as _ic
from ..core import se3 as _se3
from ..core.frame import sensor_to_f32 as _sensor_to_f32
from ..core.se3 import SE3 as _SE3


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_levels", "depth_scale", "prediction_model", "include_kf"
    ),
)
def _chain_step_jit(
    intensity, depth, camera, kf_data, last_data, pose_kf, pose_last, speed,
    dt, cfg, n_levels: int, depth_scale: float, prediction_model: str,
    include_kf: bool,
):
    """One whole per-frame update with the POSE CHAIN ON DEVICE: frame build +
    precompute + constant-motion prediction + joint {keyframe, last} alignment
    + speed update, in ONE dispatch and ZERO host inputs besides the image.

    This is what makes the host loop software-pipelineable: `align_build`
    needs the predicted pose from the host, so the host must fetch frame i's
    pose before it can dispatch frame i+1 — serializing (upload + solve +
    fetch RTT) per frame. Here prediction reads the device-resident chain, so
    frame i+1 dispatches immediately and frame i's scalar fetch overlaps
    i+1's solve (see OdometryPipeline.run). Math mirrors the fused scan step
    (sequential._step) frame-for-frame; the reference's per-frame sequence is
    NodeRgbdAlignment.cpp:121-149."""
    intensity, depth = _sensor_to_f32(intensity, depth, depth_scale)
    frame = create_frame(intensity, depth, camera, n_levels=n_levels)
    cur_data = _ic.precompute_frame(frame, cfg)

    if prediction_model == "ConstantMotion":
        pred = _se3.compose(_se3.exp(speed * dt), pose_last)
    else:  # NoMotion
        pred = pose_last

    if include_kf:
        ref_data = tuple(
            jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), kd, ld)
            for kd, ld in zip(kf_data, last_data)
        )
        rel_k = _se3.compose(pred, _se3.inverse(pose_kf))
        rel_l = _se3.compose(pred, _se3.inverse(pose_last))
        rel_init = _SE3(jnp.stack([rel_k.R, rel_l.R]), jnp.stack([rel_k.t, rel_l.t]))
        x_pred = jnp.stack([_se3.log(rel_k), _se3.log(rel_l)])
        pose_ref0 = pose_kf
    else:
        ref_data = tuple(
            jax.tree_util.tree_map(lambda a: a[None], ld) for ld in last_data
        )
        rel_l = _se3.compose(pred, _se3.inverse(pose_last))
        rel_init = _SE3(rel_l.R[None], rel_l.t[None])
        x_pred = _se3.log(rel_l)[None]
        pose_ref0 = pose_last

    rel, cov, ok = _ic.align(None, frame, rel_init, x_pred, cfg, ref_data=ref_data)
    pose_al = _se3.orthonormalize(_se3.compose(_SE3(rel.R[0], rel.t[0]), pose_ref0))
    pose_new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), pose_al, pred
    )
    rel_last = _se3.compose(pose_new, _se3.inverse(pose_last))
    speed_new = jnp.where(
        ok & (dt > 0), _se3.log(rel_last) / jnp.maximum(dt, 1e-6),
        jnp.zeros(6, jnp.float32),
    )
    return frame, cur_data, pose_new, cov, ok, speed_new


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_levels", "depth_scale")
)
def _build_frame_jit(intensity, depth, camera, cfg, n_levels: int, depth_scale: float):
    """Frame build + alignment precompute fused into ONE dispatch. Module
    level ON PURPOSE: jitted per-instance closures give every new
    OdometryPipeline a cold jit cache — measured 6.6 s of recompilation on a
    fresh pipeline's first frame at 480x640 (the whole difference between 4
    and ~20 fps in a timed replay that constructs its own pipeline)."""
    intensity, depth = _sensor_to_f32(intensity, depth, depth_scale)
    frame = create_frame(intensity, depth, camera, n_levels=n_levels)
    return frame, _ic.precompute_frame(frame, cfg)


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
        self._align_cfg = cfg.alignment_config()  # hashable jit key, built once
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
        # live visualization channel (the reference's RViz publishers,
        # NodeMapping.cpp:231-272): /odom + /path + markers over an
        # in-process HTTP viewer; pure host-side, O(1) per frame
        self.viz = None
        if cfg.live_viz_port is not None:
            from ..viz import LiveViz

            self.viz = LiveViz(port=cfg.live_viz_port)

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
                device_frame, level_data = _build_frame_jit(
                    jnp.asarray(intensity),
                    jnp.asarray(depth),
                    self.camera,
                    self._align_cfg,
                    self.cfg.pyramid_levels,
                    self.cfg.depth_scale,
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
                        # corrected loop-closing keyframe — the live pose
                        # only when the correction beats the closure fit's
                        # measured noise (graph_backend.try_close)
                        in_window = {f.id for f in self.map.keyframes()} | {
                            f.id for f in self.map.frames()
                        }
                        for fid, T in corrections.items():
                            if fid in in_window:
                                self.map.update_pose(fid, T)
                        if self._graph.last_closure_significant:
                            frame.pose = corrections.get(frame.id, frame.pose)
                            self.prediction.update(frame.pose, t_ns, cov=frame.cov)
            except Exception as exc:  # graceful degradation, NodeMapping.cpp:176-178
                self._log.warning("mapping backend failed: %s", exc)

        self.trajectory.append(t_ns, frame.pose, frame.cov)
        if self.viz is not None:
            self._publish_viz(t_ns, frame, is_kf)
        timer.record("pipeline.frame_total", time.perf_counter() - t0)
        self._log.debug(
            "frame t=%d kf=%s dt=%.1fms", t_ns, is_kf, 1e3 * (time.perf_counter() - t0)
        )
        return frame.pose, frame.cov

    def _publish_viz(self, t_ns: int, frame: HostFrame, is_kf: bool) -> None:
        """Feed the live viewer: per-frame odometry (pose + covariance +
        twist — the reference's /odom + /path + TF publish,
        NodeMapping.cpp:255-271), keyframe markers, and the current map
        cloud on keyframes when the mapping backend is live."""
        self.viz.publish_odometry(
            t_ns, frame.pose, cov=frame.cov, twist=self.prediction.speed_host()
        )
        if is_kf:
            self.viz.publish_keyframe(t_ns, frame.pose)
            if self.cfg.enable_mapping:
                pts = self.map.points()
                if pts:
                    self.viz.publish_landmarks(
                        np.stack([p.position for p in pts])
                    )

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

    def run(
        self,
        stream: Iterable[Tuple[int, np.ndarray, np.ndarray]],
        pipelined: Optional[bool] = None,
    ) -> Trajectory:
        """Replay a stream. ``pipelined=None`` (default) software-pipelines
        the per-frame loop by one frame whenever the config is eligible —
        identical per-frame results (same dispatch cadence, same keyframe
        schedule), but frame i's scalar fetch overlaps frame i+1's solve, so
        a link round trip leaves the per-frame critical path. Eligibility:
        idx keyframe policy + ConstantMotion/NoMotion prediction + no mapping
        backend + no visual-log sinks (everything else needs frame i's HOST
        pose before frame i+1 dispatches). ``pipelined=False`` forces the
        strict one-frame-at-a-time loop."""
        if pipelined is None:
            pipelined = self._pipelined_eligible()
        if not pipelined:
            for t_ns, intensity, depth in device_prefetch(stream):
                self.process_frame(t_ns, intensity, depth)
            return self.trajectory
        return self._run_pipelined(stream)

    def _pipelined_eligible(self) -> bool:
        cfg = self.cfg
        sinks_on = any(
            log_img(n).enabled for n in ("ImageWarped", "Residual", "Weights")
        ) or log_plt("SolverGN").enabled
        return (
            cfg.keyframe_selection_method == "idx"
            and cfg.prediction_model in ("ConstantMotion", "NoMotion")
            and not cfg.enable_mapping
            and not cfg.enable_loop_closure
            and not sinks_on
        )

    def _run_pipelined(self, stream, retire_depth: int = 4) -> Trajectory:
        """Software pipeline over the per-frame loop: dispatch each frame's
        whole update without blocking (device-side prediction,
        `_chain_step_jit`), and retire the pending frames' scalar results in
        BATCHES of `retire_depth` — one device_get round trip per batch
        instead of one per frame. On a remote-attached chip whose client
        serializes RPCs on one channel, the per-frame link cost then drops
        from (upload + fetch RTT) to (upload + RTT/retire_depth). Frames are
        still consumed strictly in order and every frame produces its pose
        before the run returns; host bookkeeping (map/trajectory/prediction
        mirrors) lags dispatch by at most retire_depth frames, which is
        invisible to the eligible configs (idx keyframes, device prediction —
        nothing on the dispatch path reads the host mirrors)."""
        it = device_prefetch(stream, depth=2)
        pending: list = []
        self._prev_retired: Optional[HostFrame] = None
        for t_ns, inten, depth in it:
            if self.map.last_frame() is None:
                # first frame initializes chain + map via the standard path
                # (no alignment happens), then seeds the device pose chain
                self.process_frame(t_ns, inten, depth)
                f0 = self.map.last_frame()
                P = np.asarray(f0.pose)
                pose_dev = _SE3(
                    jnp.asarray(P[:3, :3], jnp.float32),
                    jnp.asarray(P[:3, 3], jnp.float32),
                )
                self._pl = {
                    "kf_data": f0.level_data,
                    "last_data": f0.level_data,
                    "pose_kf": pose_dev,
                    "pose_last": pose_dev,
                    "speed": jnp.zeros(6, jnp.float32),
                    "t_last": int(t_ns),
                }
                self._prev_retired = f0
                continue
            pending.append(self._dispatch_chain(t_ns, inten, depth))
            if len(pending) >= retire_depth:
                self._retire_batch(pending)
                pending = []
        if pending:
            self._retire_batch(pending)
        return self.trajectory

    def _retire_batch(self, recs: list) -> None:
        """ONE blocking fetch for a batch of dispatched frames' scalars, then
        in-order host bookkeeping for each."""
        with timer.scope("pipeline.retire"):
            fetched = jax.device_get(
                [(p.R, p.t, cov, ok) for _, p, cov, ok, _ in recs]
            )
        for (hf, _, _, _, is_kf), (R, t, cov_h, ok_h) in zip(recs, fetched):
            self._retire_chain((hf, R, t, cov_h, ok_h, is_kf))

    def _dispatch_chain(self, t_ns: int, inten, depth):
        pl = self._pl
        dt = (int(t_ns) - pl["t_last"]) / 1e9
        align_cfg = self._align_cfg
        with timer.scope("pipeline.dispatch"):
            frame_dev, cur_data, pose_new, cov, ok, speed_new = _chain_step_jit(
                jnp.asarray(inten),
                jnp.asarray(depth),
                self.camera,
                pl["kf_data"],
                pl["last_data"],
                pl["pose_kf"],
                pl["pose_last"],
                pl["speed"],
                jnp.float32(dt),
                align_cfg,
                self.cfg.pyramid_levels,
                self.cfg.depth_scale,
                self.cfg.prediction_model,
                self.cfg.include_key_frame,
            )
        hf = HostFrame(
            frame=frame_dev, t_ns=int(t_ns), pose=np.eye(4), level_data=cur_data
        )
        # keyframe schedule is pose-free (idx policy) -> known at dispatch;
        # the SAME policy object keeps the cadence identical to process_frame
        self.keyframe_selection.update(hf)
        is_kf = self.keyframe_selection.is_keyframe()
        pl.update(last_data=cur_data, pose_last=pose_new, speed=speed_new,
                  t_last=int(t_ns))
        if is_kf:
            pl.update(kf_data=cur_data, pose_kf=pose_new)
        return (hf, pose_new, cov, ok, is_kf)

    def _retire_chain(self, rec) -> None:
        hf, R, t, cov_h, ok_h, is_kf = rec
        T = np.eye(4)
        u, _, vt = np.linalg.svd(np.asarray(R, np.float64))
        T[:3, :3] = u @ vt
        T[:3, 3] = np.asarray(t, np.float64)
        hf.pose = T
        hf.cov = np.asarray(cov_h, np.float64)
        # keep the host-side odometry/prediction state coherent (a later
        # non-pipelined process_frame call continues seamlessly)
        self.odometry.commit(hf, T, hf.cov, bool(ok_h), self._prev_retired)
        self.prediction.update(hf.pose, hf.t_ns, cov=hf.cov)
        self.map.insert(hf, is_kf)
        self.trajectory.append(hf.t_ns, hf.pose, hf.cov)
        if self.viz is not None:
            self._publish_viz(hf.t_ns, hf, is_kf)
        self._prev_retired = hf


def device_prefetch(
    stream: Iterable[Tuple[int, np.ndarray, np.ndarray]], depth: int = 2
) -> Iterable[Tuple[int, jnp.ndarray, jnp.ndarray]]:
    """Stage frames on device ahead of the consumer.

    `jax.device_put` is asynchronous on a local device, so frame i+depth
    crosses the host->device link while the pipeline is still solving frame
    i. (On the remote-attached measurement chip the client serializes its
    RPCs on one channel — an uploader THREAD was tried and measured 2.5x
    WORSE than inline puts from lock contention, so transfers stay inline;
    the round-trip amortization lives in the retire batching instead, see
    `OdometryPipeline._run_pipelined`.) The NodeReplayer/Queue pairing keeps
    its lock-step semantics: frames are consumed strictly in order, just
    staged early."""
    import collections

    buf = collections.deque()
    for t_ns, intensity, depth_img in stream:
        buf.append((t_ns, jax.device_put(intensity), jax.device_put(depth_img)))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
