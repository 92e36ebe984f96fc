"""Mapping backend for the fused sequential path (full SLAM at scan speed).

The fused scan (`sequential.py`) covers the odometry front end on device;
this module runs the reference's keyframe backend between chunks — the same
track -> insert -> windowed BA -> (optional) loop-closure graph sequence as
`NodeMapping::processFrame` (`NodeMapping.cpp:162-180`) and the host
pipeline (`pipeline.py`), but batched per chunk:

- The device scan flags keyframes (`is_kf` output); only those frames get
  host-side Frame pyramids + features (1 in kf_period frames).
- BA / loop-closure corrections are folded back into the DEVICE pose chain
  as one right-composed delta (pose' = pose . T_est^-1 . T_corr, pivoting
  at the corrected keyframe) before the next chunk dispatches
  (`SequentialOdometry._apply_correction`), so the backend steers future
  tracking exactly like the reference's write-back (`Map::updatePoses`).
"""

from __future__ import annotations

import contextlib
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie_np, se3
from ..core.camera import Camera
from ..core.frame import Frame
from ..utils import timer
from ..utils.log import get_logger
from .map import HostFrame, Map

__all__ = ["ChunkMappingBackend", "anchor_trajectory"]


def anchor_trajectory(
    results: List[Tuple[int, np.ndarray, np.ndarray]],
    kf_trajectory: List[Tuple[int, np.ndarray]],
) -> List[Tuple[int, np.ndarray, np.ndarray]]:
    """Re-anchor a full odometry trajectory onto globally-optimized keyframe
    poses (the post-loop-closure output trajectory, what a TUM evaluation
    scores).

    The online output (`SequentialOdometry.run`) holds per-frame odometry
    poses; corrections fold into the DEVICE chain when they land, so frames
    solved BEFORE a closure keep their drifted history. After the run, each
    frame is rewritten relative to the latest keyframe at-or-before it:
    ``T' = T @ inv(T_kf_output) @ T_kf_final`` — exact for keyframes, and
    intermediate frames keep their measured CAMERA-relative motion off the
    corrected keyframe (right composition; a left-composed world-frame
    delta would rotate them about the world origin instead — the standard
    post-optimization trajectory assembly; the reference's backend stops at
    windowed BA, NodeMapping.cpp:162-170, so it has no equivalent).

    ``kf_trajectory``: (t_ns, final pose) per keyframe, sorted (e.g.
    `PoseGraphBackend.keyframe_trajectory`). Keyframe stamps must exist in
    ``results`` (they are output frames); unknown stamps are skipped."""
    if not kf_trajectory:
        return results
    out_by_t = {int(t): np.asarray(T, np.float64) for t, T, _ in results}
    anchors: List[Tuple[int, np.ndarray]] = []
    for t_kf, T_final in kf_trajectory:
        T_out = out_by_t.get(int(t_kf))
        if T_out is None:
            continue
        anchors.append((int(t_kf), lie_np.inv(T_out) @ np.asarray(T_final, np.float64)))
    if not anchors:
        return results
    anchor_ts = np.asarray([a[0] for a in anchors], np.int64)
    corrected = []
    for t_ns, T, cov in results:
        k = int(np.searchsorted(anchor_ts, int(t_ns), side="right")) - 1
        delta = anchors[k][1] if k >= 0 else np.eye(4)
        corrected.append((t_ns, np.asarray(T, np.float64) @ delta, cov))
    return corrected


@functools.partial(
    jax.jit, static_argnames=("depth_scale", "stereo_baseline", "max_disparity")
)
def _light_arrays(
    intensity, second, fx, depth_scale: float, stereo_baseline: float,
    max_disparity: int,
):
    """Level-0 (intensity f32, depth metres) for a backend keyframe, from the
    scan's already-staged native-dtype arrays — no image re-upload, no
    pyramid (the feature backend only reads level 0)."""
    inten = intensity.astype(jnp.float32)
    if stereo_baseline > 0.0:
        from ..io.kitti import stereo_depth

        depth = stereo_depth(
            inten, second.astype(jnp.float32), fx, stereo_baseline,
            max_disparity=max_disparity,
        )
    else:
        # mirror the scan step EXACTLY (sequential._step scales depth by
        # cfg.depth_scale unconditionally, whatever its dtype) — a float
        # depth-count stream must not silently skip the metres conversion
        depth = second.astype(jnp.float32) * jnp.float32(depth_scale)
    return inten, depth, jnp.zeros_like(inten)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth_scale", "stereo_baseline", "max_disparity", "threshold", "cell"
    ),
)
def _light_detect_batch(
    intensity, second, fx, depth_scale: float, stereo_baseline: float,
    max_disparity: int, threshold: float, cell: int,
):
    """Level-0 conversion + FAST/BRIEF extraction for ALL of a chunk's
    keyframes in ONE device program. The per-keyframe path costs one
    dispatch + one fetch per keyframe (`FeatureTracking.extract`) — ~100 ms
    each over a remote-attached chip, the single largest backend cost
    measured on hardware. Batching the keyframes (typically chunk/kf_period
    ~ 3) collapses that to one round trip per chunk; the light intensity/
    depth planes stay on device (the returned Frame slices are lazy)."""
    from ..features.tracking import _detect_describe

    def one(inten_j, second_j):
        inten, depth, _ = _light_arrays(
            inten_j, second_j, fx, depth_scale=depth_scale,
            stereo_baseline=stereo_baseline, max_disparity=max_disparity,
        )
        uv, resp, keep, desc, z = _detect_describe(
            inten, depth, threshold=threshold, cell=cell
        )
        return inten, depth, uv, resp, keep, desc, z

    return jax.vmap(one)(intensity, second)


def _light_frame(
    inten_dev, second_dev, camera: Camera, cfg, cam_host: Camera
) -> Frame:
    """One-level Frame for the keyframe backend. Derivative planes are zeros
    (nothing in the feature/BA/loop-closure path reads them); the camera
    carries HOST scalars so the backend's per-keyframe host math never pays
    a device fetch for an intrinsic."""
    inten, depth, zeros = _light_arrays(
        inten_dev,
        second_dev,
        camera.fx,
        depth_scale=float(cfg.depth_scale),
        stereo_baseline=float(cfg.stereo_baseline),
        max_disparity=int(getattr(cfg, "stereo_max_disparity", 96)),
    )
    return Frame(
        intensity=(inten,),
        depth=(depth,),
        dIx=(zeros,),
        dIy=(zeros,),
        cameras=(cam_host,),
        # host identity (the backend never reads the device pose; HostFrame
        # carries the f64 pose chain) — avoids a per-keyframe transfer
        pose=se3.SE3(np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
    )


class ChunkMappingBackend:
    def __init__(
        self,
        enable_ba: bool = True,
        enable_loop_closure: bool = False,
        ba_max_iterations: int = 20,
        pose_write_back: str = "gated",  # "gated" | "always" | "off"
        min_correction: float = 1e-3,
        ba_schedule: str = "chunk",  # "chunk" | "keyframe"
        track_schedule: str = "chunk",  # "chunk" | "keyframe"
        compute_device: str = "auto",  # "auto" | "cpu" | "default"
        tracking=None,  # FeatureTracking override (detector tuning — e.g. a
        # smaller NMS grid_cell for sub-VGA frames, where the default 30 px
        # cell caps detection at a few dozen keypoints)
        loop_closure_cfg=None,  # features.loop_closure.LoopClosureConfig
        fold_min_span_frac=None,  # PoseGraphBackend online-fold policy
        # override (> 1 = anchoring-only: closures refine the graph but
        # never touch the live chain — the measured best profile when the
        # front end's aligned shape error is smaller than closure noise)
    ):
        from ..features.tracking import FeatureTracking

        # pose_write_back policy. The reference persists every BA solution
        # into the map and lets it steer tracking (Map::updatePoses,
        # NodeMapping.cpp:170-175) — mode "always". With a DENSE front end
        # that is counterproductive in two measured ways (see
        # tests/test_sequential_mapping_gate.py): (1) the window gauge is the
        # oldest keyframe, so persisting BA poses re-anchors each round on
        # last round's BA noise — keyframe pose error random-walks UP
        # chunk over chunk even on clean data; (2) sparse BA's pose noise
        # floor (few dozen landmarks) is ~10x the dense aligner's error, so
        # unconditional write-back INJECTS error into an odometry chain
        # that is tighter than the correction. Mode "gated" (default):
        # keyframe poses stay odometry-anchored (no gauge random walk),
        # landmarks are always refined, and a correction folds into the
        # device chain + the newest keyframe only when it is statistically
        # significant under BA's OWN pose covariance (Mahalanobis > chi2_6
        # at 99%, `_drift_significant`) — i.e. the solver measured real
        # drift, not its own noise floor. `min_correction` is an absolute
        # metric floor on top. Mode "off": map-only refinement (no pose
        # write-back at all).
        if pose_write_back not in ("gated", "always", "off"):
            raise ValueError(f"unknown pose_write_back {pose_write_back!r}")
        # ba_schedule: when the windowed BA runs. "keyframe" is the
        # reference cadence (one solve per keyframe, NodeMapping.cpp:166);
        # "chunk" (default) solves once per chunk after all of its keyframes
        # are inserted and tracked — the same window is re-solved either
        # way, so per-keyframe solves mostly repeat work at ~100 ms/solve on
        # a remote chip (measured: 1/3 of the whole backend's budget).
        if ba_schedule not in ("chunk", "keyframe"):
            raise ValueError(f"unknown ba_schedule {ba_schedule!r}")
        self.ba_schedule = ba_schedule
        # track_schedule: "chunk" matches ALL of a chunk's keyframes in one
        # vmapped device program (one tunnel round trip instead of one per
        # keyframe — FeatureTracking.track_batch, with transitive landmark
        # resolution); "keyframe" is the reference's strictly sequential
        # per-keyframe cadence (FeatureTracking.cpp:71-203). Per-keyframe BA
        # (ba_schedule="keyframe") forces the sequential cadence — its BA
        # solves interleave between keyframes.
        if track_schedule not in ("chunk", "keyframe"):
            raise ValueError(f"unknown track_schedule {track_schedule!r}")
        self.track_schedule = track_schedule
        self.pose_write_back = pose_write_back
        self.min_correction = float(min_correction)
        self.map = Map()
        self._tracking = tracking if tracking is not None else FeatureTracking()
        self._ba = None
        self._graph = None
        if enable_ba:
            from ..ba.bundle_adjustment import BundleAdjustment

            self._ba = BundleAdjustment(
                max_iterations=ba_max_iterations,
                # the Mahalanobis gate is the covariance's only consumer
                compute_pose_covariance=(pose_write_back == "gated"),
            )
        if enable_loop_closure:
            from .graph_backend import PoseGraphBackend

            kw = {}
            if loop_closure_cfg is not None:
                kw["cfg"] = loop_closure_cfg
            if fold_min_span_frac is not None:
                kw["fold_min_span_frac"] = fold_min_span_frac
            self._graph = PoseGraphBackend(**kw)
        self._log = get_logger("mapping")
        self._cam_host: Optional[Camera] = None  # host-scalar intrinsics cache
        # compute_device: where the backend's SMALL-matrix programs (match,
        # BA) run. Their inputs are host numpy (fetched features, map state),
        # their problems are tiny (hundreds of keypoints, <=7 keyframes), and
        # the accelerator executes programs IN ORDER — so dispatching them to
        # the chip makes the backend contend with the front end's scan for
        # the one device (measured: the slam gate runs at ~2/3 of what the
        # scan alone sustains, all of the loss in backend device programs +
        # their round trips). "auto" (default) runs them on the host CPU
        # backend whenever the default backend is an accelerator: the
        # backend worker thread then computes CONCURRENTLY with the scan —
        # the reference's own topology (NodeMapping's backend thread on CPU
        # next to the alignment loop). Dense image work (feature detection)
        # stays on the accelerator regardless: it reads the scan's staged
        # chunk arrays and is batched into one early-dispatched program.
        # "cpu" forces the host path, "default" keeps everything on the
        # default backend.
        if compute_device not in ("auto", "cpu", "default"):
            raise ValueError(f"unknown compute_device {compute_device!r}")
        self._compute_dev = None
        if compute_device != "default":
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if cpus and (compute_device == "cpu" or jax.default_backend() != "cpu"):
                self._compute_dev = cpus[0]
        # matching inherits the same placement (extraction does not — it is
        # dense image work and stays on the default device)
        self._tracking.compute_ctx = self._compute_ctx

    def _compute_ctx(self):
        """Context placing the backend's match/BA programs (all-numpy
        inputs) on the host CPU backend — see `compute_device`."""
        if self._compute_dev is None:
            return contextlib.nullcontext()
        return jax.default_device(self._compute_dev)

    @property
    def n_landmarks(self) -> int:
        return len(self.map.points())

    @property
    def n_closures(self) -> int:
        return self._graph.n_closures if self._graph is not None else 0

    def corrected_trajectory(
        self, results: List[Tuple[int, np.ndarray, np.ndarray]]
    ) -> List[Tuple[int, np.ndarray, np.ndarray]]:
        """Post-run trajectory assembly: re-anchor the odometry output onto
        the pose graph's globally-optimized keyframe poses (no-op without a
        loop-closure graph — see `anchor_trajectory`)."""
        if self._graph is None:
            return results
        return anchor_trajectory(results, self._graph.keyframe_trajectory())

    def _ba_sane(self, poses, max_translation: float = 0.3, max_rotation: float = 0.3) -> bool:
        """BA write-back gate (mirrors pipeline._ba_sane / round-1 semantics):
        reject solutions that teleport keyframes."""
        for f in self.map.keyframes():
            if f.id in poses:
                d = lie_np.log(lie_np.relative(f.pose, poses[f.id]))
                if np.linalg.norm(d[:3]) > max_translation or np.linalg.norm(d[3:]) > max_rotation:
                    return False
        return True

    def _drift_significant(self, est_pose: np.ndarray, corrected: np.ndarray) -> bool:
        from ..ba.bundle_adjustment import drift_significant

        return drift_significant(self._ba, est_pose, corrected, self.min_correction)

    def dispatch_detect(self, kf_js, device_images, camera, cfg):
        """ASYNC dispatch of batched feature extraction (no fetch). The scan
        driver calls this on the MAIN thread right after it dispatches a
        chunk's scan — with ``kf_js=None`` it extracts EVERY frame of the
        chunk: the keyframe flags are a scan output the host hasn't seen at
        dispatch time, but device programs execute in enqueue order, so a
        detect dispatched any later (e.g. from the backend worker, which
        only gets the chunk after the NEXT scan is in flight) queues behind
        a whole scan program — head-of-line latency the worker then spends
        blocked in its first fetch. Detecting all frames trades a small
        amount of device compute (FAST/BRIEF is cheap next to the GN solve)
        for a perfect queue position."""
        if kf_js is None:
            imgs = (device_images[0], device_images[1])
        else:
            idxs = jnp.asarray(np.asarray(kf_js, np.int32))
            imgs = (device_images[0][idxs], device_images[1][idxs])
        return _light_detect_batch(
            imgs[0],
            imgs[1],
            camera.fx,
            depth_scale=float(cfg.depth_scale),
            stereo_baseline=float(cfg.stereo_baseline),
            max_disparity=int(getattr(cfg, "stereo_max_disparity", 96)),
            threshold=float(self._tracking.fast_threshold),
            cell=int(self._tracking.grid_cell),
        )

    def _detect_batch(self, kf_js, device_images, camera, cfg, out=None):
        """Batched keyframe feature extraction (see `_light_detect_batch`);
        light planes stay on device as lazy slices of the batch output.
        `out`: pre-dispatched device arrays from `dispatch_detect(None, ...)`
        covering ALL chunk frames — only the fetch remains, and the keyframe
        rows are sliced host-side. Returns (inten, depth, zeros, feats,
        rows) with `rows[bi]` the plane row of keyframe bi."""
        if out is None:
            out = self.dispatch_detect(kf_js, device_images, camera, cfg)
            feats = jax.device_get(out[2:])  # uv, resp, keep, desc, z
            plane_rows = np.arange(len(kf_js))
        else:
            # fetch ALL rows (already computed on device — slicing there
            # would enqueue a gather program behind the next scan), then
            # keep only the keyframe rows host-side
            sel = np.asarray(kf_js, np.int64)
            feats = tuple(a[sel] for a in jax.device_get(out[2:]))
            plane_rows = sel
        return (out[0], out[1], jnp.zeros_like(out[0][0]), feats, plane_rows)

    def process_chunk(
        self,
        buf: List,  # [(t_ns, intensity, depth)] raw stream items of the chunk
        poses: List[np.ndarray],  # world->cam 4x4 f64 per frame
        covs: List[np.ndarray],
        kf_flags: List[bool],
        camera: Camera,
        cfg,  # SequentialConfig (n_levels, depth_scale)
        device_images: Optional[Tuple] = None,  # staged (K,H,W) chunk arrays
        detect_out: Optional[Tuple] = None,  # pre-dispatched dispatch_detect
    ) -> Optional[np.ndarray]:
        """Run the keyframe backend over one chunk. Returns a 4x4
        right-composed correction (T_est^-1 . T_corr of the corrected
        keyframe) to fold into the device state, or None.

        ``device_images``, when given, carries the scan's already-staged
        native-dtype (intensity, depth/right) chunk arrays — keyframe frames
        are built from device SLICES (zero re-upload of the raw images)."""
        delta: Optional[np.ndarray] = None
        if self._cam_host is None:
            fx, fy, cx, cy = jax.device_get(
                (camera.fx, camera.fy, camera.cx, camera.cy)
            )
            self._cam_host = Camera(
                np.float32(fx), np.float32(fy), np.float32(cx), np.float32(cy)
            )
        kf_js = [j for j, is_kf in enumerate(kf_flags) if bool(is_kf)]
        if not kf_js:
            return None

        # ONE device round trip for every keyframe's extraction (see
        # _light_detect_batch); the light planes stay on device as lazy
        # slices of the batch
        batch = None
        if device_images is not None or detect_out is not None:
            try:
                with timer.scope("map.detect_batch"):
                    batch = self._detect_batch(
                        kf_js, device_images, camera, cfg, out=detect_out
                    )
            except Exception as exc:
                self._log.warning("batched keyframe extraction failed: %s", exc)
                batch = None

        # build every keyframe's HostFrame first (features from the batched
        # extraction when available, per-keyframe fallback otherwise)
        frames: List[Tuple[HostFrame, np.ndarray]] = []
        for bi, j in enumerate(kf_js):
            t_ns, intensity, depth = buf[j]
            est_pose = np.asarray(poses[j], np.float64)
            if batch is not None:
                inten_b, depth_b, zeros, (uv, _resp, keep, desc, z), plane_rows = batch
                pr = int(plane_rows[bi])
                dev = Frame(
                    intensity=(inten_b[pr],), depth=(depth_b[pr],),
                    dIx=(zeros,), dIy=(zeros,), cameras=(self._cam_host,),
                    pose=se3.SE3(np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
                )
                frame = HostFrame(
                    frame=dev, t_ns=int(t_ns), pose=est_pose, cov=np.asarray(covs[j])
                )
                k = keep[bi]
                frame.keypoints = uv[bi][k]
                frame.descriptors = desc[bi][k]
                frame.kp_depth = z[bi][k]
                frame.kp_landmark = np.full(len(frame.keypoints), -1, np.int64)
            else:
                if device_images is not None:
                    inten_j, second_j = device_images[0][j], device_images[1][j]
                else:
                    inten_j, second_j = jnp.asarray(intensity), jnp.asarray(depth)
                dev = _light_frame(inten_j, second_j, camera, cfg, self._cam_host)
                frame = HostFrame(
                    frame=dev, t_ns=int(t_ns), pose=est_pose, cov=np.asarray(covs[j])
                )
            frames.append((frame, est_pose))

        # chunk-batched matching (one device round trip for all keyframes)
        # needs (a) batch-extracted features and (b) no per-keyframe BA
        # interleave; otherwise run the reference's sequential cadence
        batch_track = (
            batch is not None
            and self.track_schedule == "chunk"
            and self.ba_schedule != "keyframe"
        )
        if batch_track:
            try:
                with timer.scope("map.track"):
                    # BEFORE insertion: track_batch reconstructs each
                    # keyframe's window refs itself (see its docstring) and
                    # inserts the new landmarks into the map
                    self._tracking.track_batch([f for f, _ in frames], self.map)
            except Exception as exc:
                if getattr(exc, "mutated_map", False):
                    # bookkeeping began: kp_landmark / landmark state is
                    # partially written, so a sequential re-track would
                    # corrupt the observation graph — skip tracking for
                    # this chunk (graceful degradation) instead
                    self._log.warning(
                        "chunk-batched tracking failed mid-write-back "
                        "(skipping the chunk's tracking): %s", exc
                    )
                else:
                    self._log.warning(
                        "chunk-batched tracking failed: %s", exc
                    )
                    batch_track = False

        last_frame: Optional[HostFrame] = None
        last_est: Optional[np.ndarray] = None
        for frame, est_pose in frames:
            self.map.insert(frame, True)
            last_frame, last_est = frame, est_pose
            try:
                if not batch_track:
                    with timer.scope("map.track"):
                        new_points = self._tracking.track(frame, self.map)
                    self.map.insert_points(new_points)
                    if self.ba_schedule == "keyframe":
                        d = self._run_ba(frame, est_pose)
                        delta = d if d is not None else delta
                if self._graph is not None:
                    with self._compute_ctx():
                        self._graph.add_keyframe(frame)
                        corrections = self._graph.try_close(frame)
                    if corrections and frame.id in corrections:
                        in_window = {f.id for f in self.map.keyframes()} | {
                            f.id for f in self.map.frames()
                        }
                        for fid, T in corrections.items():
                            if fid in in_window:
                                self.map.update_pose(fid, T)
                        # online fold only when the correction exceeds the
                        # closure fit's own noise (graph_backend.try_close);
                        # "always" keeps reference Map::updatePoses semantics
                        if (
                            self._graph.last_closure_significant
                            or self.pose_write_back == "always"
                        ):
                            # right-composed: pose' = pose . (est^-1 corr)
                            # (SequentialOdometry._apply_correction)
                            delta = lie_np.inv(est_pose) @ corrections[frame.id]
            except Exception as exc:  # graceful degradation, NodeMapping.cpp:176-178
                self._log.warning("chunk mapping backend failed: %s", exc)
        if self.ba_schedule == "chunk" and last_frame is not None:
            # one windowed solve per chunk, anchored on the newest keyframe
            # (the same sliding window a per-keyframe cadence re-solves
            # repeatedly — see ba_schedule in __init__)
            try:
                d = self._run_ba(last_frame, last_est)
                delta = d if d is not None else delta
            except Exception as exc:
                self._log.warning("chunk BA failed: %s", exc)
        return delta

    def _run_ba(
        self, frame: HostFrame, est_pose: np.ndarray
    ) -> Optional[np.ndarray]:
        """Windowed BA + the pose write-back policy. Returns the world-frame
        correction for the device chain, or None."""
        if self._ba is None or len(self.map.keyframes()) < 2:
            return None
        delta: Optional[np.ndarray] = None
        with timer.scope("map.ba"), self._compute_ctx():
            ba_poses, points, err0, err1 = self._ba.optimize(self.map)
        if err1 < err0 and self._ba_sane(ba_poses):
            self.map.update_points(points)
            corrected = ba_poses[frame.id]
            d = lie_np.inv(est_pose) @ corrected  # right-composed delta
            if self.pose_write_back == "always":
                # reference semantics: persist every BA pose
                self.map.update_poses(ba_poses)
                delta = d
                if self._graph is not None:
                    for fid, T in ba_poses.items():
                        self._graph.update_pose(fid, T)
            elif self.pose_write_back == "gated" and self._drift_significant(
                est_pose, corrected
            ):
                # real drift: correct the NEWEST keyframe + the device
                # chain; older keyframes (the landmark anchors) keep
                # their odometry poses
                self.map.update_pose(frame.id, corrected)
                delta = d
                if self._graph is not None:
                    self._graph.update_pose(frame.id, corrected)
        return delta
