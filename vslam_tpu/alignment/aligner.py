"""Host-facing SE(3) RGB-D aligner.

Equivalent of reference `SE3Alignment` (odometry/src/direct_image_alignment/
SE3Alignment.cpp): owns the alignment config, jit-compiles the dense
coarse-to-fine program once per image geometry, and converts between the
host's f64 absolute poses and the device's f32 relative transforms.

API sketch (mirrors AlignmentSE3::align, AlignmentSE3.h:22-26):

    aligner = RgbdAligner(AlignmentConfig(...))
    pose, cov, ok = aligner.align([kf, last], [kf_pose, last_pose], cur, pred)
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie_np
from ..core.frame import Frame
from ..core.se3 import SE3
from ..utils.log import log_img, log_plt
from . import ic
from .ic import AlignmentConfig

__all__ = ["RgbdAligner", "stack_frames"]


def stack_frames(frames: Sequence[Frame]) -> Frame:
    """Stack per-frame pytrees along a new leading F axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _align_jit(ref_stack: Frame, cur_frame: Frame, rel_init: SE3, x_pred, cfg: AlignmentConfig):
    return ic.align(ref_stack, cur_frame, rel_init, x_pred, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _align_diag_jit(ref_stack: Frame, cur_frame: Frame, rel_init: SE3, x_pred, cfg: AlignmentConfig):
    return ic.align(ref_stack, cur_frame, rel_init, x_pred, cfg, with_diagnostics=True)


@functools.partial(jax.jit, static_argnames=("level", "cfg"))
def _level_data_jit(ref_stack: Frame, level: int, cfg: AlignmentConfig):
    """Per-level interest-point data of the stacked reference frames (for the
    iteration-log replay; mirrors the in-align precompute)."""
    from ..core.camera import Camera as _Cam

    cam = _Cam(*(jnp.reshape(c, (-1,))[0] for c in ref_stack.cameras[level]))
    budget = cfg.max_points >> (2 * level) if cfg.max_points else 0
    inten = ref_stack.intensity[level]
    dIx, dIy = ref_stack.dIx[level], ref_stack.dIy[level]
    if cfg.normalize_intensity:
        # the solve ran in standardized photometric space; replayed
        # residual/weight images must use the same template units
        inten, dIx, dIy = ic.normalize_level(inten, dIx, dIy)
    return ic.precompute_level(
        inten,
        dIx,
        dIy,
        ref_stack.depth[level],
        cam,
        cfg.min_gradient,
        max_points=budget,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _align_record_jit(ref_stack: Frame, cur_frame: Frame, rel_init: SE3, x_pred, cfg: AlignmentConfig):
    """Alignment + the per-iteration GN trace (log(delta) per evaluated
    iteration per level) for the visual-log replay."""
    return ic.align(
        ref_stack, cur_frame, rel_init, x_pred, cfg, record_iterations=True
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _align_cached_jit(ref_datas, cur_frame: Frame, rel_init: SE3, x_pred, cfg: AlignmentConfig):
    """Alignment from per-frame cached level data (ic.precompute_frame):
    the reference frames' steepest-descent precompute is reused across calls
    — it only ever changes when a frame enters the map. ref_datas is a tuple
    of per-frame tuples; stacked here (on device) along the F axis."""
    n_levels = len(ref_datas[0])
    ref_data = tuple(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *(d[lvl] for d in ref_datas))
        for lvl in range(n_levels)
    )
    return ic.align(None, cur_frame, rel_init, x_pred, cfg, ref_data=ref_data)


@functools.partial(jax.jit, static_argnames=("cfg", "n_levels", "depth_scale"))
def _build_align_jit(
    intensity, depth, camera, ref_datas, rel_init: SE3, x_pred, cfg: AlignmentConfig,
    n_levels: int, depth_scale: float = 1.0,
):
    """Frame build + alignment precompute + cached-reference alignment fused
    into ONE device dispatch — the host parity pipeline's entire per-frame
    device program (the reference runs pyramid build and the solve inside one
    subscriber callback, NodeRgbdAlignment.cpp:121-149; here that callback is
    one XLA executable, so the per-frame cost is one dispatch + one fetch
    instead of three round trips).

    Accepts frames in their NATIVE sensor dtype (uint8 intensity, uint16
    depth counts with ``depth_scale`` metres/count — what the reference's
    cv::IMREAD_GRAYSCALE / TUM depth PNGs actually carry): the f32 conversion
    happens on device, so the host->device link moves 4x less data (it is
    the parity pipeline's bottleneck on a remote-attached chip)."""
    from ..core.frame import create_frame as _create_frame
    from ..core.frame import sensor_to_f32 as _sensor_to_f32

    intensity, depth = _sensor_to_f32(intensity, depth, depth_scale)
    frame = _create_frame(intensity, depth, camera, n_levels=n_levels)
    level_data = ic.precompute_frame(frame, cfg)
    ref_data = tuple(
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *(d[lvl] for d in ref_datas))
        for lvl in range(n_levels)
    )
    rel_out, cov, valid = ic.align(None, frame, rel_init, x_pred, cfg, ref_data=ref_data)
    return frame, level_data, rel_out, cov, valid


def _prep_init(ref_poses, pred_pose, dtype):
    """Host f64 -> device f32 conversion of the per-reference initial
    relative transforms and prior means (SE3Alignment.cpp:112-118)."""
    rels = [lie_np.relative(p, pred_pose) for p in ref_poses]
    rel_init = SE3(
        jnp.asarray(np.stack([r[:3, :3] for r in rels]), dtype),
        jnp.asarray(np.stack([r[:3, 3] for r in rels]), dtype),
    )
    x_pred = jnp.asarray(np.stack([lie_np.log(r) for r in rels]), dtype)
    return rel_init, x_pred


def _finish(rel_out: SE3, cov, valid, ref_pose0: np.ndarray):
    """One fetch for everything the host needs, then f64 re-orthonormalized
    composition into the absolute pose chain (SE3Alignment.cpp:142-143)."""
    R0, t0, cov, ok = jax.device_get((rel_out.R[0], rel_out.t[0], cov, valid))
    ok = bool(ok)
    rel0 = np.eye(4)
    rel0[:3, :3] = np.asarray(R0, np.float64)
    rel0[:3, 3] = np.asarray(t0, np.float64)
    u, _, vt = np.linalg.svd(rel0[:3, :3])
    rel0[:3, :3] = u @ vt
    pose = rel0 @ ref_pose0
    return pose, np.asarray(cov, np.float64), ok


class RgbdAligner:
    def __init__(self, cfg: AlignmentConfig = AlignmentConfig()):
        self.cfg = cfg

    def align(
        self,
        ref_frames: Sequence[Frame],
        ref_poses: Sequence[np.ndarray],  # world->cam 4x4 f64
        cur_frame: Frame,
        pred_pose: np.ndarray,  # predicted world->cam 4x4 f64
        ref_data: Optional[Sequence] = None,  # per-frame ic.precompute_frame tuples
    ) -> Tuple[np.ndarray, np.ndarray, bool]:
        """Coarse-to-fine alignment of `cur_frame` against one or more
        reference frames (stacked normal equations, SE3Alignment.cpp:106-146).

        When ``ref_data`` carries every reference frame's cached
        ``ic.precompute_frame`` output, the per-level interest-point
        precompute is skipped (it is constant for a frame's lifetime in the
        map — the reference precomputes once per problem,
        InverseCompositional.cpp:50-59).

        Returns (pose_world_to_cam 4x4 f64, covariance 6x6, valid).
        """
        # dtype read off the aval — np.asarray here would D2H the whole image
        dtype = np.dtype(cur_frame.intensity[0].dtype)
        rel_init, x_pred = _prep_init(ref_poses, pred_pose, dtype)
        plt_sink = log_plt("SolverGN")
        img_sinks = [log_img(n) for n in ("ImageWarped", "Residual", "Weights")]
        if any(s.enabled for s in img_sinks):
            # per-GN-iteration visual logs (InverseCompositional.cpp:149-151):
            # align while recording the 6-dof state per iteration, then
            # replay each evaluated iteration into warped/residual/weights
            # images and push them through the enabled sinks, coarsest level
            # first (the solve order)
            ref_stack = stack_frames(ref_frames)
            rel_out, cov, valid, diag = _align_record_jit(
                ref_stack, cur_frame, rel_init, x_pred, self.cfg
            )
            if plt_sink.enabled:
                plt_sink.log(
                    {k: np.asarray(diag[k]) for k in ("chi2", "step_size", "iterations")}
                )
            self._emit_iteration_logs(ref_stack, cur_frame, diag, img_sinks)
        elif plt_sink.enabled:
            # solver observability: per-iteration chi2/step history per level
            # (reference emits LOG_PLT("SolverGN") after every solve,
            # GaussNewton.cpp:100)
            rel_out, cov, valid, diag = _align_diag_jit(
                stack_frames(ref_frames), cur_frame, rel_init, x_pred, self.cfg
            )
            plt_sink.log({k: np.asarray(v) for k, v in diag.items()})
        elif ref_data is not None and all(d is not None for d in ref_data):
            rel_out, cov, valid = _align_cached_jit(
                tuple(ref_data), cur_frame, rel_init, x_pred, self.cfg
            )
        else:
            rel_out, cov, valid = _align_jit(
                stack_frames(ref_frames), cur_frame, rel_init, x_pred, self.cfg
            )

        return _finish(rel_out, cov, valid, ref_poses[0])

    def align_build(
        self,
        intensity: np.ndarray,
        depth: np.ndarray,
        camera,
        n_levels: int,
        ref_datas: Sequence,  # per-frame ic.precompute_frame tuples (device)
        ref_poses: Sequence[np.ndarray],
        pred_pose: np.ndarray,
        depth_scale: float = 1.0,
    ):
        """Fused per-frame step: pyramid build + precompute + alignment in ONE
        device dispatch, followed by ONE scalar fetch — the parity pipeline's
        whole per-frame device interaction (vs build dispatch + align dispatch
        + fetch on the :meth:`align` path). Visual-log sinks are not serviced
        here; the pipeline falls back to :meth:`align` when any is enabled.

        Returns (device_frame, level_data, pose 4x4 f64, cov 6x6 f64, ok).
        """
        rel_init, x_pred = _prep_init(ref_poses, pred_pose, np.dtype(np.float32))
        # dtype-preserving staging: uint8/uint16 frames cross the link raw
        # and convert on device (see _build_align_jit); f32 stays f32
        frame, level_data, rel_out, cov, valid = _build_align_jit(
            jnp.asarray(intensity),
            jnp.asarray(depth),
            camera,
            tuple(ref_datas),
            rel_init,
            x_pred,
            self.cfg,
            n_levels,
            depth_scale,
        )
        pose, cov, ok = _finish(rel_out, cov, valid, ref_poses[0])
        return frame, level_data, pose, cov, ok

    def _emit_iteration_logs(self, ref_stack, cur_frame, diag, sinks) -> None:
        """Replay each evaluated GN iteration into the enabled LOG_IMG sinks
        (ImageWarped / Residual / Weights — one array per iteration, the
        reference's per-iteration emission, InverseCompositional.cpp:149-151).
        One jitted dispatch per logged iteration; debug-only path."""
        warped_sink, residual_sink, weights_sink = sinks
        x_log = np.asarray(diag["x_log"])  # (L, I, 6)
        rel0_R = np.asarray(diag["rel0_R"])
        rel0_t = np.asarray(diag["rel0_t"])
        L = x_log.shape[0]
        for l_idx in range(L):
            level = L - 1 - l_idx  # histories are stored coarsest-first
            data = _level_data_jit(ref_stack, level, self.cfg)
            n_eval = int(np.isfinite(x_log[l_idx, :, 0]).sum())
            for i in range(n_eval):
                out = jax.device_get(
                    ic.iteration_images(
                        data,
                        jnp.asarray(rel0_R[l_idx]),
                        jnp.asarray(rel0_t[l_idx]),
                        jnp.asarray(x_log[l_idx, i]),
                        cur_frame.intensity[level],
                        cur_frame.cameras[level],
                        self.cfg,
                    )
                )
                warped_sink.log(out["image_warped"])
                residual_sink.log(out["residual"])
                weights_sink.log(out["weights"])


def debug_images(ref_frame: Frame, cur_frame: Frame, rel_pose: np.ndarray, level: int = 0):
    """Diagnostic images for a converged alignment — the reference emits
    these per GN iteration via LOG_IMG (ImageWarped / Residual / Weights,
    InverseCompositional.cpp:149-151). Recomputed once at the given pose
    (host-triggered; the jitted solver itself stays image-free).

    Returns dict of numpy arrays: image_warped (current image pulled onto the
    reference grid), residual, visible_mask.
    """
    import jax.numpy as jnp

    from ..core import camera as cam_mod
    from ..core import image as img_ops
    from ..core.frame import frame_pcl
    from ..core.se3 import SE3

    H, W = ref_frame.intensity[level].shape
    pts, valid = frame_pcl(ref_frame, level)
    rel = SE3(jnp.asarray(rel_pose[:3, :3], jnp.float32), jnp.asarray(rel_pose[:3, 3], jnp.float32))
    from ..core import se3 as se3_mod

    p = se3_mod.transform_points(rel, pts.reshape(-1, 3))
    uv, zok = cam_mod.project(cur_frame.cameras[level], p)
    u, v = uv[..., 0], uv[..., 1]
    vis = valid.reshape(-1) & zok & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
    samp = img_ops.bilinear_sample(
        cur_frame.intensity[level], jnp.where(vis, u, 0.0), jnp.where(vis, v, 0.0)
    )
    warped = jnp.where(vis, samp, 0.0).reshape(H, W)
    residual = jnp.where(
        vis.reshape(H, W), warped - ref_frame.intensity[level], 0.0
    )
    return {
        "image_warped": np.asarray(warped),
        "residual": np.asarray(residual),
        "visible_mask": np.asarray(vis.reshape(H, W)),
    }
