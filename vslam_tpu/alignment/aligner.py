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
from ..utils.log import log_plt
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


class RgbdAligner:
    def __init__(self, cfg: AlignmentConfig = AlignmentConfig()):
        self.cfg = cfg

    def align(
        self,
        ref_frames: Sequence[Frame],
        ref_poses: Sequence[np.ndarray],  # world->cam 4x4 f64
        cur_frame: Frame,
        pred_pose: np.ndarray,  # predicted world->cam 4x4 f64
    ) -> Tuple[np.ndarray, np.ndarray, bool]:
        """Coarse-to-fine alignment of `cur_frame` against one or more
        reference frames (stacked normal equations, SE3Alignment.cpp:106-146).

        Returns (pose_world_to_cam 4x4 f64, covariance 6x6, valid).
        """
        dtype = np.asarray(cur_frame.intensity[0]).dtype
        rels = [lie_np.relative(p, pred_pose) for p in ref_poses]
        rel_init = SE3(
            jnp.asarray(np.stack([r[:3, :3] for r in rels]), dtype),
            jnp.asarray(np.stack([r[:3, 3] for r in rels]), dtype),
        )
        x_pred = jnp.asarray(
            np.stack([lie_np.log(r) for r in rels]), dtype
        )
        ref_stack = stack_frames(ref_frames)
        plt_sink = log_plt("SolverGN")
        if plt_sink.enabled:
            # solver observability: per-iteration chi2/step history per level
            # (reference emits LOG_PLT("SolverGN") after every solve,
            # GaussNewton.cpp:100)
            rel_out, cov, valid, diag = _align_diag_jit(
                ref_stack, cur_frame, rel_init, x_pred, self.cfg
            )
            plt_sink.log({k: np.asarray(v) for k, v in diag.items()})
        else:
            rel_out, cov, valid = _align_jit(ref_stack, cur_frame, rel_init, x_pred, self.cfg)

        ok = bool(valid)
        rel0 = np.eye(4)
        rel0[:3, :3] = np.asarray(rel_out.R[0], np.float64)
        rel0[:3, 3] = np.asarray(rel_out.t[0], np.float64)
        # re-orthonormalize in f64 before composing into the absolute chain
        u, _, vt = np.linalg.svd(rel0[:3, :3])
        rel0[:3, :3] = u @ vt
        pose = rel0 @ ref_poses[0]
        return pose, np.asarray(cov, np.float64), ok


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
