"""Forward-additive SE(3) photometric alignment — the second, independent
photometric baseline.

Role of the reference's `RgbdAlignmentOpenCv` (RgbdAlignmentOpenCv.cpp:42-59,
which delegates to cv::rgbd::RgbdOdometry — an external forward-style dense
RGB-D aligner used to cross-check SE3Alignment) combined with the missing
forward-additive SE3 warp of `ForwardAdditive.cpp:51-90`: a dense
coarse-to-fine aligner that, unlike the inverse-compositional production path
(`ic.py`), rebuilds the Jacobian EVERY iteration from the *current* image's
gradients at the warped coordinates and updates the transform additively
(left-compositionally). Because its linearization point, gradient source and
update rule all differ from IC, agreement between the two is a meaningful
consistency check — exactly what the reference used its OpenCV baseline for.

Per iteration (all fused on device, inside a `lax.while_loop`):
    p' = T p_ref;  (u,v) = proj(p');  g = [dIx, dIy](u, v)
    J = g . Jproj(p')          (2x6 analytic, Warp.cpp:166-201)
    r = T(x) - I(u, v)         (FA residual sign, ForwardAdditive.cpp:60)
    solve (JᵀWJ) dx = JᵀWr;  T <- exp(dx) . T
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam_mod
from ..core import image as img_ops
from ..core import lie_np, se3
from ..core.frame import Frame
from ..core.se3 import SE3
from ..solvers import loss as loss_mod
from ..solvers.gauss_newton import SolverConfig, solve_gauss_newton
from ..solvers.linalg6 import inv_psd
from ..solvers.normal_equations import NormalEquations
from .ic import _projection_jacobian, precompute_level

__all__ = ["FaAlignmentConfig", "align_fa", "RgbdAlignerFa"]


@dataclasses.dataclass(frozen=True)
class FaAlignmentConfig:
    min_gradient: float = 30.0
    solver: SolverConfig = SolverConfig(max_iterations=50, min_step_size=1e-7)
    loss: loss_mod.LossConfig = loss_mod.LossConfig("None")
    max_points: int = 16384


def _level_fa(data, image, dIx, dIy, cam_cur, rel0: SE3, cfg: FaAlignmentConfig):
    """One pyramid level of forward-additive GN over the full transform T."""
    H, W = image.shape
    dtype = image.dtype

    def compute_ne(T: SE3) -> NormalEquations:
        p = se3.transform_points(T, data.pcl)
        uv, zok = cam_mod.project(cam_cur, p)
        u, v = uv[..., 0], uv[..., 1]
        vis = data.mask & zok & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
        us = jnp.where(vis, u, 0.0)
        vs = jnp.where(vis, v, 0.0)
        gx = img_ops.bilinear_sample(dIx, us, vs)
        gy = img_ops.bilinear_sample(dIy, us, vs)
        Jw = _projection_jacobian(p, fx=cam_cur.fx, fy=cam_cur.fy)  # (P, 2, 6)
        J = gx[:, None] * Jw[..., 0, :] + gy[:, None] * Jw[..., 1, :]
        J = jnp.where(vis[:, None], J, 0.0)
        iw = img_ops.bilinear_sample(image, us, vs)
        r = jnp.where(vis, data.templ - iw, 0.0)  # FA sign: T - I(W)

        if cfg.loss.function != "None":
            scale = loss_mod.compute_scale(cfg.loss, r, data.mask)
            w = jnp.where(vis, loss_mod.compute_weights(cfg.loss, (r - scale.offset) / scale.scale), 0.0)
        else:
            w = vis.astype(dtype)
        Jw_ = J * w[:, None]
        A = Jw_.T @ J
        b = Jw_.T @ r
        chi2 = jnp.sum(w * r * r)
        n = data.n_constraints
        inv_n = jnp.where(n > 1, 1.0 / jnp.maximum(n, 1.0), 1.0)
        return NormalEquations(A * inv_n, b * inv_n, chi2 * inv_n, n)

    def update(T: SE3, dx: jax.Array) -> SE3:
        return se3.orthonormalize(se3.compose(se3.exp(dx), T))

    res = solve_gauss_newton(compute_ne, update, rel0, n_params=6, config=cfg.solver)
    return res.x, res


@functools.partial(jax.jit, static_argnames=("cfg",))
def align_fa(
    ref_frame: Frame,  # single frame (no F axis)
    cur_frame: Frame,
    rel_init: SE3,
    cfg: FaAlignmentConfig = FaAlignmentConfig(),
) -> Tuple[SE3, jax.Array, jax.Array]:
    """Coarse-to-fine forward-additive alignment. Returns (rel, cov, valid)."""
    n_levels = len(ref_frame.intensity)
    rel = rel_init
    cov = jnp.eye(6, dtype=cur_frame.intensity[0].dtype)
    valid_any = jnp.asarray(False)
    for level in range(n_levels - 1, -1, -1):
        budget = cfg.max_points >> (2 * level) if cfg.max_points else 0
        data = precompute_level(
            ref_frame.intensity[level],
            ref_frame.dIx[level],
            ref_frame.dIy[level],
            ref_frame.depth[level],
            ref_frame.cameras[level],
            cfg.min_gradient,
            max_points=budget,
        )
        # raw 3x3 Sobel derivatives, exactly like the reference's FA consumes
        # frame->dIx() (ForwardAdditive.cpp:60-66): the 8x kernel gain makes
        # each GN step 1/8 of the true step — implicit damping that keeps FA
        # stable on large coarse-level motion (true-gradient full steps
        # overshoot into wrong basins)
        rel, res = _level_fa(
            data,
            cur_frame.intensity[level],
            cur_frame.dIx[level],
            cur_frame.dIy[level],
            cur_frame.cameras[level],
            rel,
            cfg,
        )
        cov = jnp.where(res.valid, inv_psd(res.A), cov)
        valid_any = valid_any | res.valid
    return rel, cov, valid_any


class RgbdAlignerFa:
    """Host-facing wrapper with the AlignmentSE3 interface — drop-in second
    photometric baseline next to RgbdAligner (reference wires
    RgbdAlignmentOpenCv the same way, Odometry.cpp:65-87)."""

    def __init__(self, cfg: FaAlignmentConfig = FaAlignmentConfig()):
        self.cfg = cfg

    def align(self, ref_frames, ref_poses, cur_frame: Frame, pred_pose: np.ndarray):
        ref_frame, ref_pose = ref_frames[0], ref_poses[0]
        rel0_np = lie_np.relative(ref_pose, pred_pose)
        # dtype read off the aval — np.asarray would D2H the whole image
        # (see aligner.RgbdAligner.align)
        dtype = np.dtype(cur_frame.intensity[0].dtype)
        rel0 = SE3(jnp.asarray(rel0_np[:3, :3], dtype), jnp.asarray(rel0_np[:3, 3], dtype))
        rel, cov, ok = align_fa(ref_frame, cur_frame, rel0, self.cfg)
        import jax as _jax

        # ONE fetch for everything the host needs (four separate
        # np.asarray calls would each pay a device round trip)
        R_h, t_h, cov_h, ok_h = _jax.device_get((rel.R, rel.t, cov, ok))
        T = np.eye(4)
        T[:3, :3] = np.asarray(R_h, np.float64)
        T[:3, 3] = np.asarray(t_h, np.float64)
        u, _, vt = np.linalg.svd(T[:3, :3])
        T[:3, :3] = u @ vt
        return T @ ref_pose, np.asarray(cov_h, np.float64), bool(ok_h)
