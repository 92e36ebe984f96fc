"""Dense projective ICP (point-to-plane) on depth maps.

Role of the reference's geometric baseline aligners — `IterativeClosestPoint`
(PCL point-to-point, `iterative_closest_point/IterativeClosestPoint.cpp`) and
`IterativeClosestPointOcv` (cv::rgbd::ICPOdometry point-to-plane,
`IterativeClosestPointOcv.cpp`) — redesigned dense for TPU:

- correspondence search -> projective data association (transform ref points,
  project into the current depth map, gather the hit point + normal): no
  KD-trees, one gather per iteration;
- point-to-plane residuals r = n . (T p - q), the cv::rgbd formulation, with
  distance/normal-compatibility gating;
- the 6-dof solve is the same weighted (P,6) normal-equation MXU reduction
  used by the photometric aligner, inside a lax.while_loop.

Coarse-to-fine over the frame's depth pyramid; returns pose + covariance like
`AlignmentSE3::align`. Non-convergence keeps the initial guess, matching
IterativeClosestPoint.cpp:104-107.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam_mod
from ..core import lie_np, se3
from ..core.camera import Camera
from ..core.frame import Frame, frame_pcl
from ..core.se3 import SE3
from ..solvers.gauss_newton import SolverConfig, solve_gauss_newton
from ..solvers.linalg6 import inv_psd
from ..solvers.normal_equations import NormalEquations

__all__ = ["IcpConfig", "align_icp", "IcpAligner"]


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    solver: SolverConfig = SolverConfig(max_iterations=30, min_step_size=1e-7)
    max_distance: float = 0.25  # gate on point-pair distance [m]
    min_cos_normal: float = 0.5  # gate on normal agreement
    coarsest_level: Optional[int] = None  # default: all levels
    # "point_to_plane": the cv::rgbd ICPOdometry formulation (default).
    # "point_to_point": the PCL IterativeClosestPoint formulation
    # (IterativeClosestPoint.cpp:22-108) — 3 residuals per correspondence.
    variant: str = "point_to_plane"


def _normals_from_depth(points: jax.Array, valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel normals from central differences of the organized point
    cloud (the cv::rgbd approach). points: (H, W, 3)."""
    dx = jnp.roll(points, -1, axis=1) - jnp.roll(points, 1, axis=1)
    dy = jnp.roll(points, -1, axis=0) - jnp.roll(points, 1, axis=0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward the camera (-z half-space)
    flip = jnp.where(n[..., 2:3] > 0, -1.0, 1.0)
    n = n * flip
    ok = (
        valid
        & jnp.roll(valid, -1, axis=1) & jnp.roll(valid, 1, axis=1)
        & jnp.roll(valid, -1, axis=0) & jnp.roll(valid, 1, axis=0)
        & (norm[..., 0] > 1e-9)
    )
    return n, ok


def _hat(p: jax.Array) -> jax.Array:
    """Batched skew matrices: (P, 3) -> (P, 3, 3)."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _level_icp(ref_pts, ref_valid, ref_normals, cur_pts, cur_normals, cur_ok, cam_cur: Camera, rel0: SE3, cfg: IcpConfig):
    H, W = ref_valid.shape
    P = H * W
    p_ref = ref_pts.reshape(P, 3)
    m_ref = ref_valid.reshape(P)
    n_ref = ref_normals.reshape(P, 3)
    q_map = cur_pts.reshape(P, 3)
    n_map = cur_normals.reshape(P, 3)
    ok_map = cur_ok.reshape(P)
    dtype = p_ref.dtype

    # Solve over the full transform T directly (initialized at rel0) with the
    # left-multiplicative update T <- exp(-dx) . T: the Jacobian below is the
    # left perturbation of T, so framing the state as rel0 . delta would
    # mis-map the step by Adj(rel0) when the initial relative motion is large.
    def compute_ne(T: SE3) -> NormalEquations:
        p = se3.transform_points(T, p_ref)
        uv, zok = cam_mod.project(cam_cur, p)
        u = jnp.clip(jnp.floor(uv[..., 0] + 0.5), 0, W - 1).astype(jnp.int32)
        v = jnp.clip(jnp.floor(uv[..., 1] + 0.5), 0, H - 1).astype(jnp.int32)
        inb = (uv[..., 0] > 1) & (uv[..., 0] < W - 1) & (uv[..., 1] > 1) & (uv[..., 1] < H - 1)
        idx = v * W + u
        q = jnp.take(q_map, idx, axis=0)
        n = jnp.take(n_map, idx, axis=0)
        qok = jnp.take(ok_map, idx, axis=0)
        d = p - q
        dist = jnp.linalg.norm(d, axis=-1)
        # normal-compatibility gate (the cv::rgbd odometry correspondence
        # filter): the ref normal rotated into the current frame must agree
        # with the hit pixel's normal — rejects grazing and foreground/
        # background mismatches that pass the distance gate
        n_ref_cur = n_ref @ T.R.T
        cos_n = jnp.sum(n_ref_cur * n, axis=-1)
        valid = (
            m_ref & zok & inb & qok
            & (dist < cfg.max_distance)
            & (cos_n >= cfg.min_cos_normal)
        )
        w = valid.astype(dtype)
        # NOTE: unlike the photometric NE, A is NOT normalized by the
        # constraint count — residual entries are O(1) (metres / unit
        # normals), and dividing by thousands of points would push det(A)
        # under the solver's 1e-6 Hessian guard for well-posed geometry.
        if cfg.variant == "point_to_point":
            # r = T p - q (3 per correspondence); J_row for left perturbation
            # exp(dx) . T is [I | -[Tp]x] (PCL point-to-point objective,
            # IterativeClosestPoint.cpp:22-108)
            eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (P, 3, 3))
            px = _hat(p)
            J3 = jnp.concatenate([eye, -px], axis=-1)  # (P, 3, 6)
            Jf = (J3 * w[:, None, None]).reshape(P * 3, 6)
            J0 = J3.reshape(P * 3, 6)
            rf = d.reshape(P * 3)
            A = Jf.T @ J0
            # Jf already carries w: b = J^T W r (weighting r as well would
            # square the weight — harmless for binary gates, a trap for
            # robust weights)
            b = Jf.T @ rf
            chi2 = jnp.sum(w[:, None] * d * d)
        else:  # point_to_plane
            r = jnp.sum(n * d, axis=-1)
            # J = [n ; (p x n)] for left-multiplicative update exp(dx) . T
            J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)
            Jw = J * w[:, None]
            A = Jw.T @ J
            b = Jw.T @ r  # Jw carries w already (see point-to-point branch)
            chi2 = jnp.sum(w * r * r)
        nc = jnp.sum(w)
        return NormalEquations(A, b, chi2, nc)

    def update(T: SE3, dx: jax.Array) -> SE3:
        return se3.orthonormalize(se3.compose(se3.exp(-dx), T))

    res = solve_gauss_newton(compute_ne, update, rel0, n_params=6, config=cfg.solver)
    return res.x, res


@functools.partial(jax.jit, static_argnames=("cfg",))
def align_icp(ref_frame: Frame, cur_frame: Frame, rel_init: SE3, cfg: IcpConfig = IcpConfig()):
    """Coarse-to-fine dense ICP. Returns (rel, cov, valid)."""
    n_levels = len(ref_frame.depth)
    start = cfg.coarsest_level if cfg.coarsest_level is not None else n_levels - 1
    rel = rel_init
    cov = jnp.eye(6, dtype=cur_frame.depth[0].dtype)
    any_valid = jnp.asarray(False)
    for level in range(start, -1, -1):
        ref_pts, ref_valid = frame_pcl(ref_frame, level)
        cur_pts, cur_valid = frame_pcl(cur_frame, level)
        normals, n_ok = _normals_from_depth(cur_pts, cur_valid)
        ref_normals, ref_n_ok = _normals_from_depth(ref_pts, ref_valid)
        rel, res = _level_icp(
            ref_pts, ref_valid & ref_n_ok, ref_normals, cur_pts, normals, n_ok,
            cur_frame.cameras[level], rel, cfg,
        )
        cov = jnp.where(res.valid, inv_psd(res.A), cov)
        any_valid = any_valid | res.valid
    return rel, cov, any_valid


class IcpAligner:
    """Host-facing wrapper with the AlignmentSE3 interface (align(from, to) ->
    pose + covariance), so `OdometryIcp` (Odometry.cpp:65-87) plugs in."""

    def __init__(self, cfg: IcpConfig = IcpConfig()):
        self.cfg = cfg

    def align(self, ref_frames, ref_poses, cur_frame: Frame, pred_pose: np.ndarray):
        ref_frame = ref_frames[0]
        ref_pose = ref_poses[0]
        rel0_np = lie_np.relative(ref_pose, pred_pose)
        # dtype read off the aval — np.asarray would D2H the whole image
        # (see aligner.RgbdAligner.align)
        dtype = np.dtype(cur_frame.depth[0].dtype)
        rel0 = SE3(jnp.asarray(rel0_np[:3, :3], dtype), jnp.asarray(rel0_np[:3, 3], dtype))
        rel, cov, ok = align_icp(ref_frame, cur_frame, rel0, self.cfg)
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
