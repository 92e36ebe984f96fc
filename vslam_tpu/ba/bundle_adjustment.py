"""Windowed bundle adjustment: Schur-complement Levenberg-Marquardt in JAX.

Replaces the reference's Ceres backend (`odometry/src/mapping/
BundleAdjustment.cpp`: SE3-manifold pose blocks, autodiff reprojection cost,
DENSE_SCHUR). TPU-native formulation:

- Observations are a padded static array (frame_idx, point_idx, uv, mask);
  residuals/Jacobians for ALL observations evaluate in one fused pass
  (analytic, not autodiff — the projection Jacobian is closed-form).
- The block-sparse Hessian is assembled with segment-sums; the point blocks
  (3x3) invert in closed form batched, and the reduced camera system
  (6K x 6K, K <= 7 keyframes) is one dense solve — exactly the DENSE_SCHUR
  structure, sized for the reference's 7-keyframe window (Map.cpp:19).
- Pose updates are right-multiplicative SE(3) increments, matching the
  Sophus manifold Plus used by the reference.
- Points behind the camera contribute zero residual, as the reference's
  cost functor does (BundleAdjustment.cpp:24-45).

Deviation: the reference leaves the gauge free (Ceres' LM damping handles
the singular directions); we additionally freeze the first pose block, which
fixes the gauge explicitly and conditions the reduced system.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.camera import Camera
from ..core.se3 import SE3
from ..solvers.linalg6 import inv3

__all__ = ["BaProblem", "solve_ba", "BundleAdjustment"]


class BaProblem(NamedTuple):
    poses: SE3  # (K,) world->cam
    pose_mask: jax.Array  # (K,) bool — valid pose slots
    points: jax.Array  # (M, 3) world
    point_mask: jax.Array  # (M,) bool
    obs_frame: jax.Array  # (O,) int32 pose index
    obs_point: jax.Array  # (O,) int32 point index
    obs_uv: jax.Array  # (O, 2)
    obs_mask: jax.Array  # (O,) bool
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    # RGB-D extension (no reference equivalent — the reference's BA is
    # reprojection-only and scale-gauge-free): measured keypoint depth per
    # observation anchors the scale. obs_z <= 0 disables the term.
    obs_z: jax.Array = None  # (O,) measured depth [m]


def _residuals(p: BaProblem, poses: SE3, points: jax.Array, huber_c: float = 5.0):
    """r (O, 3), J_pose (O, 3, 6), J_point (O, 3, 3), valid (O,).

    Rows 0-1: pixel reprojection (Huber-weighted if huber_c > 0).
    Row 2: depth residual (z - z_meas) scaled to pixel units by fx/z —
    present only where obs_z > 0."""
    R = poses.R[p.obs_frame]  # (O, 3, 3)
    t = poses.t[p.obs_frame]
    X = points[p.obs_point]  # (O, 3)
    pc = jnp.einsum("oij,oj->oi", R, X) + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    ok = (z > 0.1) & p.obs_mask  # reference's z>0.1 gate (BundleAdjustment.cpp:26)
    zs = jnp.where(ok, z, 1.0)
    u = p.fx * x / zs + p.cx
    v = p.fy * y / zs + p.cy
    r_uv = jnp.stack([u, v], axis=-1) - p.obs_uv
    r_uv = jnp.where(ok[:, None], r_uv, 0.0)

    obs_z = p.obs_z if p.obs_z is not None else jnp.zeros_like(z)
    z_on = ok & (obs_z > 0.0)
    wz = jnp.where(z_on, p.fx / zs, 0.0)
    r_z = jnp.where(z_on, (z - obs_z) * wz, 0.0)

    zi = 1.0 / zs
    zi2 = zi * zi
    zero = jnp.zeros_like(zi)
    # d [u; v; wz*z] / d pc  (wz treated as constant per iteration)
    Jproj = jnp.stack(
        [
            jnp.stack([p.fx * zi, zero, -p.fx * x * zi2], axis=-1),
            jnp.stack([zero, p.fy * zi, -p.fy * y * zi2], axis=-1),
            jnp.stack([zero, zero, wz], axis=-1),
        ],
        axis=-2,
    )  # (O, 3, 3)
    # right-multiplicative pose perturbation: pc = pose . exp(d) . X
    # d pc / d d = R . [I | -hat(X)]
    hatX = se3.so3_hat(X)  # (O, 3, 3)
    Dp = jnp.concatenate([jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), hatX.shape), -hatX], axis=-1)
    J_pose = jnp.einsum("oab,obc,ocd->oad", Jproj, R, Dp)  # (O, 3, 6)
    J_point = jnp.einsum("oab,obc->oac", Jproj, R)  # (O, 3, 3)
    J_pose = jnp.where(ok[:, None, None], J_pose, 0.0)
    J_point = jnp.where(ok[:, None, None], J_point, 0.0)

    r = jnp.concatenate([r_uv, r_z[:, None]], axis=-1)
    w = jnp.ones_like(z)
    if huber_c and huber_c > 0:
        # IRLS Huber on the FULL per-observation residual norm (pixel rows +
        # the depth row, which r_z already scales to pixel units by fx/z):
        # scales residual rows and Jacobians by sqrt(w) so the NE assembly
        # stays a plain sum. Weighting on the pixel norm alone would let a
        # depth outlier with a good pixel match (object boundary, mixed
        # pixel) enter the solve at full weight and dominate chi2.
        rn = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(rn > huber_c, huber_c / jnp.maximum(rn, 1e-9), 1.0)
        sw = jnp.sqrt(w)[:, None]
        r = r * sw
        J_pose = J_pose * sw[..., None]
        J_point = J_point * sw[..., None]
    return r, J_pose, J_point, ok, w


def _chi2(p: BaProblem, poses: SE3, points: jax.Array, huber_c: float = 5.0) -> jax.Array:
    r, _, _, _, _ = _residuals(p, poses, points, huber_c)
    return jnp.sum(r * r)


@functools.partial(jax.jit, static_argnames=("huber_c",))
def effective_residual_count(
    p: BaProblem, poses: SE3, points: jax.Array, huber_c: float = 5.0
) -> jax.Array:
    """Huber-effective number of scalar residuals at the solution:
    sum over valid observations of w * (2 pixel rows + 1 depth row where
    present). The residual-variance estimate sigma2 = chi2 / (n_eff - dof)
    must use this, not the raw row count — chi2 is Huber-DOWNWEIGHTED, so
    dividing by raw rows systematically underestimates sigma2 and makes the
    Mahalanobis drift gate fire on solver jitter."""
    _, _, _, ok, w = _residuals(p, poses, points, huber_c)
    obs_z = p.obs_z if p.obs_z is not None else jnp.zeros_like(w)
    rows = 2.0 + (ok & (obs_z > 0.0)).astype(w.dtype)
    return jnp.sum(jnp.where(ok, w * rows, 0.0))


def _schur_dense(p: BaProblem, poses: SE3, points: jax.Array, lam, huber_c: float):
    """Assemble the gauge-fixed dense reduced camera system. Returns
    (Sd (6K,6K), rhs_d (6K,), free6, Vinv, Wkm, bx) — shared by the LM step
    and the pose-covariance extraction."""
    K = poses.t.shape[0]
    M = points.shape[0]
    r, Jp, Jx, ok, _ = _residuals(p, poses, points, huber_c)

    U = jax.ops.segment_sum(
        jnp.einsum("oai,oaj->oij", Jp, Jp), p.obs_frame, num_segments=K
    )  # (K, 6, 6)
    V = jax.ops.segment_sum(
        jnp.einsum("oai,oaj->oij", Jx, Jx), p.obs_point, num_segments=M
    )  # (M, 3, 3)
    Wkm = jax.ops.segment_sum(
        jnp.einsum("oai,oaj->oij", Jp, Jx),
        p.obs_frame * M + p.obs_point,
        num_segments=K * M,
    ).reshape(K, M, 6, 3)
    bp = -jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jp, r), p.obs_frame, num_segments=K)
    bx = -jax.ops.segment_sum(jnp.einsum("oai,oa->oi", Jx, r), p.obs_point, num_segments=M)

    eye6 = jnp.eye(6, dtype=r.dtype)
    eye3 = jnp.eye(3, dtype=r.dtype)
    # Levenberg identity damping; also keeps empty/padded blocks invertible
    U = U + lam * eye6
    V = V + lam * eye3

    Vinv = inv3(V)  # (M, 3, 3) batched, closed-form adjugate
    # Schur: S = U_bd - W V^-1 W^T   (assembled dense (6K, 6K))
    WVi = jnp.einsum("kmij,mjl->kmil", Wkm, Vinv)  # (K, M, 6, 3)
    S_off = jnp.einsum("kmil,nmjl->knij", WVi, Wkm)  # (K, K, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(K), jnp.arange(K)].add(U)
    rhs = bp - jnp.einsum("kmil,ml->ki", WVi, bx)  # (K, 6)

    # gauge fix: freeze pose block 0 + any invalid slots
    free = p.pose_mask & (jnp.arange(K) > 0)
    Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    free6 = jnp.repeat(free, 6)
    Sd = jnp.where(free6[:, None] & free6[None, :], Sd, 0.0)
    Sd = Sd + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs_d = jnp.where(free6, rhs.reshape(-1), 0.0)
    return Sd, rhs_d, free6, Vinv, Wkm, bx


@functools.partial(jax.jit, static_argnames=("slot", "huber_c"))
def pose_covariance(
    p: BaProblem, poses: SE3, points: jax.Array, slot: int, huber_c: float = 5.0
) -> jax.Array:
    """6x6 covariance of pose block `slot` at the solution, in the solver's
    right-multiplicative tangent frame (pose_new = pose . exp(d)), as the
    corresponding block of the reduced camera system's inverse. Unscaled —
    multiply by the residual variance estimate (reprojection residuals are
    in PIXELS, so the scale is physically calibrated, unlike the photometric
    A^-1 of the dense aligner)."""
    Sd, _, _, _, _, _ = _schur_dense(p, poses, points, jnp.asarray(1e-8, points.dtype), huber_c)
    e = jnp.zeros((Sd.shape[0], 6), Sd.dtype)
    e = e.at[slot * 6 : (slot + 1) * 6, :].set(jnp.eye(6, dtype=Sd.dtype))
    X = jnp.linalg.solve(Sd, e)  # (6K, 6)
    return X[slot * 6 : (slot + 1) * 6, :]


def _lm_step(p: BaProblem, poses: SE3, points: jax.Array, lam: jax.Array, huber_c: float):
    K = poses.t.shape[0]
    Sd, rhs_d, free6, Vinv, Wkm, bx = _schur_dense(p, poses, points, lam, huber_c)
    dp = jnp.linalg.solve(Sd, rhs_d).reshape(K, 6)
    dx = jnp.einsum("mij,mj->mi", Vinv, bx - jnp.einsum("kmil,ki->ml", Wkm, dp))
    dx = jnp.where(p.point_mask[:, None], dx, 0.0)

    poses_new = se3.compose(poses, se3.exp(dp))  # right-multiplicative update
    poses_new = se3.orthonormalize(poses_new)
    points_new = points + dx
    return poses_new, points_new


def solve_ba(
    p: BaProblem,
    max_iterations: int = 50,
    lambda0: float = 1e-4,
    min_step: float = 1e-10,
    huber_c: float = 5.0,
) -> Tuple[SE3, jax.Array, jax.Array, jax.Array]:
    """LM loop with accept/reject. Returns (poses, points, chi2_before,
    chi2_after) — errorBefore/After like the reference Results
    (BundleAdjustment.h:34-45)."""
    chi2_0 = _chi2(p, p.poses, p.points, huber_c)

    def body(carry):
        poses, points, chi2, lam, it, done = carry
        poses_new, points_new = _lm_step(p, poses, points, lam, huber_c)
        chi2_new = _chi2(p, poses_new, points_new, huber_c)
        finite = jnp.isfinite(chi2_new)
        accept = (chi2_new < chi2) & finite
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), poses_new, poses
        )
        points = jnp.where(accept, points_new, points)
        chi2_next = jnp.where(accept, chi2_new, chi2)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 5.0, 1e8))
        small = accept & (jnp.abs(chi2 - chi2_new) < min_step * jnp.maximum(chi2, 1.0))
        done = small | (lam >= 1e8)
        return poses, points, chi2_next, lam, it + 1, done

    def cond(carry):
        return (~carry[5]) & (carry[4] < max_iterations)

    dtype = p.points.dtype
    out = jax.lax.while_loop(
        cond,
        body,
        (p.poses, p.points, chi2_0, jnp.asarray(lambda0, dtype), jnp.asarray(0), jnp.asarray(False)),
    )
    return out[0], out[1], chi2_0, out[2]


_solve_ba_jit = jax.jit(solve_ba, static_argnames=("max_iterations", "huber_c"))


# chi2 inverse-CDF at 0.99 for 6 dof
_CHI2_6_99 = 16.81


def drift_significant(
    ba: "BundleAdjustment",
    est_pose: np.ndarray,
    corrected: np.ndarray,
    min_correction: float = 1e-3,
) -> bool:
    """True when BA's correction for the newest keyframe exceeds BA's own
    pose uncertainty (`ba.last_newest_cov`, the residual-variance-scaled
    Schur inverse block) — a statistically significant drift measurement,
    not solver jitter. Runs in BA's right-multiplicative tangent frame.
    Falls back to the absolute `min_correction` floor when no covariance is
    available."""
    from ..core import lie_np

    # right-multiplicative tangent: corrected = est . exp(d_r)
    d_r = lie_np.log(lie_np.inv(est_pose) @ corrected)
    cov = getattr(ba, "last_newest_cov", None)
    if cov is None or not np.all(np.isfinite(cov)):
        return bool(np.linalg.norm(d_r) >= min_correction)
    try:
        m2 = float(d_r @ np.linalg.solve(cov, d_r))
    except np.linalg.LinAlgError:
        return bool(np.linalg.norm(d_r) >= min_correction)
    return m2 > _CHI2_6_99 and np.linalg.norm(d_r) >= min_correction


class BundleAdjustment:
    """Host wrapper: pulls keyframes + landmarks from the Map, pads to static
    buckets, runs the jitted Schur-LM solve, returns updated poses/points
    keyed by id (the reference's Results::poses/positions,
    BundleAdjustment.h:34-45)."""

    def __init__(self, max_iterations: int = 50, compute_pose_covariance: bool = True):
        self.max_iterations = int(max_iterations)
        # 6x6 covariance (right-mult tangent, residual-variance scaled) of
        # the newest keyframe from the LAST optimize() call. The covariance
        # costs a second Schur assembly + a dense solve + a blocking fetch
        # per optimize(); its only consumer is the "gated" write-back policy,
        # so callers in "always"/"off" modes pass compute_pose_covariance=
        # False to keep it off the mapping backend's critical path.
        self.compute_pose_covariance = bool(compute_pose_covariance)
        self.last_newest_cov: Optional[np.ndarray] = None

    @staticmethod
    def _bucket(n: int, minimum: int = 8) -> int:
        from ..utils import pow2_bucket

        return pow2_bucket(n, minimum)

    def optimize(self, slam_map) -> Tuple[Dict[int, np.ndarray], Dict[int, np.ndarray], float, float]:
        kfs = slam_map.keyframes()
        if len(kfs) < 2:
            raise ValueError("BA needs at least 2 keyframes")
        cam = kfs[0].frame.cameras[0]
        kf_ids = [f.id for f in kfs]
        kf_index = {fid: i for i, fid in enumerate(kf_ids)}

        # collect observations from landmark bookkeeping
        obs = []  # (k, m, u, v, z)
        pts = []
        pt_index: Dict[int, int] = {}
        for lm in slam_map.points():
            rows = [
                (kf_index[fid], fi)
                for fid, fi in lm.observations.items()
                if fid in kf_index
            ]
            if len(rows) < 2:
                continue
            if lm.id not in pt_index:
                pt_index[lm.id] = len(pts)
                pts.append(lm.position)
            m = pt_index[lm.id]
            for k, fi in rows:
                uv = kfs[k].keypoints[fi]
                z = 0.0
                if kfs[k].kp_depth is not None and fi < len(kfs[k].kp_depth):
                    z = float(kfs[k].kp_depth[fi])
                obs.append((k, m, float(uv[0]), float(uv[1]), z))
        if len(obs) < 6:
            raise ValueError(f"BA needs more observations, have {len(obs)}")

        K = len(kfs)
        M = self._bucket(len(pts))
        O = self._bucket(len(obs), minimum=32)

        poses = SE3(
            jnp.asarray(np.stack([f.pose[:3, :3] for f in kfs]), jnp.float32),
            jnp.asarray(np.stack([f.pose[:3, 3] for f in kfs]), jnp.float32),
        )
        points = np.zeros((M, 3), np.float32)
        points[: len(pts)] = np.stack(pts)
        point_mask = np.zeros(M, bool)
        point_mask[: len(pts)] = True
        obs_arr = np.zeros((O, 5), np.float32)
        obs_mask = np.zeros(O, bool)
        obs_arr[: len(obs)] = np.asarray(obs, np.float32)
        obs_mask[: len(obs)] = True

        # gauge: fix the OLDEST keyframe (last in the deque ordering)
        order = np.arange(K)[::-1]  # oldest first
        inv_order = np.argsort(order)
        problem = BaProblem(
            poses=SE3(poses.R[jnp.asarray(order)], poses.t[jnp.asarray(order)]),
            pose_mask=jnp.ones(K, bool),
            points=jnp.asarray(points),
            point_mask=jnp.asarray(point_mask),
            obs_frame=jnp.asarray(inv_order[obs_arr[:, 0].astype(np.int32)], jnp.int32),
            obs_point=jnp.asarray(obs_arr[:, 1], jnp.int32),
            obs_uv=jnp.asarray(obs_arr[:, 2:4]),
            obs_mask=jnp.asarray(obs_mask),
            obs_z=jnp.asarray(obs_arr[:, 4]),
            fx=cam.fx.astype(jnp.float32),
            fy=cam.fy.astype(jnp.float32),
            cx=cam.cx.astype(jnp.float32),
            cy=cam.cy.astype(jnp.float32),
        )
        poses_out, points_out, err0, err1 = _solve_ba_jit(
            problem, max_iterations=self.max_iterations
        )

        # Dispatch EVERYTHING (solve + covariance + residual count) before
        # the single blocking fetch: jit calls are async, so the covariance
        # program queues right behind the solve and the whole optimize pays
        # exactly ONE host<->device round trip — the per-solve cost is
        # latency-bound on a remote-attached chip, not compute-bound.
        fetch = [poses_out.R, poses_out.t, points_out, err0, err1]
        if self.compute_pose_covariance:
            slot_newest = int(inv_order[0])
            cov = pose_covariance(problem, poses_out, points_out, slot_newest)
            n_eff = effective_residual_count(problem, poses_out, points_out)
            fetch += [cov, n_eff]
        got = jax.device_get(tuple(fetch))
        R_all, t_all, pts_all, err0, err1 = got[:5]

        # poses_out is in `order` space; map back to kf order
        pose_updates: Dict[int, np.ndarray] = {}
        R_all = np.asarray(R_all, np.float64)
        t_all = np.asarray(t_all, np.float64)
        for i, fid in enumerate(kf_ids):
            slot = int(inv_order[i])
            T = np.eye(4)
            u, _, vt = np.linalg.svd(R_all[slot])
            T[:3, :3] = u @ vt
            T[:3, 3] = t_all[slot]
            pose_updates[fid] = T
        pts_all = np.asarray(pts_all, np.float64)
        point_updates = {pid: pts_all[m] for pid, m in pt_index.items()}

        # 6x6 covariance of the NEWEST keyframe (kf_ids[0]) at the solution,
        # scaled by the residual-variance estimate (pixel units, so the
        # scale is physically meaningful). Consumers (the gated write-back
        # in sequential_mapping) use it to tell real drift from the BA
        # noise floor. Right-multiplicative tangent: pose_new = pose.exp(d).
        if self.compute_pose_covariance:
            cov_h, n_eff_h = got[5], got[6]
            dof = max(float(n_eff_h) - (6 * (K - 1) + 3 * len(pts)), 1.0)
            sigma2 = float(err1) / dof
            self.last_newest_cov = np.asarray(cov_h, np.float64) * sigma2
        else:
            self.last_newest_cov = None

        return pose_updates, point_updates, float(err0), float(err1)
