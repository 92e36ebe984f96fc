"""Dense projective ICP tests: synthetic translation/rotation recovery from
depth-only geometry (mirrors reference `test_odometry_icp.cpp` intent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.alignment.icp import IcpAligner, IcpConfig, align_icp
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.core.frame import create_frame
from vslam_tpu.core.se3 import SE3
from vslam_tpu.io import synthetic
from vslam_tpu.solvers import SolverConfig

H, W = 96, 128
FX = 110.0
K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)


def bumpy_scene():
    """Point-to-plane ICP needs >= 3 independent surface normals to constrain
    all translations (two planes leave the n1 x n2 direction free); composite
    three tilted planes."""
    return [
        synthetic.PlaneScene(normal=(0.35, 0.0, 1.0), d=2.0, seed=1),
        synthetic.PlaneScene(normal=(-0.3, 0.25, 1.0), d=1.6, seed=2),
        synthetic.PlaneScene(normal=(0.1, -0.4, 1.0), d=1.8, seed=3),
    ]


def render_composite(pose):
    i, d = None, None
    for s in bumpy_scene():
        ii, dd = synthetic.render(K, pose, (H, W), s)
        if d is None:
            i, d = ii, dd
        else:
            take = (dd > 0) & ((dd < d) | (d <= 0))  # nearer surface wins
            d = np.where(take, dd, d)
            i = np.where(take, ii, i)
    return i.astype(np.float32), d.astype(np.float32)


def make_frame(pose):
    i, d = render_composite(pose)
    return create_frame(jnp.asarray(i), jnp.asarray(d), CAM, n_levels=3)


@pytest.mark.parametrize("variant", ["point_to_plane", "point_to_point"])
@pytest.mark.parametrize("xi_true", [
    np.array([0.02, -0.01, 0.01, 0.0, 0.0, 0.0]),       # translation
    np.array([0.0, 0.0, 0.0, 0.008, -0.01, 0.006]),     # rotation
    np.array([0.015, 0.01, -0.01, 0.005, 0.006, -0.004]),  # both
])
def test_icp_recovery(xi_true, variant):
    pose_cur = lie_np.exp(xi_true)
    f_ref, f_cur = make_frame(np.eye(4)), make_frame(pose_cur)
    cfg = IcpConfig(solver=SolverConfig(max_iterations=30, min_step_size=1e-7), variant=variant)
    # point-to-point with projective association carries a known accuracy
    # handicap (association error does not cancel along the surface the way
    # the point-to-plane residual lets it); it is the baseline formulation
    # (PCL role), so it gets the looser budget
    budget = 0.012 if variant == "point_to_plane" else 0.03
    rel0 = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    rel, cov, ok = align_icp(f_ref, f_cur, rel0, cfg)
    assert bool(ok)
    T = np.eye(4)
    T[:3, :3] = np.asarray(rel.R, np.float64)
    T[:3, 3] = np.asarray(rel.t, np.float64)
    u, _, vt = np.linalg.svd(T[:3, :3])
    T[:3, :3] = u @ vt
    err = np.linalg.norm(lie_np.log(T) - xi_true)
    assert err < budget, f"icp error {err} for xi {xi_true}"


def test_icp_aligner_interface():
    xi = np.array([0.01, 0.0, 0.005, 0.0, 0.004, 0.0])
    pose_cur = lie_np.exp(xi)
    f_ref, f_cur = make_frame(np.eye(4)), make_frame(pose_cur)
    aligner = IcpAligner(IcpConfig(solver=SolverConfig(max_iterations=25, min_step_size=1e-7)))
    pose, cov, ok = aligner.align([f_ref], [np.eye(4)], f_cur, np.eye(4))
    assert ok
    err = np.linalg.norm(lie_np.log(lie_np.relative(pose, pose_cur)))
    assert err < 0.012, err
    assert cov.shape == (6, 6)


def test_normal_compatibility_gate_is_wired():
    """min_cos_normal must actually gate correspondences (it was previously
    declared but never applied): a strict-but-satisfiable threshold still
    converges on the composite plane scene (normals agree between views),
    while an impossible threshold (> 1) excludes every correspondence and
    the solver reports invalid."""
    xi_true = np.array([0.015, 0.01, -0.01, 0.005, 0.006, -0.004])
    pose_cur = lie_np.exp(xi_true)
    f_ref, f_cur = make_frame(np.eye(4)), make_frame(pose_cur)
    rel0 = SE3(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))

    strict = IcpConfig(
        solver=SolverConfig(max_iterations=30, min_step_size=1e-7),
        min_cos_normal=0.95,
    )
    rel, _, ok = align_icp(f_ref, f_cur, rel0, strict)
    assert bool(ok)
    T = np.eye(4)
    T[:3, :3] = np.asarray(rel.R, np.float64)
    T[:3, 3] = np.asarray(rel.t, np.float64)
    u, _, vt = np.linalg.svd(T[:3, :3])
    T[:3, :3] = u @ vt
    assert np.linalg.norm(lie_np.log(T) - xi_true) < 0.012

    impossible = IcpConfig(
        solver=SolverConfig(max_iterations=30, min_step_size=1e-7),
        min_cos_normal=1.5,
    )
    _, _, ok_none = align_icp(f_ref, f_cur, rel0, impossible)
    assert not bool(ok_none), "gate at cos>1 must exclude all correspondences"
