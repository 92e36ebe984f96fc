"""Forward-additive SE(3) aligner: synthetic-warp recovery + consistency with
the inverse-compositional production aligner (the role the reference's
RgbdAlignmentOpenCv baseline played, RgbdAlignmentOpenCv.cpp:42-59)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.alignment.fa_se3 import FaAlignmentConfig, RgbdAlignerFa, align_fa
from vslam_tpu.alignment.aligner import RgbdAligner
from vslam_tpu.alignment.ic import AlignmentConfig
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.core.frame import create_frame
from vslam_tpu.core.se3 import SE3
from vslam_tpu.io import synthetic
from vslam_tpu.solvers import SolverConfig

H, W, FX = 96, 128, 110.0
K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)

FA_CFG = FaAlignmentConfig(
    min_gradient=10.0,
    solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
)


def _pair(xi, seed=0):
    scene = synthetic.default_scene(seed=seed)
    i0, d0 = synthetic.render(K, np.eye(4), (H, W), scene)
    i1, d1 = synthetic.render(K, lie_np.exp(xi), (H, W), scene)
    f0 = create_frame(jnp.asarray(i0), jnp.asarray(d0), CAM, n_levels=3)
    f1 = create_frame(jnp.asarray(i1), jnp.asarray(d1), CAM, n_levels=3)
    return f0, f1


def _err(rel, xi):
    T = np.eye(4)
    u, _, vt = np.linalg.svd(np.asarray(rel.R, np.float64))
    T[:3, :3] = u @ vt
    T[:3, 3] = np.asarray(rel.t)
    return np.linalg.norm(lie_np.log(T) - xi)


@pytest.mark.parametrize("seed", [0, 1])
def test_fa_recovers_synthetic_warp(seed):
    xi = np.array([0.02, -0.01, 0.015, 0.008, -0.006, 0.004]) * (1 + seed)
    f0, f1 = _pair(xi, seed)
    rel0 = SE3(jnp.eye(3), jnp.zeros(3))
    rel, cov, ok = align_fa(f0, f1, rel0, FA_CFG)
    assert bool(ok)
    assert _err(rel, xi) < 0.01
    assert cov.shape == (6, 6)


def test_fa_matches_ic_baseline():
    """Two independent formulations (FA rebuilds J from the current image
    each iteration; IC precomputes from the template) must land on the same
    pose — the dual-aligner cross-check."""
    xi = np.array([0.015, 0.01, -0.012, -0.005, 0.007, 0.003])
    f0, f1 = _pair(xi, seed=2)

    fa = RgbdAlignerFa(FA_CFG)
    ic = RgbdAligner(
        AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=False,
        )
    )
    pose_fa, cov_fa, ok_fa = fa.align([f0], [np.eye(4)], f1, np.eye(4))
    pose_ic, cov_ic, ok_ic = ic.align([f0], [np.eye(4)], f1, np.eye(4))
    assert ok_fa and ok_ic
    d = np.linalg.norm(lie_np.log(lie_np.relative(pose_fa, pose_ic)))
    assert d < 2e-3, f"FA/IC disagreement {d}"
