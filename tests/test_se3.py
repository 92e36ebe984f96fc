"""SE(3)/SO(3) unit tests against scipy closed forms.

Mirrors the numeric expectations the reference gets from Sophus (tangent
ordering [rho; phi], exp/log roundtrips, adjoint, relative transforms).
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)
from scipy.spatial.transform import Rotation

from vslam_tpu.core import se3


def random_xi(rng, scale_t=1.0, scale_r=1.0):
    xi = np.zeros(6)
    xi[:3] = rng.normal(size=3) * scale_t
    xi[3:] = rng.normal(size=3)
    xi[3:] *= scale_r / max(np.linalg.norm(xi[3:]), 1e-12) * rng.uniform(0.1, 1.0)
    return xi


def test_so3_exp_matches_scipy(rng):
    for _ in range(20):
        w = rng.normal(size=3)
        R = np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    for scale in [1e-6, 1e-3, 0.5, 2.0, 3.1]:
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * scale
        R = Rotation.from_rotvec(w).as_matrix()
        w_rec = np.asarray(se3.so3_log(jnp.asarray(R, jnp.float32)))
        np.testing.assert_allclose(w_rec, w, atol=5e-4 if scale > 3 else 1e-5)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = random_xi(rng)
        g = se3.exp(jnp.asarray(xi, jnp.float32))
        xi_rec = np.asarray(se3.log(g))
        np.testing.assert_allclose(xi_rec, xi, atol=2e-5)


def test_se3_exp_zero_is_identity():
    g = se3.exp(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(g.R), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(g.t), 0.0, atol=1e-7)


def test_compose_inverse(rng):
    xi1, xi2 = random_xi(rng), random_xi(rng)
    a, b = se3.exp(jnp.asarray(xi1, jnp.float32)), se3.exp(jnp.asarray(xi2, jnp.float32))
    ab = se3.compose(a, b)
    ident = se3.compose(ab, se3.inverse(ab))
    np.testing.assert_allclose(np.asarray(ident.R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-5)


def test_relative_transform(rng):
    """computeRelativeTransform(t0, t1) = t1 * t0^-1 (algorithm.cpp:82-85)."""
    t0 = se3.exp(jnp.asarray(random_xi(rng), jnp.float32))
    t1 = se3.exp(jnp.asarray(random_xi(rng), jnp.float32))
    rel = se3.relative(t0, t1)
    t1_rec = se3.compose(rel, t0)
    np.testing.assert_allclose(np.asarray(t1_rec.R), np.asarray(t1.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1_rec.t), np.asarray(t1.t), atol=1e-5)


def test_transform_points(rng):
    xi = random_xi(rng)
    g = se3.exp(jnp.asarray(xi, jnp.float32))
    p = rng.normal(size=(10, 3)).astype(np.float32)
    q = np.asarray(se3.transform_points(g, jnp.asarray(p)))
    q_ref = p @ np.asarray(g.R).T + np.asarray(g.t)
    np.testing.assert_allclose(q, q_ref, atol=1e-5)


def test_adjoint_property(rng):
    """Ad_g satisfies g * exp(xi) * g^-1 = exp(Ad_g xi)."""
    g = se3.exp(jnp.asarray(random_xi(rng), jnp.float32))
    xi = random_xi(rng) * 0.1
    lhs = se3.compose(se3.compose(g, se3.exp(jnp.asarray(xi, jnp.float32))), se3.inverse(g))
    adj = np.asarray(se3.adjoint(g))
    rhs = se3.exp(jnp.asarray(adj @ xi, jnp.float32))
    np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t), atol=1e-4)


def test_batched_ops(rng):
    xis = np.stack([random_xi(rng) for _ in range(5)]).astype(np.float32)
    g = se3.exp(jnp.asarray(xis))
    assert g.R.shape == (5, 3, 3)
    logs = np.asarray(se3.log(g))
    np.testing.assert_allclose(logs, xis, atol=2e-5)


def test_orthonormalize(rng):
    g = se3.exp(jnp.asarray(random_xi(rng), jnp.float32))
    R_noisy = np.asarray(g.R) + rng.normal(size=(3, 3)) * 1e-4
    g2 = se3.orthonormalize(se3.SE3(jnp.asarray(R_noisy, jnp.float32), g.t))
    RtR = np.asarray(g2.R).T @ np.asarray(g2.R)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)


def test_pose_with_covariance_composition():
    """Reference PoseWithCovariance algebra (PoseWithCovariance.cpp:19-28):
    composition rotates the covariance block-diagonally; the adjoint variant
    adds the translation-rotation lever-arm coupling."""
    import numpy as np
    import jax.numpy as jnp
    from vslam_tpu.core import lie_np, pose_cov, se3
    from vslam_tpu.core.se3 import SE3

    rng = np.random.default_rng(3)
    T1 = lie_np.exp(rng.normal(0, 0.3, 6))
    T0 = lie_np.exp(rng.normal(0, 0.3, 6))
    C0 = rng.normal(size=(6, 6)); C0 = (C0 @ C0.T / 10 + np.eye(6)).astype(np.float32)

    p1 = SE3(jnp.asarray(T1[:3, :3], jnp.float32), jnp.asarray(T1[:3, 3], jnp.float32))
    p0 = pose_cov.PoseWithCovariance(
        SE3(jnp.asarray(T0[:3, :3], jnp.float32), jnp.asarray(T0[:3, 3], jnp.float32)),
        jnp.asarray(C0),
    )

    out = pose_cov.compose(p1, p0)
    # pose composes exactly
    Tc = np.asarray(jnp.block([[out.pose.R, out.pose.t[:, None]], [jnp.zeros((1, 3)), jnp.ones((1, 1))]]))
    np.testing.assert_allclose(Tc, T1 @ T0, atol=1e-5)
    # covariance: R6 C R6^T with R6 = diag(R, R)
    R6 = np.zeros((6, 6), np.float32)
    R6[:3, :3] = T1[:3, :3]; R6[3:, 3:] = T1[:3, :3]
    np.testing.assert_allclose(np.asarray(out.cov), R6 @ C0 @ R6.T, atol=1e-4)
    # still symmetric PSD
    ev = np.linalg.eigvalsh(np.asarray(out.cov, np.float64))
    assert ev.min() > 0

    # adjoint transport equals Ad C Ad^T and differs from rotation-only
    out_adj = pose_cov.compose_adjoint(p1, p0)
    Ad = np.asarray(se3.adjoint(p1))
    np.testing.assert_allclose(np.asarray(out_adj.cov), Ad @ C0 @ Ad.T, atol=1e-3)
    assert not np.allclose(np.asarray(out_adj.cov), np.asarray(out.cov), atol=1e-3)

    # mean/inverse mirror the reference accessors
    np.testing.assert_allclose(np.asarray(p0.mean()), lie_np.log(T0), atol=1e-5)
    inv = p0.inverse()
    np.testing.assert_allclose(np.asarray(inv.cov), C0)
