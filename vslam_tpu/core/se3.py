"""SE(3) / SO(3) Lie-group operations in pure JAX.

TPU-native replacement for the reference's use of Sophus::SE3d
(see reference `src/vslam/src/core/src/types.h:38`, usage throughout
`lukas_kanade/src/Warp.cpp` and `odometry/`). Tangent-vector ordering follows
the Sophus convention the reference relies on: ``xi = [rho; phi]`` with the
translational part first and the rotational part last (this matches the
2x6 projection Jacobian layout in reference `Warp.cpp:166-201`).

Design notes (TPU-first):
- Transforms are plain pytrees ``(R, t)`` with ``R: (..., 3, 3)`` and
  ``t: (..., 3)``; every function broadcasts over leading batch axes so the
  whole module is `vmap`/`scan`/`while_loop`-friendly.
- No data-dependent branching: small-angle switches use `jnp.where` with
  numerically safe operands so the functions are jit-safe and differentiable.
- dtype-polymorphic: computations stay in the dtype of the inputs (f32 on
  TPU, f64 on CPU test meshes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "SE3",
    "identity",
    "from_matrix",
    "to_matrix",
    "compose",
    "inverse",
    "transform_points",
    "so3_hat",
    "so3_vee",
    "so3_exp",
    "so3_log",
    "exp",
    "log",
    "adjoint",
    "orthonormalize",
    "relative",
]


class SE3(NamedTuple):
    """Rigid transform as rotation matrix + translation (pytree)."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    @property
    def dtype(self):
        return self.R.dtype

    def __matmul__(self, other: "SE3") -> "SE3":
        return compose(self, other)


def identity(dtype=jnp.float32, batch_shape=()) -> SE3:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return SE3(R, t)


def from_matrix(T: jax.Array) -> SE3:
    """Build from a (..., 4, 4) homogeneous matrix."""
    return SE3(T[..., :3, :3], T[..., :3, 3])


def to_matrix(g: SE3) -> jax.Array:
    batch = g.t.shape[:-1]
    T = jnp.zeros((*batch, 4, 4), dtype=g.dtype)
    T = T.at[..., :3, :3].set(g.R)
    T = T.at[..., :3, 3].set(g.t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def compose(a: SE3, b: SE3) -> SE3:
    """a . b — apply b first, then a."""
    R = a.R @ b.R
    t = jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return SE3(R, t)


def inverse(g: SE3) -> SE3:
    Rt = jnp.swapaxes(g.R, -1, -2)
    return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, g.t))


def transform_points(g: SE3, p: jax.Array) -> jax.Array:
    """Apply the transform to points ``p: (..., 3)``.

    Batch axes of ``g`` must broadcast against the leading axes of ``p``.
    """
    return jnp.einsum("...ij,...j->...i", g.R, p) + g.t


def relative(ref: SE3, cur: SE3) -> SE3:
    """T_cur_ref = cur . ref^-1 (reference `algorithm.cpp:82-85`
    computeRelativeTransform)."""
    return compose(cur, inverse(ref))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def so3_hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of ``w: (..., 3)``."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    rows = [
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def so3_vee(W: jax.Array) -> jax.Array:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) computed
    safely for small angles via Taylor expansion.

    ``theta2`` is the squared angle; using it directly avoids a sqrt of a
    potentially-zero value in gradients.
    """
    theta2_safe = jnp.maximum(theta2, 1e-24)
    theta = jnp.sqrt(theta2_safe)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta))
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula, Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map of SO(3), robust near theta = 0 and theta = pi.

    theta comes from atan2(|vee|/2, (tr-1)/2) rather than arccos — arccos
    has an infinite derivative at 1, which poisons jacfwd/jacrev through
    near-identity rotations (pose-graph Jacobians hit this)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    vee = so3_vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sin2 = jnp.sum(vee * vee, axis=-1) * 0.25
    sin_theta = jnp.sqrt(jnp.maximum(sin2, 1e-30))
    theta = jnp.arctan2(sin_theta, cos_theta)
    theta2 = theta * theta

    # Generic / small-angle branch: w = theta/(2 sin theta) * vee(R - R^T).
    # factor = theta / (2 sin theta); Taylor: 1/2 + theta^2/12 + ...
    small = theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta2 / 12.0,
        theta / jnp.maximum(2.0 * sin_theta, 1e-24),
    )
    w_generic = factor[..., None] * vee

    # Near-pi branch: axis from the diagonal of (R + I) / 2 = aa^T(1-cos)+...
    # R + I ≈ 2 aa^T at theta = pi; take sqrt of diagonal, fix signs from
    # off-diagonal terms relative to the largest diagonal element.
    Rp = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    cols = jnp.take_along_axis(Rp, k[..., None, None], axis=-1)[..., 0]  # (...,3)
    cols_norm = jnp.sqrt(jnp.maximum(jnp.sum(cols * cols, axis=-1, keepdims=True), 1e-24))
    axis = cols / cols_norm
    w_pi = axis * theta[..., None]
    # Match sign with vee(R - R^T) when it is not degenerate.
    sign = jnp.where(jnp.sum(vee * w_pi, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = w_pi * sign

    near_pi = theta > (jnp.pi - 1e-3)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def exp(xi: jax.Array) -> SE3:
    """Exponential map. ``xi = [rho(3); phi(3)]`` (translation first)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = so3_hat(phi)
    W2 = W @ W
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return SE3(R, t)


def log(g: SE3) -> jax.Array:
    """Logarithm map; returns ``xi = [rho; phi]``."""
    phi = so3_log(g.R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta2_safe = jnp.maximum(theta2, 1e-24)
    theta = jnp.sqrt(theta2_safe)
    # D = (1 - theta sin / (2 (1 - cos))) / theta^2,  Taylor 1/12 + theta^2/720
    half = 0.5 * theta
    small = theta2 < 1e-8
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-24))
        / theta2_safe,
    )
    W = so3_hat(phi)
    W2 = W @ W
    eye = jnp.eye(3, dtype=phi.dtype)
    Vinv = eye - 0.5 * W + cot_term[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, g.t)
    return jnp.concatenate([rho, phi], axis=-1)


def adjoint(g: SE3) -> jax.Array:
    """6x6 adjoint matrix mapping tangent vectors between frames
    (ordering [rho; phi], matching reference `EKFConstantVelocitySE3.cpp:66-79`)."""
    batch = g.t.shape[:-1]
    A = jnp.zeros((*batch, 6, 6), dtype=g.dtype)
    tx = so3_hat(g.t)
    A = A.at[..., :3, :3].set(g.R)
    A = A.at[..., :3, 3:].set(tx @ g.R)
    A = A.at[..., 3:, 3:].set(g.R)
    return A


def orthonormalize(g: SE3) -> SE3:
    """Project R back onto SO(3) via Gram-Schmidt; cheap drift control for
    long compositional update chains inside `lax.while_loop`."""
    r0 = g.R[..., :, 0]
    r1 = g.R[..., :, 1]
    x = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-24)
    z = jnp.cross(x, r1)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-24)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-1)
    return SE3(R, g.t)
