"""Pinhole camera model as a JAX pytree.

Mirrors the behavior of the reference `Camera` class
(reference `src/vslam/src/core/src/Camera.cpp:23-57`): projection returns an
invalid flag instead of NaN (TPU kernels prefer masks over NaN propagation,
but a NaN-compatible mode is available via `project`'s returned mask).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["Camera", "project", "backproject", "ray", "scale", "intrinsic_matrix"]


class Camera(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def create(fx, fy, cx, cy, dtype=jnp.float32) -> "Camera":
        return Camera(
            jnp.asarray(fx, dtype),
            jnp.asarray(fy, dtype),
            jnp.asarray(cx, dtype),
            jnp.asarray(cy, dtype),
        )


def project(cam: Camera, p: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Project camera-frame points ``p: (..., 3)`` to pixels.

    Returns ``(uv, valid)``; ``valid`` is False where ``z <= 0`` (the
    reference returns NaN there, `Camera.cpp:4-11`). The returned uv at
    invalid points is finite (z clamped) so downstream masking is safe.
    """
    z = p[..., 2]
    valid = z > 0
    z_safe = jnp.where(valid, z, 1.0)
    u = cam.fx * p[..., 0] / z_safe + cam.cx
    v = cam.fy * p[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1), valid


def backproject(cam: Camera, uv: jax.Array, z: jax.Array) -> jax.Array:
    """Reconstruct camera-frame points from pixels ``uv: (..., 2)`` and depth
    ``z: (...)`` (reference `Camera.cpp:13-16` image2camera)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def ray(cam: Camera, uv: jax.Array) -> jax.Array:
    """Unit-depth ray through pixel uv (reference image2ray)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def scale(cam: Camera, s: float) -> Camera:
    """Rescale intrinsics for a resized image (reference `Camera.cpp:34-38`
    multiplies fx, fy, cx, cy by s with no half-pixel correction)."""
    return Camera(cam.fx * s, cam.fy * s, cam.cx * s, cam.cy * s)


def intrinsic_matrix(cam: Camera) -> jax.Array:
    dtype = jnp.asarray(cam.fx).dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    return jnp.stack(
        [
            jnp.stack([cam.fx, zero, cam.cx]),
            jnp.stack([zero, cam.fy, cam.cy]),
            jnp.stack([zero, zero, one]),
        ]
    )
