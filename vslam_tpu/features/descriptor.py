"""Binary patch descriptors (rotation-aware BRIEF-256 = rBRIEF/ORB-style).

Role of cv::ORB::create()->compute in the reference
(FeatureTracking.cpp:121-135): a 256-bit binary descriptor per keypoint.
BRIEF-256 on the Gaussian-smoothed image with a fixed random test pattern;
descriptors are kept as (N, 256) float 0/1 vectors so descriptor distances
become one MXU matmul in the matcher (for binary vectors
L1(a, b) = |a| + |b| - 2 a.b).

Orientation compensation follows ORB (Rublee et al. 2011): each keypoint's
orientation is the intensity-centroid angle over a radius-15 circular patch
(theta = atan2(m01, m10)), and the BRIEF test pattern is steered by that
angle before sampling. All of it is batched gathers + elementwise trig — no
per-keypoint host loops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import image as img_ops

__all__ = [
    "brief_pattern",
    "keypoint_orientations",
    "extract_descriptors",
    "pack_bits",
    "unpack_bits",
    "as_float_bits",
    "N_BITS",
    "N_BYTES",
    "PATCH",
    "ORI_RADIUS",
]

N_BITS = 256
N_BYTES = N_BITS // 8  # packed transport width (cv::ORB's own 32-byte rows)
PATCH = 24  # half-size of the sampling window
ORI_RADIUS = 15  # intensity-centroid radius (ORB uses a 31x31 patch)


def pack_bits(desc: jax.Array) -> jax.Array:
    """(N, 256) float/bool bit vectors -> (N, 32) uint8, MSB-first per byte
    (np.unpackbits order). Descriptors cross the host<->device link packed —
    32x fewer bytes; the reference's cv::Mat descriptors are byte-packed for
    the same reason (FeatureTracking.cpp:121-135)."""
    bits = (desc > 0.5).astype(jnp.uint8).reshape(desc.shape[0], N_BYTES, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(N, 32) uint8 -> (N, 256) float32 of {0, 1} (inverse of pack_bits);
    jit-safe, used inside matchers so the MXU L1 matmul sees bit vectors."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[0], N_BITS).astype(jnp.float32)


def as_float_bits(desc: np.ndarray) -> np.ndarray:
    """Host-side normalization to (N, 256) f32 bit vectors from either
    representation: packed (N, 32) uint8 or already-unpacked 0/1 floats."""
    desc = np.asarray(desc)
    if desc.dtype == np.uint8 and desc.shape[-1] == N_BYTES:
        return np.unpackbits(desc, axis=-1).astype(np.float32)
    return desc.astype(np.float32)


def brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) int offsets (x1, y1, x2, y2), Gaussian-distributed like the
    original BRIEF pattern, clipped to the patch."""
    rng = np.random.default_rng(seed)
    pts = np.clip(rng.normal(0, PATCH / 3.0, size=(N_BITS, 4)), -PATCH, PATCH)
    return np.round(pts).astype(np.int32)


_PATTERN = brief_pattern()

# circular-mask offset table for the orientation moments, built once
_YX = np.mgrid[-ORI_RADIUS : ORI_RADIUS + 1, -ORI_RADIUS : ORI_RADIUS + 1]
_CIRC = (_YX[0] ** 2 + _YX[1] ** 2) <= ORI_RADIUS**2
_ORI_DY = _YX[0][_CIRC].astype(np.int32)  # (M,)
_ORI_DX = _YX[1][_CIRC].astype(np.int32)


def keypoint_orientations(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Intensity-centroid orientation per keypoint (ORB §3.2).

    ``uv: (N, 2)`` float pixel coords -> (N,) angles in radians,
    theta = atan2(m01, m10) with moments over the radius-15 disc.
    """
    H, W = img.shape
    flat = img.reshape(-1)
    u = uv[:, 0].astype(jnp.int32)
    v = uv[:, 1].astype(jnp.int32)
    dy = jnp.asarray(_ORI_DY)
    dx = jnp.asarray(_ORI_DX)
    uu = jnp.clip(u[:, None] + dx[None, :], 0, W - 1)
    vv = jnp.clip(v[:, None] + dy[None, :], 0, H - 1)
    patch = jnp.take(flat, vv * W + uu)  # (N, M)
    m10 = jnp.sum(patch * dx[None, :].astype(patch.dtype), axis=1)
    m01 = jnp.sum(patch * dy[None, :].astype(patch.dtype), axis=1)
    return jnp.arctan2(m01, m10)


def extract_descriptors(
    img: jax.Array, uv: jax.Array, oriented: bool = True
) -> jax.Array:
    """Descriptors for keypoints ``uv: (N, 2)`` (float pixel coords).

    Returns (N, 256) float32 of {0, 1}. With ``oriented`` (default) the test
    pattern is rotated per keypoint by the intensity-centroid angle (steered
    BRIEF); rotated offsets are re-clipped to the +-PATCH window. Coordinates
    are clamped at borders; callers should detect with a border margin
    >= PATCH so no test sample is clamped (tracking passes border=PATCH to
    fast_grid_detect).
    """
    smooth = img_ops.gaussian_blur_3x3(img_ops.gaussian_blur_3x3(img))
    H, W = img.shape
    flat = smooth.reshape(-1)
    u = uv[:, 0].astype(jnp.int32)
    v = uv[:, 1].astype(jnp.int32)
    pat = jnp.asarray(_PATTERN)

    if oriented:
        theta = keypoint_orientations(smooth, uv)  # (N,)
        c = jnp.cos(theta)[:, None]
        s = jnp.sin(theta)[:, None]

        def rot(px, py):
            # (N, 256) steered offsets, rounded and re-clipped to the patch
            fx = px[None, :].astype(jnp.float32)
            fy = py[None, :].astype(jnp.float32)
            rx = jnp.round(c * fx - s * fy).astype(jnp.int32)
            ry = jnp.round(s * fx + c * fy).astype(jnp.int32)
            return (
                jnp.clip(rx, -PATCH, PATCH),
                jnp.clip(ry, -PATCH, PATCH),
            )

        dx1, dy1 = rot(pat[:, 0], pat[:, 1])
        dx2, dy2 = rot(pat[:, 2], pat[:, 3])
    else:
        dx1, dy1 = pat[None, :, 0], pat[None, :, 1]
        dx2, dy2 = pat[None, :, 2], pat[None, :, 3]

    def sample(du, dv):
        uu = jnp.clip(u[:, None] + du, 0, W - 1)
        vv = jnp.clip(v[:, None] + dv, 0, H - 1)
        return jnp.take(flat, vv * W + uu)  # (N, 256)

    a = sample(dx1, dy1)
    b = sample(dx2, dy2)
    return (a < b).astype(jnp.float32)
