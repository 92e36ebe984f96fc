"""Binary patch descriptors (BRIEF-256) extracted densely at given keypoints.

Role of cv::ORB::create()->compute in the reference
(FeatureTracking.cpp:121-135): a 256-bit binary descriptor per keypoint. We
use BRIEF-256 on the Gaussian-smoothed image with a fixed random test
pattern; descriptors are kept as (N, 256) float 0/1 vectors so descriptor
distances become one MXU matmul in the matcher (for binary vectors
L1(a, b) = |a| + |b| - 2 a.b). Orientation compensation (ORB's rBRIEF) is
omitted — keyframe-to-keyframe rotations in this pipeline are small; flagged
as a deviation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import image as img_ops

__all__ = ["brief_pattern", "extract_descriptors", "N_BITS", "PATCH"]

N_BITS = 256
PATCH = 24  # half-size of the sampling window


def brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) int offsets (x1, y1, x2, y2), Gaussian-distributed like the
    original BRIEF pattern, clipped to the patch."""
    rng = np.random.default_rng(seed)
    pts = np.clip(rng.normal(0, PATCH / 3.0, size=(N_BITS, 4)), -PATCH, PATCH)
    return np.round(pts).astype(np.int32)


_PATTERN = brief_pattern()


def extract_descriptors(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Descriptors for keypoints ``uv: (N, 2)`` (float pixel coords).

    Returns (N, 256) float32 of {0, 1}. Coordinates are clamped at borders;
    callers should detect with a border margin >= PATCH so no test sample is
    clamped (tracking passes border=PATCH to fast_grid_detect).
    """
    smooth = img_ops.gaussian_blur_3x3(img_ops.gaussian_blur_3x3(img))
    H, W = img.shape
    flat = smooth.reshape(-1)
    u = uv[:, 0].astype(jnp.int32)
    v = uv[:, 1].astype(jnp.int32)
    pat = jnp.asarray(_PATTERN)

    def sample(du, dv):
        uu = jnp.clip(u[:, None] + du[None, :], 0, W - 1)
        vv = jnp.clip(v[:, None] + dv[None, :], 0, H - 1)
        return jnp.take(flat, vv * W + uu)  # (N, 256)

    a = sample(pat[:, 0], pat[:, 1])
    b = sample(pat[:, 2], pat[:, 3])
    return (a < b).astype(jnp.float32)
