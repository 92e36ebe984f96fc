"""Frame: the central per-image data object, as a static-shape JAX pytree.

TPU-native rebuild of the reference `Frame` class
(reference `src/vslam/src/core/src/Frame.{h,cpp}`): intensity pyramid, depth
pyramid, per-level Sobel derivatives of the (Gaussian-blurred) intensity and
per-level intrinsics. Differences from the reference, by design:

- Object graph -> pytree of tuples (one entry per pyramid level, each with a
  static shape), so whole pipelines jit/vmap without retracing.
- uint8 images -> float (f32 on TPU) in [0, 255]; the pyramid therefore skips
  the reference's per-level integer rounding (cv::buildPyramid on CV_8U).
- The per-level point cloud (`Frame.cpp:233-253`) is recomputed on demand by
  the aligner (one cheap fused elementwise pass) instead of being stored.

Pyramid semantics follow `Frame.cpp:255-275`: intensity via repeated pyrDown;
depth via 3x3 invalid-masked median blur then bilinear x0.5 resize.
Derivative semantics follow `Frame.cpp:215-232`: 3x3 Gaussian blur then 3x3
Sobel per level.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import camera as cam_mod
from . import image as img_ops
from . import se3
from .camera import Camera
from .se3 import SE3

__all__ = ["Frame", "create_frame", "frame_pcl", "num_levels", "sensor_to_f32"]


def sensor_to_f32(intensity: jax.Array, depth: jax.Array, depth_scale: float = 1.0):
    """Native sensor dtype -> (f32 intensity, metric f32 depth), on device.

    u8 gray / u16 depth-count frames cross the host->device link raw (4x
    fewer bytes — the transport the reference's cv::IMREAD_GRAYSCALE / TUM
    depth PNGs actually carry) and convert here; float inputs pass through
    unchanged (already metric). This is the ONE definition of the conversion:
    both the hot fused step (aligner._build_align_jit) and the fallback /
    first-frame build (pipeline._build) call it, so the keyframe and current
    frames stay photometrically identical by construction.
    """
    if jnp.issubdtype(intensity.dtype, jnp.integer):
        intensity = intensity.astype(jnp.float32)
    if jnp.issubdtype(depth.dtype, jnp.integer):
        depth = depth.astype(jnp.float32) * jnp.float32(depth_scale)
    return intensity, depth


class Frame(NamedTuple):
    """Multi-level RGB-D frame. All leaves are jnp arrays; per-level data is
    stored as tuples indexed coarse..fine? No — level 0 is the finest (full
    resolution), matching the reference's indexing (`Frame::intensity(0)` is
    the input image)."""

    intensity: Tuple[jax.Array, ...]  # (H_l, W_l) float, [0, 255]
    depth: Tuple[jax.Array, ...]  # (H_l, W_l) float, metres; <=0 / nonfinite = invalid
    dIx: Tuple[jax.Array, ...]  # Sobel-x of blurred intensity
    dIy: Tuple[jax.Array, ...]
    cameras: Tuple[Camera, ...]
    pose: SE3  # world -> camera (reference Frame::pose convention)

    @property
    def n_levels(self) -> int:
        return len(self.intensity)

    def width(self, level: int = 0) -> int:
        return self.intensity[level].shape[-1]

    def height(self, level: int = 0) -> int:
        return self.intensity[level].shape[-2]


def num_levels(frame: Frame) -> int:
    return len(frame.intensity)


def create_frame(
    intensity: jax.Array,
    depth: jax.Array,
    camera: Camera,
    n_levels: int = 3,
    pose: Optional[SE3] = None,
) -> Frame:
    """Build the pyramid frame from a full-resolution intensity + depth pair.

    `n_levels` is static. Level scale factor is 0.5 per level (the reference's
    canonical config `config/NodeMapping.yaml:14-15` uses [1.0, 0.5, 0.25]).
    """
    intensity = jnp.asarray(intensity)
    depth = jnp.asarray(depth)
    dtype = intensity.dtype
    if pose is None:
        pose = se3.identity(dtype=dtype)

    # depth: NaN -> 0 at ingest (reference NodeMapping.cpp createFrame and
    # utils::loadDepth both map non-finite depth to 0)
    depth = jnp.where(jnp.isfinite(depth), depth, jnp.zeros_like(depth))

    intensities = [intensity]
    depths = [depth]
    cams = [camera]
    for lvl in range(1, n_levels):
        intensities.append(img_ops.pyr_down(intensities[-1]))
        d_prev = depths[-1]
        d_blur = img_ops.median_blur_3x3_masked(d_prev, d_prev <= 0.0)
        # decimate on pyrDown's grid (even indices -> ceil(n/2) per dim) so
        # depth levels share the intensity levels' shape for ODD sizes too
        # (KITTI 1241x376); identical to resize_bilinear(., 0.5) on even dims
        depths.append(d_blur[::2, ::2])
        cams.append(cam_mod.scale(camera, 0.5**lvl))

    dIx = []
    dIy = []
    for lvl in range(n_levels):
        blurred = img_ops.gaussian_blur_3x3(intensities[lvl])
        dIx.append(img_ops.sobel_x(blurred))
        dIy.append(img_ops.sobel_y(blurred))

    return Frame(
        intensity=tuple(intensities),
        depth=tuple(depths),
        dIx=tuple(dIx),
        dIy=tuple(dIy),
        cameras=tuple(cams),
        pose=pose,
    )


def frame_pcl(frame: Frame, level: int) -> Tuple[jax.Array, jax.Array]:
    """Dense camera-frame point cloud for a pyramid level.

    Returns ``(points (H, W, 3), valid (H, W))``; invalid pixels get the zero
    point, matching reference `Frame::computePcl` (`Frame.cpp:233-253`).
    """
    d = frame.depth[level]
    H, W = d.shape
    valid = jnp.isfinite(d) & (d > 0.0)
    ys = jnp.broadcast_to(jnp.arange(H, dtype=d.dtype)[:, None], (H, W))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=d.dtype)[None, :], (H, W))
    uv = jnp.stack([xs, ys], axis=-1)
    pts = cam_mod.backproject(frame.cameras[level], uv, jnp.where(valid, d, 0.0))
    return jnp.where(valid[..., None], pts, jnp.zeros_like(pts)), valid
