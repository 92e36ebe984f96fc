"""vslam_tpu — a TPU-native visual-SLAM framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of phildue/vslam (direct
photometric RGB-D alignment, Gauss-Newton with robust losses, keyframe map,
feature tracking, windowed bundle adjustment, EKF motion models, TUM/KITTI
evaluation) designed for TPU: static shapes, dense masks instead of point
lists, fused residual/normal-equation kernels, `lax.while_loop` solvers, and
batched multi-sequence tracking via `vmap`/`shard_map` over device meshes.
"""

__version__ = "0.2.0"

import jax as _jax

# Visual odometry is numerically sensitive: SE(3) compositions and the 6x6
# normal-equation reductions must run in full f32, not the accelerator's
# default bf16 matmul path (3x3/Px6 matmuls here are bandwidth-bound, so
# HIGHEST costs nothing). Override locally with jax.default_matmul_precision
# if a future kernel wants bf16 throughput.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import core

__all__ = ["core"]
