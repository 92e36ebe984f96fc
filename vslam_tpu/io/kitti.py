"""KITTI odometry dataset reader with TPU-computed stereo depth.

The reference lists KITTI as a target benchmark (`README.md:14`) but ships no
reader; this one covers the depth-from-stereo path called out in
BASELINE.json's configs. Disparity is estimated on-device with a classic
block-matching cost volume expressed TPU-natively: D candidate disparities =
D static shifts of the right image (pure VPU work, no gathers), SAD costs
box-filtered separably, argmin + parabolic sub-pixel refinement + left-right
consistency gating. depth = fx * baseline / disparity.

Directory layout (KITTI odometry):
  <root>/sequences/<seq>/image_0/*.png   left gray
  <root>/sequences/<seq>/image_1/*.png   right gray
  <root>/sequences/<seq>/calib.txt       P0..P3 projection matrices
  <root>/sequences/<seq>/times.txt
  <root>/poses/<seq>.txt                 ground truth (3x4 cam0->world)
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import image as img_ops

__all__ = ["KittiDataset", "stereo_depth", "block_matching_disparity"]


@functools.partial(jax.jit, static_argnames=("max_disparity", "block", "lr_check"))
def block_matching_disparity(
    left: jax.Array,
    right: jax.Array,
    max_disparity: int = 96,
    block: int = 9,
    lr_check: bool = True,
    uniqueness: float = 0.98,
) -> jax.Array:
    """Sub-pixel disparity map (H, W); 0 marks invalid/unmatched pixels."""
    H, W = left.shape
    dtype = left.dtype

    kernel = (1.0 / block,) * block  # compile-time taps (see _sep_conv_reflect)

    def box(x):
        return img_ops._sep_conv_reflect(x, kernel, kernel)

    # cost volume via static shifts: cost_d = box(|L(x) - R(x - d)|)
    costs = []
    big = jnp.asarray(1e9, dtype)
    for d in range(max_disparity):
        shifted = jnp.pad(right, ((0, 0), (d, 0)))[:, :W] if d > 0 else right
        c = box(jnp.abs(left - shifted))
        if d > 0:
            xx = jnp.arange(W)[None, :]
            c = jnp.where(xx >= d, c, big)  # no right-image support
        costs.append(c)
    cv = jnp.stack(costs, axis=-1)  # (H, W, D)

    d_best = jnp.argmin(cv, axis=-1)
    c_best = jnp.take_along_axis(cv, d_best[..., None], axis=-1)[..., 0]

    # parabolic sub-pixel refinement on (c[-1], c[0], c[+1])
    d_m = jnp.clip(d_best - 1, 0, max_disparity - 1)
    d_p = jnp.clip(d_best + 1, 0, max_disparity - 1)
    c_m = jnp.take_along_axis(cv, d_m[..., None], axis=-1)[..., 0]
    c_p = jnp.take_along_axis(cv, d_p[..., None], axis=-1)[..., 0]
    denom = c_m - 2 * c_best + c_p
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c_m - c_p) / jnp.maximum(denom, 1e-6), 0.0)
    disp = d_best.astype(dtype) + jnp.clip(delta, -0.5, 0.5)

    # uniqueness: best cost must beat the runner-up (outside +-1) clearly —
    # one broadcast exclusion mask (|d - d_best| <= 1), single pass over cv
    dgrid = jnp.arange(max_disparity)[None, None, :]
    excl = jnp.abs(dgrid - d_best[..., None]) <= 1
    c_second = jnp.min(jnp.where(excl, big, cv), axis=-1)
    unique = c_best <= uniqueness * c_second

    valid = (d_best > 0) & (d_best < max_disparity - 1) & unique & (c_best < big)

    if lr_check:
        # right-image cost volume is a per-slice shift of the left one:
        #   cost_r(x, d) = box(|R(x) - L(x+d)|) = cost_l(x+d, d)
        # (substitute y = x+d inside the box window), so the L-R gate reuses
        # `costs` instead of filtering another D slices. Only within
        # block//2 of the image border does reflect padding break the
        # identity — absorbed by the +-1 gate tolerance.
        costs_r = []
        for d in range(max_disparity):
            if d > 0:
                c = jnp.concatenate(
                    [costs[d][:, d:], jnp.full((H, d), big, dtype)], axis=1
                )
            else:
                c = costs[d]
            costs_r.append(c)
        cv_r = jnp.stack(costs_r, axis=-1)
        d_right = jnp.argmin(cv_r, axis=-1)
        # disparity at the matched right-image column must agree
        xx = jnp.arange(W)[None, :]
        x_r = jnp.clip(xx - d_best, 0, W - 1)
        d_r_at = jnp.take_along_axis(d_right, x_r, axis=1)
        valid = valid & (jnp.abs(d_r_at - d_best) <= 1)

    return jnp.where(valid, disp, jnp.zeros_like(disp))


def stereo_depth(
    left: jax.Array, right: jax.Array, fx: float, baseline: float, **kw
) -> jax.Array:
    disp = block_matching_disparity(left, right, **kw)
    return jnp.where(disp > 0.5, fx * baseline / jnp.maximum(disp, 0.5), 0.0)


def _load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32)


def _load_png_u8(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.uint8)


class KittiDataset:
    """Iterates (t_ns, gray_left f32, depth f32[m]) over a KITTI odometry
    sequence; depth from on-device stereo block matching."""

    def __init__(
        self,
        root: str,
        sequence: str = "00",
        max_frames: Optional[int] = None,
        max_disparity: int = 96,
    ):
        self.root = root
        self.seq_dir = os.path.join(root, "sequences", sequence)
        left_dir = os.path.join(self.seq_dir, "image_0")
        self.left_files = sorted(
            os.path.join(left_dir, f) for f in os.listdir(left_dir) if f.endswith(".png")
        )
        right_dir = os.path.join(self.seq_dir, "image_1")
        self.right_files = sorted(
            os.path.join(right_dir, f) for f in os.listdir(right_dir) if f.endswith(".png")
        )
        if max_frames:
            self.left_files = self.left_files[:max_frames]
            self.right_files = self.right_files[:max_frames]
        self.times = self._load_times(os.path.join(self.seq_dir, "times.txt"))
        self.fx, self.fy, self.cx, self.cy, self.baseline = self._load_calib(
            os.path.join(self.seq_dir, "calib.txt")
        )
        self.max_disparity = max_disparity
        gt_path = os.path.join(root, "poses", f"{sequence}.txt")
        self.groundtruth = self._load_poses(gt_path) if os.path.exists(gt_path) else {}

    @staticmethod
    def _load_times(path: str):
        with open(path) as f:
            return [float(line.strip()) for line in f if line.strip()]

    @staticmethod
    def _load_calib(path: str):
        P = {}
        with open(path) as f:
            for line in f:
                if ":" in line:
                    k, v = line.split(":", 1)
                    P[k.strip()] = np.fromstring(v, sep=" ").reshape(3, 4)
        p0, p1 = P["P0"], P["P1"]
        fx, fy, cx, cy = p0[0, 0], p0[1, 1], p0[0, 2], p0[1, 2]
        baseline = -p1[0, 3] / p1[0, 0]
        return float(fx), float(fy), float(cx), float(cy), float(baseline)

    def _load_poses(self, path: str) -> Dict[float, np.ndarray]:
        out = {}
        with open(path) as f:
            rows = [np.fromstring(line, sep=" ").reshape(3, 4) for line in f if line.strip()]
        for i, m in enumerate(rows):
            if i >= len(self.times):
                break
            T = np.eye(4)
            T[:3, :4] = m  # cam0 -> world (TUM-compatible cam->world)
            out[self.times[i]] = T
        return out

    def intrinsics(self):
        return self.fx, self.fy, self.cx, self.cy

    def __len__(self) -> int:
        return len(self.left_files)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        for i, (lf, rf) in enumerate(zip(self.left_files, self.right_files)):
            left = _load_png(lf)
            right = _load_png(rf)
            depth = np.asarray(
                stereo_depth(
                    jnp.asarray(left),
                    jnp.asarray(right),
                    self.fx,
                    self.baseline,
                    max_disparity=self.max_disparity,
                )
            )
            t = self.times[i] if i < len(self.times) else i * 0.1
            yield int(t * 1e9), left, depth

    def iter_stereo(self) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        """Raw (t_ns, left u8, right u8) stream — for the fused scan path,
        which block-matches depth ON DEVICE inside the per-frame step
        (SequentialConfig.stereo_baseline); uint8 transport halves H2D."""
        for i, (lf, rf) in enumerate(zip(self.left_files, self.right_files)):
            t = self.times[i] if i < len(self.times) else i * 0.1
            yield int(t * 1e9), _load_png_u8(lf), _load_png_u8(rf)
