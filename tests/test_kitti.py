"""Stereo block-matching tests on synthetic rectified pairs (KITTI
depth-from-stereo path; the reference lists KITTI in README.md:14 but ships
no implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.io.kitti import block_matching_disparity, stereo_depth


def make_stereo_pair(rng, H=96, W=160, disp=7.0):
    """Fronto-parallel plane at constant disparity. Standard rectified
    convention: a point at column x in the LEFT image appears at x - d in
    the RIGHT image, i.e. right(x) = left(x + d)."""
    from scipy.ndimage import zoom

    base = zoom(rng.uniform(0, 255, (H // 4, (W + 40) // 4)), 4, order=3)[:H, : W + 40]
    left = base[:, 20 : 20 + W].astype(np.float32)
    right = base[:, int(20 + disp) : int(20 + disp) + W].astype(np.float32)
    return left, right


def test_constant_disparity_plane(rng):
    disp_true = 7.0
    left, right = make_stereo_pair(rng, disp=disp_true)
    disp = np.asarray(
        block_matching_disparity(jnp.asarray(left), jnp.asarray(right), max_disparity=32)
    )
    valid = disp > 0
    interior = np.zeros_like(valid)
    interior[10:-10, 40:-10] = True
    sel = valid & interior
    assert sel.mean() > 0.3, f"too few valid disparities ({sel.mean():.2f})"
    err = np.abs(disp[sel] - disp_true)
    assert np.median(err) < 0.5, f"median disparity error {np.median(err)}"


def test_depth_conversion(rng):
    left, right = make_stereo_pair(rng, disp=8.0)
    fx, baseline = 100.0, 0.5
    depth = np.asarray(
        stereo_depth(jnp.asarray(left), jnp.asarray(right), fx, baseline, max_disparity=32)
    )
    want = fx * baseline / 8.0
    sel = depth > 0
    assert sel.mean() > 0.2
    assert abs(np.median(depth[sel]) - want) < 0.5


def test_textureless_is_invalid():
    flat = jnp.full((64, 96), 100.0, jnp.float32)
    disp = np.asarray(block_matching_disparity(flat, flat, max_disparity=16))
    # uniqueness check must reject the ambiguous matches
    assert (disp > 0).mean() < 0.05
