"""Parity of the device-batched scene renderer against the numpy reference
path (synthetic.render_boxes_batch vs synthetic.render_boxes).

The device renderer exists because long-horizon benchmark sequences
(bench.py kitti loop gate) render hundreds of 1241x376 stereo pairs — the
host path costs ~2.5 s/frame on one CPU, the batched jitted path runs the
same closed-form math data-parallel on the accelerator. These tests pin the
two paths together so the device sequences remain the same scenes the rest
of the suite is calibrated on."""

import numpy as np
import pytest

from vslam_tpu.core import lie_np
from vslam_tpu.io import synthetic

pytestmark = pytest.mark.quick


def _poses(n=5, extent=0.3):
    return synthetic.loop_trajectory(n, extent=extent, height=0.1, yaw=0.2)


def test_render_boxes_batch_matches_host():
    H, W = 96, 128
    K = synthetic.camera_matrix(100.0, 100.0, (W - 1) / 2, (H - 1) / 2)
    scene = synthetic.BoxScene(seed=4)
    poses = _poses(5)
    inten_d, depth_d = synthetic.render_boxes_batch(K, poses, (H, W), scene, batch=2)
    assert inten_d.shape == (5, H, W) and depth_d.shape == (5, H, W)
    for i, p in enumerate(poses):
        inten_h, depth_h = synthetic.render_boxes(K, p, (H, W), scene)
        # f32 device math vs f64 host math: texture phases at metre-scale
        # coordinates lose ~1e-4 rad in f32 -> sub-0.5-graylevel differences
        assert np.max(np.abs(inten_d[i] - inten_h)) < 0.5
        assert np.max(np.abs(depth_d[i] - depth_h)) < 1e-3


def test_render_boxes_batch_scaled_scene():
    """Street-scale BoxScene (the KITTI loop gate's layout): patches pushed
    out by `scale`, parity still holds and the scene still fills the frame."""
    H, W = 94, 160  # KITTI-ish aspect
    K = synthetic.camera_matrix(120.0, 120.0, (W - 1) / 2, (H - 1) / 2)
    scene = synthetic.BoxScene(
        seed=4, scale=5.0,
        background=synthetic.PlaneScene(
            normal=(0.0, -0.25, 1.0), d=12.5, origin=(0.0, 0.0, 12.5)
        ),
    )
    poses = _poses(3, extent=2.0)
    inten_d, depth_d = synthetic.render_boxes_batch(K, poses, (H, W), scene, batch=3)
    for i, p in enumerate(poses):
        inten_h, depth_h = synthetic.render_boxes(K, p, (H, W), scene)
        assert np.max(np.abs(inten_d[i] - inten_h)) < 0.5
        assert np.max(np.abs(depth_d[i] - depth_h)) < 5e-3
    # the scaled scene must cover the frame with valid street-range depth
    assert (depth_d[0] > 0).mean() > 0.95
    assert 5.0 < np.median(depth_d[0][depth_d[0] > 0]) < 20.0


def test_box_scene_scale_is_pure_layout():
    """scale=1 keeps the historical layout byte-for-byte (no silent change
    to every existing BoxScene test/gate)."""
    H, W = 64, 80
    K = synthetic.camera_matrix(80.0, 80.0, (W - 1) / 2, (H - 1) / 2)
    a = synthetic.render_boxes(K, np.eye(4), (H, W), synthetic.BoxScene(seed=7))
    b = synthetic.render_boxes(K, np.eye(4), (H, W), synthetic.BoxScene(seed=7, scale=1.0))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
