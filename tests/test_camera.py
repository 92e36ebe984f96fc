"""Camera tests mirroring reference `test_camera.cpp` (round-trip projection)."""

import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)
import numpy as np

from vslam_tpu.core import camera as cam


def make_cam():
    return cam.Camera.create(525.0, 525.0, 319.5, 239.5)


def test_project_backproject_roundtrip(rng):
    c = make_cam()
    uv = rng.uniform([0, 0], [640, 480], size=(100, 2)).astype(np.float32)
    z = rng.uniform(0.5, 5.0, size=100).astype(np.float32)
    p = cam.backproject(c, jnp.asarray(uv), jnp.asarray(z))
    uv2, valid = cam.project(c, p)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-3)


def test_project_invalid_behind_camera():
    c = make_cam()
    p = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0], [0.1, 0.1, 1.0]])
    uv, valid = cam.project(c, p)
    assert list(np.asarray(valid)) == [False, False, True]
    assert np.all(np.isfinite(np.asarray(uv)))  # masked, not NaN


def test_scale_matches_reference():
    """Camera::resize multiplies fx, fy, cx, cy by s (Camera.cpp:39-43)."""
    c = make_cam()
    c2 = cam.scale(c, 0.5)
    assert float(c2.fx) == 262.5
    assert float(c2.cx) == 319.5 * 0.5


def test_intrinsic_matrix():
    c = make_cam()
    K = np.asarray(cam.intrinsic_matrix(c))
    np.testing.assert_allclose(
        K, [[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]]
    )


def test_ray():
    c = make_cam()
    r = np.asarray(cam.ray(c, jnp.asarray([319.5, 239.5])))
    np.testing.assert_allclose(r, [0.0, 0.0, 1.0], atol=1e-6)
