"""Image-op tests mirroring reference `test_algorithm.cpp` (bilinear, resize,
conv2d) plus pyramid/median semantics from `Frame.cpp` / `algorithm.h`."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)

from vslam_tpu.core import image as ops


def test_bilinear_matches_scipy(rng):
    """Standard bilinear (scipy map_coordinates order=1). Note: the reference
    `algorithm.h:36-82` transposes the cross-term weights (its Q21/Q12 mix
    rows and columns); we implement the correct formula — the reference's hot
    residual path uses nearest-neighbor lookup, not bilinear, so this has no
    parity impact on alignment."""
    from scipy.ndimage import map_coordinates

    img = rng.uniform(0, 255, size=(24, 32)).astype(np.float32)
    x = rng.uniform(0, 30.9, size=50).astype(np.float32)
    y = rng.uniform(0, 22.9, size=50).astype(np.float32)
    got = np.asarray(ops.bilinear_sample(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))
    want = map_coordinates(img, [y, x], order=1, mode="nearest")
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_bilinear_integer_coords(rng):
    img = rng.uniform(0, 255, size=(8, 8)).astype(np.float32)
    got = float(ops.bilinear_sample(jnp.asarray(img), jnp.float32(3.0), jnp.float32(5.0)))
    assert got == pytest.approx(img[5, 3], abs=1e-4)


def test_nearest_sample(rng):
    img = rng.uniform(0, 255, size=(8, 8)).astype(np.float32)
    # std::round semantics: 2.5 -> 3
    got = float(ops.nearest_sample(jnp.asarray(img), jnp.float32(2.5), jnp.float32(1.4)))
    assert got == pytest.approx(img[1, 3])


def test_resize_half(rng):
    img = rng.uniform(0, 255, size=(16, 20)).astype(np.float32)
    out = np.asarray(ops.resize_bilinear(jnp.asarray(img), 0.5))
    assert out.shape == (8, 10)
    # corner-aligned: out[i,j] = img[2i, 2j] exactly (integer sample points)
    np.testing.assert_allclose(out, img[::2, ::2], atol=1e-3)


def test_pyr_down_shape_and_smoothness(rng):
    img = rng.uniform(0, 255, size=(480, 640)).astype(np.float32)
    out = np.asarray(ops.pyr_down(jnp.asarray(img)))
    assert out.shape == (240, 320)
    # constant image stays constant (kernel normalized)
    const = jnp.full((32, 32), 7.0)
    np.testing.assert_allclose(np.asarray(ops.pyr_down(const)), 7.0, atol=1e-4)


def test_sobel_on_ramp():
    """Sobel-x of a horizontal ramp x -> 8*slope (sum of kernel weights x1+2+1 * 2)."""
    H, W = 16, 16
    img = np.tile(np.arange(W, dtype=np.float32) * 3.0, (H, 1))
    gx = np.asarray(ops.sobel_x(jnp.asarray(img)))
    np.testing.assert_allclose(gx[4:-4, 4:-4], 8 * 3.0, atol=1e-3)
    gy = np.asarray(ops.sobel_y(jnp.asarray(img)))
    np.testing.assert_allclose(gy[4:-4, 4:-4], 0.0, atol=1e-3)


def test_conv2d_norm_interior_border_zero(rng):
    img = rng.uniform(0, 255, size=(10, 10)).astype(np.float32)
    k = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32)
    out = np.asarray(ops.conv2d_norm_interior(jnp.asarray(img), jnp.asarray(k)))
    assert np.all(out[0, :] == 0) and np.all(out[:, 0] == 0)
    # interior value: correlation / 32
    i, j = 5, 5
    want = float((img[i - 1 : i + 2, j - 1 : j + 2] * k).sum() / 32.0)
    assert out[i, j] == pytest.approx(want, rel=1e-4)


def test_masked_median():
    vals = jnp.asarray([5.0, 1.0, 9.0, 3.0, 7.0])
    mask = jnp.asarray([True, True, True, True, True])
    assert float(ops.masked_median(vals, mask)) == 5.0
    mask = jnp.asarray([True, True, False, True, False])  # {5,1,3}
    assert float(ops.masked_median(vals, mask)) == 3.0
    mask = jnp.asarray([True, True, False, True, True])  # {5,1,3,7} -> 4
    assert float(ops.masked_median(vals, mask)) == 4.0
    mask = jnp.zeros(5, bool)
    assert float(ops.masked_median(vals, mask)) == 0.0


def test_median_blur_masked():
    img = np.zeros((6, 6), np.float32)
    img[2:5, 2:5] = [[1, 2, 3], [4, 0, 6], [7, 8, 9]]  # center invalid (0)
    out = np.asarray(ops.median_blur_3x3_masked(jnp.asarray(img), jnp.asarray(img) <= 0))
    # window at (3,3): valid values {1,2,3,4,6,7,8,9} -> median 5.0
    assert out[3, 3] == pytest.approx(5.0)
    # border must be zero
    assert np.all(out[0, :] == 0) and np.all(out[-1, :] == 0)


def test_frame_pyramid(rng):
    from vslam_tpu.core import camera as cam
    from vslam_tpu.core.frame import create_frame, frame_pcl

    img = rng.uniform(0, 255, size=(48, 64)).astype(np.float32)
    depth = rng.uniform(0.5, 3.0, size=(48, 64)).astype(np.float32)
    depth[10:14, 10:14] = 0.0  # invalid hole
    c = cam.Camera.create(50.0, 50.0, 31.5, 23.5)
    f = create_frame(jnp.asarray(img), jnp.asarray(depth), c, n_levels=3)
    assert f.n_levels == 3
    assert f.intensity[1].shape == (24, 32)
    assert f.intensity[2].shape == (12, 16)
    assert float(f.cameras[2].fx) == pytest.approx(12.5)
    pts, valid = frame_pcl(f, 0)
    assert pts.shape == (48, 64, 3)
    assert not bool(valid[11, 11])
    # backprojection consistency: z equals depth where valid
    np.testing.assert_allclose(
        np.asarray(pts[..., 2])[np.asarray(valid)],
        depth[np.asarray(valid)],
        atol=1e-5,
    )
