"""2-D Lucas-Kanade tests: warp a synthetic image by a known transform and
recover it (mirrors reference `test_lukas_kanade_affine.cpp` /
`test_lukas_kanade_flow.cpp` strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import affine_transform, shift as nd_shift

from vslam_tpu.alignment import lk2d


def smooth_image(rng, H=80, W=100):
    img = rng.uniform(0, 255, size=(H // 4, W // 4))
    from scipy.ndimage import zoom

    return zoom(img, 4, order=3).astype(np.float32)[:H, :W]


@pytest.mark.parametrize("method", ["inverse_compositional", "forward_additive"])
def test_optical_flow_recovery(rng, method):
    img = smooth_image(rng)
    flow_true = np.array([2.3, -1.7])
    # image(u,v) = templ shifted: I(W(x)) = T(x) with W(x) = x + flow
    # => I(y) = T(y - flow): shift T by +flow
    image = nd_shift(img, shift=(flow_true[1], flow_true[0]), order=1, mode="nearest")
    cfg = lk2d.Lk2dConfig(method=method)
    flow, res = lk2d.align_optical_flow(jnp.asarray(img), jnp.asarray(image), cfg=cfg)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(flow), flow_true, atol=0.1)


@pytest.mark.parametrize("method", ["inverse_compositional", "forward_additive"])
def test_affine_recovery(rng, method):
    img = smooth_image(rng)
    H, W = img.shape
    p_true = np.array([0.02, 0.01, -0.015, 0.025, 1.5, -2.0])
    A = np.array([[1 + p_true[0], p_true[2], p_true[4]], [p_true[1], 1 + p_true[3], p_true[5]]])
    # construct image so that I(W(x)) = T(x): I = T o W^-1
    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))
    image = affine_transform(
        img, Ainv[:2, :2].T, offset=(Ainv[1, 2], Ainv[0, 2]), order=1, mode="nearest"
    )
    # scipy affine_transform maps output->input with (row, col) convention:
    # out(i,j) = in(M @ (i,j) + offset); our warp is (x=col, y=row), so the
    # matrix above is transposed into row-major order.
    cfg = lk2d.Lk2dConfig(method=method)
    p, res = lk2d.align_affine(jnp.asarray(img), jnp.asarray(image), cfg=cfg)
    assert bool(res.valid)
    got = np.asarray(p)
    # compare resulting warp matrices (parameter-space compare is scale-skewed)
    A_got = np.array([[1 + got[0], got[2], got[4]], [got[1], 1 + got[3], got[5]]])
    np.testing.assert_allclose(A_got, A, atol=0.05)


def test_affine_fa_ic_parity(rng):
    """FA and IC must agree on the recovered warp (ForwardAdditive vs
    InverseCompositional consistency, the reference's dual-solver role)."""
    img = smooth_image(rng)
    p_true = np.array([0.01, -0.005, 0.008, 0.012, -1.0, 1.5])
    A = np.array([[1 + p_true[0], p_true[2], p_true[4]], [p_true[1], 1 + p_true[3], p_true[5]]])
    Ainv = np.linalg.inv(np.vstack([A, [0, 0, 1]]))
    image = affine_transform(
        img, Ainv[:2, :2].T, offset=(Ainv[1, 2], Ainv[0, 2]), order=1, mode="nearest"
    )
    p_ic, r_ic = lk2d.align_affine(
        jnp.asarray(img), jnp.asarray(image), cfg=lk2d.Lk2dConfig(method="inverse_compositional")
    )
    p_fa, r_fa = lk2d.align_affine(
        jnp.asarray(img), jnp.asarray(image), cfg=lk2d.Lk2dConfig(method="forward_additive")
    )
    assert bool(r_ic.valid) and bool(r_fa.valid)
    np.testing.assert_allclose(np.asarray(p_ic), np.asarray(p_fa), atol=0.02)


def test_flow_zero_for_identical_images(rng):
    img = smooth_image(rng)
    flow, res = lk2d.align_optical_flow(jnp.asarray(img), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-3)
