"""Feature detection/description/matching tests (mirror reference
`test_tracking.cpp` invariants, on synthetic imagery)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.features import descriptor, detector, matcher


def blob_image(rng, H=120, W=160, n=25):
    """Image with bright square blobs — strong FAST corners at blob corners."""
    img = np.full((H, W), 50.0, np.float32)
    centers = []
    for _ in range(n):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img[y - 3 : y + 4, x - 3 : x + 4] = 220.0
        centers.append((x, y))
    return img, centers


def test_fast_detects_blobs(rng):
    img, centers = blob_image(rng)
    depth = np.full(img.shape, 2.0, np.float32)
    res = detector.fast_grid_detect(jnp.asarray(img), jnp.asarray(depth), threshold=20.0)
    uv = np.asarray(res.uv)[np.asarray(res.valid)]
    assert len(uv) >= 10
    # every detection lies near some blob
    dists = [min(np.hypot(u - x, v - y) for x, y in centers) for u, v in uv]
    assert np.median(dists) < 6.0


def test_fast_respects_depth_mask(rng):
    img, _ = blob_image(rng)
    depth = np.zeros(img.shape, np.float32)  # all invalid
    res = detector.fast_grid_detect(jnp.asarray(img), jnp.asarray(depth))
    assert not bool(np.any(np.asarray(res.valid)))


def test_fast_uniform_image_no_corners():
    img = jnp.full((90, 120), 100.0, jnp.float32)
    depth = jnp.full((90, 120), 2.0, jnp.float32)
    res = detector.fast_grid_detect(img, depth)
    assert not bool(jnp.any(res.valid))


def test_descriptor_repeatability(rng):
    img, centers = blob_image(rng)
    uv = jnp.asarray(np.asarray(centers[:10], np.float32))
    d1 = descriptor.extract_descriptors(jnp.asarray(img), uv)
    d2 = descriptor.extract_descriptors(jnp.asarray(img) + 0.0, uv)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # distinct keypoints should have distinct descriptors
    dmat = np.asarray(matcher.descriptor_l1_matrix(d1, d1))
    off_diag = dmat[~np.eye(len(dmat), dtype=bool)]
    assert np.all(np.diag(dmat) == 0)
    assert np.median(off_diag) > 20


def test_matcher_ratio_and_max_distance():
    dist = jnp.asarray(
        [
            [1.0, 10.0, 20.0],  # strong unambiguous match -> accept
            [5.0, 5.5, 20.0],  # ambiguous (ratio) -> reject
            [2000.0, 3000.0, 4000.0],  # beyond max distance -> reject
        ]
    )
    res = matcher.ratio_match(dist, max_distance=1000.0, min_distance_ratio=0.8)
    assert list(np.asarray(res.valid)) == [True, False, False]
    assert int(res.idx[0]) == 0


def test_match_shifted_image(rng):
    """Same blobs shifted by 2px: descriptors must match across images."""
    img, centers = blob_image(rng)
    img2 = np.roll(img, shift=(2, 2), axis=(0, 1))
    uv1 = jnp.asarray(np.asarray(centers[:15], np.float32))
    uv2 = jnp.asarray(np.asarray([(x + 2, y + 2) for x, y in centers[:15]], np.float32))
    d1 = descriptor.extract_descriptors(jnp.asarray(img), uv1)
    d2 = descriptor.extract_descriptors(jnp.asarray(img2), uv2)
    dm = matcher.descriptor_l1_matrix(d1, d2)
    res = matcher.ratio_match(dm, max_distance=1000.0, min_distance_ratio=0.9)
    idx = np.asarray(res.idx)
    ok = np.asarray(res.valid)
    assert ok.sum() >= 8
    assert np.mean(idx[ok] == np.arange(15)[ok]) > 0.9


def test_epipolar_error_zero_on_line():
    F = jnp.asarray(np.array([[0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]]))  # pure tx essential
    uv_c = jnp.asarray([[10.0, 20.0]])
    # with this F, the epipolar line of (u,v) is horizontal through v
    uv_q_on = jnp.asarray([[50.0, 20.0]])
    uv_q_off = jnp.asarray([[50.0, 25.0]])
    e_on = float(matcher.epipolar_error_matrix(F, uv_q_on, uv_c)[0, 0])
    e_off = float(matcher.epipolar_error_matrix(F, uv_q_off, uv_c)[0, 0])
    assert e_on == pytest.approx(0.0, abs=1e-5)
    assert e_off == pytest.approx(5.0, abs=1e-4)


def test_descriptor_rotation_invariance(rng):
    """Steered BRIEF (ORB orientation): descriptors of the same scene
    features survive an in-plane rotation that breaks unoriented BRIEF
    (reference uses cv::ORB whose rBRIEF has the same property)."""
    H, W = 160, 160
    # asymmetric blobs -> non-degenerate intensity-centroid angles
    img = np.full((H, W), 60.0, np.float32)
    pts = []
    for _ in range(12):
        y, x = rng.integers(45, H - 45), rng.integers(45, W - 45)
        img[y - 2 : y + 5, x - 2 : x + 3] = 230.0
        img[y : y + 7, x : x + 2] = 140.0
        pts.append((x, y))
    pts = np.asarray(pts, np.float64)

    ang = np.deg2rad(35.0)
    c, s = np.cos(ang), np.sin(ang)
    ctr = np.array([(W - 1) / 2, (H - 1) / 2])
    R = np.array([[c, -s], [s, c]])
    # rotate the image by -ang by sampling source coords rotated by +ang
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    src = (np.stack([xx - ctr[0], yy - ctr[1]], -1) @ R.T) + ctr
    sx = np.clip(np.round(src[..., 0]).astype(int), 0, W - 1)
    sy = np.clip(np.round(src[..., 1]).astype(int), 0, H - 1)
    img_rot = img[sy, sx].astype(np.float32)
    pts_rot = (pts - ctr) @ np.linalg.inv(R).T + ctr

    d0 = np.asarray(descriptor.extract_descriptors(jnp.asarray(img), jnp.asarray(pts, jnp.float32)))
    d1 = np.asarray(descriptor.extract_descriptors(jnp.asarray(img_rot), jnp.asarray(pts_rot, jnp.float32)))
    u0 = np.asarray(descriptor.extract_descriptors(jnp.asarray(img), jnp.asarray(pts, jnp.float32), oriented=False))
    u1 = np.asarray(descriptor.extract_descriptors(jnp.asarray(img_rot), jnp.asarray(pts_rot, jnp.float32), oriented=False))

    ham_oriented = np.abs(d0 - d1).sum(axis=1)
    ham_plain = np.abs(u0 - u1).sum(axis=1)
    # oriented descriptors must be markedly more stable under rotation, and
    # stable enough in absolute terms to pass a 0.8-ratio test vs random
    # (random 256-bit Hamming ~ 128)
    assert np.median(ham_oriented) < 0.6 * np.median(ham_plain), (
        np.median(ham_oriented), np.median(ham_plain))
    assert np.median(ham_oriented) < 64
