"""Native IO runtime tests: PNG decode parity vs PIL, prefetch loader order
and throughput (replaces reference NodeReplayer/Queue runtime)."""

import os

import numpy as np
import pytest
from PIL import Image

from vslam_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(), reason="native library not built"
)


def write_pngs(tmp_path, n=6, H=40, W=56, seed=0):
    rng = np.random.default_rng(seed)
    rgb_paths, depth_paths, grays, depths = [], [], [], []
    for i in range(n):
        gray = rng.integers(0, 256, (H, W), dtype=np.uint8)
        depth16 = rng.integers(0, 30000, (H, W), dtype=np.uint16)
        p1 = str(tmp_path / f"rgb_{i}.png")
        p2 = str(tmp_path / f"depth_{i}.png")
        Image.fromarray(gray, mode="L").save(p1)
        Image.fromarray(depth16, mode="I;16").save(p2)
        rgb_paths.append(p1)
        depth_paths.append(p2)
        grays.append(gray)
        depths.append(depth16)
    return rgb_paths, depth_paths, grays, depths


def test_decode_gray8(tmp_path, rng):
    gray = rng.integers(0, 256, (33, 47)).astype(np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(gray, mode="L").save(p)
    out = native_loader.decode_png(p)
    np.testing.assert_array_equal(out, gray.astype(np.float32))


def test_decode_rgb_luma(tmp_path, rng):
    rgb = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "c.png")
    Image.fromarray(rgb, mode="RGB").save(p)
    out = native_loader.decode_png(p)
    want = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    np.testing.assert_allclose(out, want.astype(np.float32), atol=1e-3)


def test_decode_gray16_scaled(tmp_path, rng):
    d = rng.integers(0, 40000, (24, 24)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(d, mode="I;16").save(p)
    out = native_loader.decode_png(p, scale16=1.0 / 5000.0)
    np.testing.assert_allclose(out, d.astype(np.float32) / 5000.0, rtol=1e-6)


def test_prefetch_loader_order_and_content(tmp_path):
    rgb_paths, depth_paths, grays, depths = write_pngs(tmp_path)
    loader = native_loader.NativeFrameLoader(
        rgb_paths, depth_paths, depth_scale=1.0 / 5000.0, n_threads=3, capacity=2
    )
    frames = list(loader)
    assert len(frames) == len(rgb_paths)
    for i, (g, d) in enumerate(frames):
        np.testing.assert_array_equal(g, grays[i].astype(np.float32))
        np.testing.assert_allclose(d, depths[i].astype(np.float32) / 5000.0, rtol=1e-6)
    loader.close()


def test_decode_missing_file_raises():
    with pytest.raises(IOError):
        native_loader.decode_png("/nonexistent/file.png")


def test_raw_loader_native_dtypes(tmp_path):
    """Raw-transport mode: the loader streams (u8 gray, u16 depth counts)
    exactly as stored in the PNGs — the dtypes the pipeline stages on device
    (PipelineConfig.depth_scale converts there)."""
    rgb_paths, depth_paths, grays, depths = write_pngs(tmp_path, seed=4)
    loader = native_loader.NativeFrameLoader(rgb_paths, depth_paths, raw=True)
    got = list(loader)
    loader.close()
    assert len(got) == len(grays)
    for (g, d), g_want, d_want in zip(got, grays, depths):
        assert g.dtype == np.uint8 and d.dtype == np.uint16
        np.testing.assert_array_equal(g, g_want)
        np.testing.assert_array_equal(d, d_want)


def test_raw_loader_rgb_luma_rounding(tmp_path, rng):
    """Color input in raw mode: Rec.601 luma rounded to u8, matching
    cv::IMREAD_GRAYSCALE (and TumDataset.iter_raw's PIL fallback)."""
    rgb = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    d16 = rng.integers(0, 30000, (20, 30)).astype(np.uint16)
    p1, p2 = str(tmp_path / "c.png"), str(tmp_path / "d.png")
    Image.fromarray(rgb, mode="RGB").save(p1)
    Image.fromarray(d16, mode="I;16").save(p2)
    loader = native_loader.NativeFrameLoader([p1], [p2], raw=True)
    (g, d), = list(loader)
    loader.close()
    want = np.round(
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.uint8)
    # float rounding at the .5 boundary may differ by 1 count
    assert np.abs(g.astype(np.int32) - want.astype(np.int32)).max() <= 1
    np.testing.assert_array_equal(d, d16)
