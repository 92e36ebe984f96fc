"""Dense FAST corner detection with per-grid-cell NMS, in pure JAX.

TPU-native rebuild of reference `FeatureTracking::extractFeatures`
(FeatureTracking.cpp:81-136): cv::FastFeatureDetector (FAST-9/16, threshold
10) masked by valid depth (> 0.1 m), then one best-response keypoint per
30-px grid cell. Lists become dense maps: the detector emits a (cells,)
response/position tensor with a validity mask — static shapes end-to-end.

FAST score follows OpenCV's definition in spirit: the corner response is the
largest contiguous-arc strength (sum of |ring - center| - t over the darker
or brighter arc); we use the common sum-based approximation, which only
affects NMS ordering.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["FastGridResult", "fast_grid_detect", "FAST_OFFSETS"]

# Bresenham circle of radius 3 (the FAST-16 ring), clockwise from 12 o'clock
FAST_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


class FastGridResult(NamedTuple):
    uv: jax.Array  # (C, 2) float pixel coords of the best corner per cell
    response: jax.Array  # (C,)
    valid: jax.Array  # (C,) bool


def _ring_stack(img: jax.Array) -> jax.Array:
    """(H, W, 16) ring intensities via 16 static shifts (pure VPU work)."""
    H, W = img.shape
    pad = 3
    p = jnp.pad(img, pad, mode="edge")
    views = [p[pad + dy : pad + dy + H, pad + dx : pad + dx + W] for dx, dy in FAST_OFFSETS]
    return jnp.stack(views, axis=-1)


def fast_score(img: jax.Array, threshold: float = 10.0, arc: int = 9) -> jax.Array:
    """Dense FAST-9/16 response map; 0 where not a corner."""
    ring = _ring_stack(img)
    center = img[..., None]
    brighter = ring > center + threshold
    darker = ring < center - threshold

    def contiguous(mask):  # (H, W, 16) -> (H, W) any arc of length `arc`
        m = jnp.concatenate([mask, mask[..., : arc - 1]], axis=-1)
        out = jnp.zeros(img.shape, bool)
        for s in range(16):
            run = m[..., s]
            for k in range(1, arc):
                run = run & m[..., s + k]
            out = out | run
        return out

    is_bright = contiguous(brighter)
    is_dark = contiguous(darker)
    diff = ring - center
    score_b = jnp.sum(jnp.where(brighter, diff - threshold, 0.0), axis=-1)
    score_d = jnp.sum(jnp.where(darker, -diff - threshold, 0.0), axis=-1)
    score = jnp.where(is_bright, score_b, 0.0) + jnp.where(is_dark, score_d, 0.0)
    return score


def fast_grid_detect(
    img: jax.Array,
    depth: jax.Array,
    threshold: float = 10.0,
    cell: int = 30,
    min_depth: float = 0.1,
    border: int = 16,
) -> FastGridResult:
    """FAST + depth mask + per-cell argmax NMS. Returns one candidate per
    grid cell with a validity mask (cells without corners are masked)."""
    H, W = img.shape
    score = fast_score(img, threshold)
    dm = jnp.isfinite(depth) & (depth > min_depth)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    score = jnp.where(dm & inb, score, 0.0)

    nr, nc = H // cell, W // cell
    crop = score[: nr * cell, : nc * cell]
    cells = crop.reshape(nr, cell, nc, cell).transpose(0, 2, 1, 3).reshape(nr * nc, cell * cell)
    best = jnp.argmax(cells, axis=-1)
    resp = jnp.take_along_axis(cells, best[:, None], axis=-1)[:, 0]
    cy = best // cell
    cx = best % cell
    ci = jnp.arange(nr * nc)
    u = (ci % nc) * cell + cx
    v = (ci // nc) * cell + cy
    uv = jnp.stack([u, v], axis=-1).astype(img.dtype)
    return FastGridResult(uv=uv, response=resp, valid=resp > 0.0)
