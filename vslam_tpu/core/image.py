"""Dense image operations in pure JAX (XLA-fused on TPU).

TPU-native equivalents of the reference's per-pixel loops and OpenCV calls:
- bilinear interpolation          (reference `core/src/algorithm.h:36-82`)
- bilinear resize                 (reference `algorithm.h:83-101`)
- normalized conv2d               (reference `algorithm.cpp:122-149`)
- Scharr gradients                (reference `algorithm.cpp:72-80`, `Kernel2d.h`)
- Gaussian blur + Sobel           (reference `Frame.cpp:215-232` via cv::GaussianBlur/cv::Sobel)
- pyramid downsample              (reference `Frame.cpp:255-275` via cv::buildPyramid)
- masked median blur              (reference `algorithm.h:156-184`)

All functions are shape-static and mask-based (no dynamic sizes), so they can
live inside `jit`/`vmap`/`scan` without retracing.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "bilinear_sample",
    "nearest_sample",
    "conv2d_reflect",
    "conv2d_norm_interior",
    "gaussian_blur_3x3",
    "sobel_x",
    "sobel_y",
    "scharr_x",
    "scharr_y",
    "grad_x",
    "grad_y",
    "pyr_down",
    "resize_bilinear",
    "median_blur_3x3_masked",
    "masked_median",
]


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


def _gather2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Clipped 2-D gather. `img: (H, W)`, integer index arrays of any shape."""
    H, W = img.shape
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    flat = img.reshape(-1)
    return jnp.take(flat, iy * W + ix)


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear interpolation at continuous coords (x=col, y=row).

    Matches reference `algorithm.h:36-82` (floor/ceil corners; the integer-
    coordinate special case there reduces to the standard lerp with zero
    fraction). Out-of-range coords are clamped — callers mask validity.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    q11 = _gather2d(img, iy0, ix0)
    q21 = _gather2d(img, iy0, ix0 + 1)
    q12 = _gather2d(img, iy0 + 1, ix0)
    q22 = _gather2d(img, iy0 + 1, ix0 + 1)
    top = q11 * (1.0 - fx) + q21 * fx
    bot = q12 * (1.0 - fx) + q22 * fx
    return top * (1.0 - fy) + bot * fy


def nearest_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Round-to-nearest lookup (the reference's residual pass uses
    `std::round`, `InverseCompositional.cpp:119-120` — half away from zero;
    coords here are non-negative so floor(x + 0.5) is identical)."""
    ix = jnp.floor(x + 0.5).astype(jnp.int32)
    iy = jnp.floor(y + 0.5).astype(jnp.int32)
    return _gather2d(img, iy, ix)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


def _conv2d_valid(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """2-D valid correlation via lax.conv (flipped kernel = convolution not
    needed; reference kernels are symmetric or handled explicitly)."""
    lhs = img[None, None, :, :].astype(jnp.float32)
    rhs = kernel[None, None, :, :].astype(jnp.float32)
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID"
    )
    return out[0, 0].astype(img.dtype)


def conv2d_reflect(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Correlate with reflect-101 border (OpenCV BORDER_DEFAULT)."""
    kh, kw = kernel.shape
    py, px = kh // 2, kw // 2
    padded = jnp.pad(img, ((py, py), (px, px)), mode="reflect")
    return _conv2d_valid(padded, kernel)


def conv2d_norm_interior(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Reference `algorithm.cpp:122-149` conv2d: interior pixels only (border
    stays 0) and the response is normalized by sum(|kernel|)."""
    kh, kw = kernel.shape
    py, px = kh // 2, kw // 2
    norm = jnp.sum(jnp.abs(kernel))
    interior = _conv2d_valid(img, kernel) / norm.astype(img.dtype)
    return jnp.pad(interior, ((py, py), (px, px)), mode="constant")


# Python tuples (not jnp arrays): the taps are compile-time constants baked
# into the shifted-slice passes; arrays would become traced values under jit
_GAUSS3 = (0.25, 0.5, 0.25)
_SOBEL_D = (-1.0, 0.0, 1.0)
_SOBEL_S = (1.0, 2.0, 1.0)
_SCHARR_D = (-1.0, 0.0, 1.0)
_SCHARR_S = (3.0, 10.0, 3.0)
_PYR5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _sep_pass(img: jax.Array, taps, axis: int) -> jax.Array:
    """One axis of a separable correlation as shifted-slice adds.

    `lax.conv` with 1x1 channels cannot use the MXU and measures ~5 ms per
    3x3 filter at 480x640 on TPU; k shifted adds are pure VPU elementwise
    work that XLA fuses into one HBM pass (~100x faster). Input must already
    be padded by len(taps)//2 along `axis`."""
    k = len(taps)
    n = img.shape[axis] - (k - 1)
    out = None
    for i, t in enumerate(taps):
        if t == 0.0:
            continue
        sl = lax.slice_in_dim(img, i, i + n, axis=axis)
        term = sl if t == 1.0 else t * sl
        out = term if out is None else out + term
    return out


def _sep_conv_reflect(img: jax.Array, ky: jax.Array, kx: jax.Array) -> jax.Array:
    """Separable correlation with reflect-101 border (OpenCV BORDER_DEFAULT),
    as two shifted-slice passes (see _sep_pass)."""
    ky = tuple(float(t) for t in ky)
    kx = tuple(float(t) for t in kx)
    py, px = len(ky) // 2, len(kx) // 2
    padded = jnp.pad(img, ((py, py), (px, px)), mode="reflect")
    return _sep_pass(_sep_pass(padded, ky, 0), kx, 1)


def gaussian_blur_3x3(img: jax.Array) -> jax.Array:
    """cv::GaussianBlur(Size(3,3), sigma=0) == separable [1,2,1]/4."""
    return _sep_conv_reflect(img, _GAUSS3, _GAUSS3)


def sobel_x(img: jax.Array) -> jax.Array:
    """cv::Sobel(dx=1, ksize=3): [[-1,0,1],[-2,0,2],[-1,0,1]], reflect-101.
    Used for the per-level intensity derivatives (`Frame.cpp:215-232`)."""
    return _sep_conv_reflect(img, _SOBEL_S, _SOBEL_D)


def sobel_y(img: jax.Array) -> jax.Array:
    return _sep_conv_reflect(img, _SOBEL_D, _SOBEL_S)


def scharr_x(img: jax.Array) -> jax.Array:
    return _sep_conv_reflect(img, _SCHARR_S, _SCHARR_D)


def scharr_y(img: jax.Array) -> jax.Array:
    return _sep_conv_reflect(img, _SCHARR_D, _SCHARR_S)


def grad_x(img: jax.Array) -> jax.Array:
    """Reference `algorithm.cpp:72-75` gradX: Scharr response normalized by
    sum(|kernel|)=32, border zero, truncated toward zero (cast<int>)."""
    return jnp.trunc(conv2d_norm_interior(img, _scharr_x_kernel(img.dtype)))


def _scharr_x_kernel(dtype):
    return jnp.array(
        [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], dtype=dtype
    )


def _scharr_y_kernel(dtype):
    return jnp.array(
        [[-3.0, -10.0, -3.0], [0.0, 0.0, 0.0], [3.0, 10.0, 3.0]], dtype=dtype
    )


def grad_y(img: jax.Array) -> jax.Array:
    return jnp.trunc(conv2d_norm_interior(img, _scharr_y_kernel(img.dtype)))


# ---------------------------------------------------------------------------
# Pyramid
# ---------------------------------------------------------------------------


def pyr_down(img: jax.Array) -> jax.Array:
    """cv::pyrDown: 5-tap Gaussian [1,4,6,4,1]/16 (separable, reflect-101)
    then decimate by 2. Output size = ceil(n/2) per dim, matching
    cv::buildPyramid used by `Frame.cpp:261-267`.

    The vertical pass runs on the decimated rows only (output stride 2
    commutes with the row filter), halving the horizontal-pass work."""
    taps = tuple(float(t) for t in _PYR5)
    padded = jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")
    rows = _sep_pass(padded, taps, 0)[::2, :]
    return _sep_pass(rows, taps, 1)[:, ::2]


def resize_bilinear(img: jax.Array, s: float) -> jax.Array:
    """Reference `algorithm.h:83-101` resize: output (floor(H*s), floor(W*s)),
    each output pixel sampled at (j/s, i/s) — corner-aligned."""
    if s == 1.0:
        return img
    H, W = img.shape
    oh, ow = int(H * s), int(W * s)
    inv = 1.0 / s
    if inv == int(inv):
        # integer stride: every sample lands on an exact pixel — the
        # "bilinear" resize degenerates to decimation (a strided slice,
        # no gathers). This is the pyramid's x0.5 depth path.
        k = int(inv)
        return img[: k * oh : k, : k * ow : k]
    ys = (jnp.arange(oh, dtype=jnp.float32) * inv)[:, None]
    xs = (jnp.arange(ow, dtype=jnp.float32) * inv)[None, :]
    ys = jnp.broadcast_to(ys, (oh, ow))
    xs = jnp.broadcast_to(xs, (oh, ow))
    return bilinear_sample(img, xs, ys)


# ---------------------------------------------------------------------------
# Median
# ---------------------------------------------------------------------------


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of `values` where `mask` is True (flattened).

    Sort-based with static shapes: invalid entries are pushed to +inf, the
    median index is computed from the valid count. For even counts this is
    the standard average of the two central elements. (The reference's
    `algorithm.cpp:109-120` averages elements n/2-1 and n/2+1 — an apparent
    off-by-one; we deliberately use the standard definition.)
    """
    v = jnp.where(mask, values, jnp.inf).reshape(-1)
    s = jnp.sort(v)
    n = jnp.sum(mask)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = 0.5 * (s[lo] + s[hi])
    return jnp.where(n > 0, med, jnp.zeros_like(med))


def median_blur_3x3_masked(
    img: jax.Array, invalid: jax.Array
) -> jax.Array:
    """3x3 median ignoring masked-out pixels; border rows/cols output 0.

    Mirrors reference `algorithm.h:156-184` medianBlur (used on the depth map
    before each pyramid downsample, `Frame.cpp:268-273`, with
    mask = (v <= 0)). `invalid` is a boolean array marking excluded pixels.
    """
    H, W = img.shape
    big = jnp.asarray(jnp.finfo(jnp.float32).max, img.dtype)
    vals = jnp.where(invalid, big, img)

    # 9 shifted views of the padded image -> (H, W, 9)
    vp = jnp.pad(vals, 1, mode="constant", constant_values=big)
    mp = jnp.pad(~invalid, 1, mode="constant", constant_values=False)
    windows = []
    counts = []
    for dy in range(3):
        for dx in range(3):
            windows.append(vp[dy : dy + H, dx : dx + W])
            counts.append(mp[dy : dy + H, dx : dx + W])
    n = jnp.sum(jnp.stack(counts, axis=-1), axis=-1)

    # 9-element sorting network (Batcher, 25 compare-exchanges) on the 9
    # shifted planes: pure elementwise min/max on (H, W) lanes — no
    # jnp.sort/gather (take_along_axis is a scattered HBM gather, ~11 ms at
    # 480x640 on TPU; this fuses to ~0.5 ms)
    s = windows
    _NET9 = [(0, 1), (3, 4), (6, 7), (1, 2), (4, 5), (7, 8), (0, 1), (3, 4),
             (6, 7), (0, 3), (3, 6), (0, 3), (1, 4), (4, 7), (1, 4), (2, 5),
             (5, 8), (2, 5), (1, 3), (5, 7), (2, 6), (4, 6), (2, 4), (2, 3),
             (5, 6)]
    for a, b in _NET9:
        lo_v = jnp.minimum(s[a], s[b])
        hi_v = jnp.maximum(s[a], s[b])
        s[a], s[b] = lo_v, hi_v

    # per-pixel rank selection by valid count: invalids sit at +inf after the
    # sort, so the median of the n valid values is at ranks (n-1)//2 and n//2
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)

    def select(idx):
        out = jnp.zeros_like(s[0])
        for k in range(9):
            out = jnp.where(idx == k, s[k], out)
        return out

    med = 0.5 * (select(lo) + select(hi))
    med = jnp.where(n > 0, med, jnp.zeros_like(med))

    # reference writes only interior pixels; border stays 0
    border = jnp.zeros_like(med)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    interior = (yy >= 1) & (yy < H - 1) & (xx >= 1) & (xx < W - 1)
    return jnp.where(interior, med, border)
