"""Fully-fused normal-equations Pallas kernel — the Gauss-Newton hot loop.

One kernel evaluates, per (frame, point-chunk) grid step, the complete
inverse-compositional residual pass of the reference
(`InverseCompositional.cpp:105-153`): SE(3) warp of the precomputed reference
points, pinhole projection, visibility test, sub-pixel intensity sampling of
the current image, the photometric residual against the precomputed template,
and the weighted normal-equation accumulation A = JᵀWJ, b = JᵀWr, chi2 = rᵀWr
— without a single intermediate array ever leaving VMEM.

Why fused: each Gauss-Newton iteration in the XLA gather path materializes
u, v, iwxp, r, w and Jw in HBM between ~20 small HLOs, and the scattered
intensity lookup is a latency-bound HBM gather (~18 ns/point on v5e). Here
the current image is resident in VMEM across the whole grid, sampling runs as
one-hot matmuls on the MXU (`pallas_kernels.py` describes the trick), and the
per-chunk (8, C) x (C, 8) Gram-matrix accumulation is a single MXU pass whose
8x8 output packs [A | b; chi2 | count] in one tile:

    right = [j0..j5, r, 1]  (8, C)      left = w * right
    G     = left @ rightᵀ   (8, 8)      G[:6,:6]=A  G[:6,6]=b  G[6,6]=chi2
                                        G[7,7]=n_visible

The kernel supports the reference's round-to-nearest lookup
(`InverseCompositional.cpp:119-120`) and sub-pixel bilinear, and optionally
samples from a bfloat16 copy of the image (one-hot weights in bf16, f32
accumulation on the MXU) for ~2x MXU throughput; intensities are 0..255 so
bf16 rounding stays below the quantization noise of the reference's uint8
images (`types.h:33-65`).

Robust losses need a global residual scale (median/t-dist fixed point); the
in-kernel GN solver (`fused_solve.py`) computes it over VMEM-cached residuals,
while the per-iteration path here pairs `fused_level_sample` with XLA-side
scale/weights (`ic._frame_normal_equations`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.platform import pallas_interpret

from ..core.camera import Camera
from ..core.se3 import SE3

__all__ = ["FusedLevelPack", "pack_level", "fused_level_ne", "fused_level_sample"]

_CHUNK = 1024  # points per grid step = one (8, 128) f32 tile row-block

# Banded sampling (round 5): the one-hot row matmul wy(C, H) @ img(H, W) —
# the dominant executed-FLOP term (2*C*H*W per chunk per GN iteration,
# ~94% of the kernel's FLOPs at 480x640, profile_mfu round-4: 14.91 GFLOP
# executed vs 0.002 algorithmic per pair) — multiplies almost entirely by
# zeros: each point reads 1-2 image rows, and a chunk of 1024 points is
# row-contiguous by construction (ic._precompute_compact compacts the
# interest mask in row-major order, so consecutive points share rows, and
# inter-frame warp displacement is small). The banded path computes the
# chunk's warped row range [vmin, vmax] in-kernel and runs the matmul only
# over _BAND-row segments of the image that the chunk actually touches:
# wy(C, _BAND) @ img[rs:rs+_BAND] per segment, accumulated over the
# (data-dependent, usually 1) number of segments. Exact — out-of-band
# points cannot exist by construction — and _BAND = 128 keeps the MXU's
# full 128-deep systolic contraction busy. Callers pad the image by _BAND
# rows so the last segment's dynamic slice stays in bounds; banding is
# compiled in only when H > _BAND (static decision per pyramid level).
# VSLAM_FUSED_BAND overrides the segment height (0 disables banding) for
# A/B roofline experiments.
import os as _os

_BAND = int(_os.environ.get("VSLAM_FUSED_BAND", "128"))


class FusedLevelPack(NamedTuple):
    """Per-level kernel operands, packed once per align (outside the GN loop).

    geom: (F, nc, 8, C)  rows 0-4 = px, py, pz, templ, mask (5-7 zero pad)
    jt:   (F, nc, 8, C)  rows 0-5 = steepest-descent Jᵀ (6-7 zero pad)
    """

    geom: jax.Array
    jt: jax.Array


def pack_level(pcl: jax.Array, J: jax.Array, templ: jax.Array, mask: jax.Array) -> FusedLevelPack:
    """Pack ICLevelData-style arrays (leading frame axis F, point axis N)
    into the kernel's chunked SoA layout. N is padded to a _CHUNK multiple;
    padding rows carry mask=0 and zero geometry (the z<=0 guard masks them)."""
    F, N = templ.shape
    Np = ((N + _CHUNK - 1) // _CHUNK) * _CHUNK
    pad = Np - N

    def padp(x):  # (F, N, ...) -> (F, Np, ...)
        return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))

    pcl, J, templ, mask = padp(pcl), padp(J), padp(templ), padp(mask.astype(templ.dtype))
    nc = Np // _CHUNK
    zero = jnp.zeros((F, Np), templ.dtype)
    geom = jnp.stack(
        [pcl[..., 0], pcl[..., 1], pcl[..., 2], templ, mask, zero, zero, zero], axis=1
    )  # (F, 8, Np)
    jt = jnp.stack([J[..., k] for k in range(6)] + [zero, zero], axis=1)
    # (F, 8, Np) -> (F, nc, 8, C): chunk the point axis
    geom = geom.reshape(F, 8, nc, _CHUNK).transpose(0, 2, 1, 3)
    jt = jt.reshape(F, 8, nc, _CHUNK).transpose(0, 2, 1, 3)
    return FusedLevelPack(geom, jt)


def _sample_chunk(g, img_ref, scal, H, W, interp, band=0):
    """One chunk's warp + projection + visibility + sampling (pure values).

    g: (8, C) geometry rows [px, py, pz, templ, mask]; img_ref: (H, W) VMEM
    ref ((H + band, W) when ``band`` > 0 — callers pad the rows); scal: 16
    f32 scalars (r00..r22, tx, ty, tz, fx, fy, cx, cy); band: 0 = full
    one-hot row matmul, > 0 = banded segments (see _BAND above).
    Returns (iwxp (C,) f32 sampled intensity, visible (C,) bool, templ (C,)).
    """
    (r00, r01, r02, r10, r11, r12, r20, r21, r22,
     tx, ty, tz, fx, fy, cx, cy) = scal
    px, py, pz = g[0, :], g[1, :], g[2, :]
    templ, mask = g[3, :], g[4, :]

    # SE(3) warp + pinhole projection (Camera.cpp:4-11 semantics: z<=0 masked)
    xw = r00 * px + r01 * py + r02 * pz + tx
    yw = r10 * px + r11 * py + r12 * pz + ty
    zw = r20 * px + r21 * py + r22 * pz + tz
    z_ok = zw > 0.0
    zi = 1.0 / jnp.where(z_ok, zw, 1.0)
    u = fx * xw * zi + cx
    v = fy * yw * zi + cy

    # visibility identical to ic._warp_visibility
    visible = (
        (mask > 0.0)
        & z_ok
        & (u > 1.0)
        & (u < W - 1.0)
        & (v > 1.0)
        & (v < H - 1.0)
    )
    # visible already implies u in (1, W-1) / v in (1, H-1) so floor/floor+1
    # and round stay in range; invisible points sample pixel (0, 0) with w=0
    uc = jnp.where(visible, u, 0.0)
    vc = jnp.where(visible, v, 0.0)

    # one-hot sampling on the MXU; weights cast to the image dtype
    idt = img_ref.dtype
    cols = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, W), 1)
    if interp == "bilinear":
        v0 = jnp.floor(vc)
        fyf = (vc - v0).reshape(_CHUNK, 1)
        v0i = v0.astype(jnp.int32)
        u0 = jnp.floor(uc)
        fxf = (uc - u0).reshape(_CHUNK, 1)
        u0i = u0.astype(jnp.int32).reshape(_CHUNK, 1)
        wx = jnp.where(cols == u0i, 1.0 - fxf, 0.0) + jnp.where(cols == u0i + 1, fxf, 0.0)
    else:  # "nearest": floor(x + 0.5) = std::round for non-negative coords
        v0i = jnp.floor(vc + 0.5).astype(jnp.int32)
        u0i = jnp.floor(uc + 0.5).astype(jnp.int32).reshape(_CHUNK, 1)
        wx = jnp.where(cols == u0i, 1.0, 0.0)
    # bf16 operands need DEFAULT contract precision (Mosaic rejects a forced
    # fp32 contract on bf16 lhs/rhs); accumulation stays f32 either way
    prec = jax.lax.Precision.DEFAULT if idt == jnp.bfloat16 else None
    v0c = v0i.reshape(_CHUNK, 1)

    def _wy(row_ids):
        """One-hot row weights against (C, ...) image-row-index grid."""
        if interp == "bilinear":
            return jnp.where(row_ids == v0c, 1.0 - fyf, 0.0) + jnp.where(
                row_ids == v0c + 1, fyf, 0.0
            )
        return jnp.where(row_ids == v0c, 1.0, 0.0)

    if band:
        # Banded path (see _BAND): the chunk's warped rows span
        # [vmin, vmax] (inclusive; bilinear touches v0 and v0+1); run the
        # one-hot matmul only over _BAND-row segments covering that span.
        vmax_pt = v0i + (1 if interp == "bilinear" else 0)
        vmin = jnp.min(jnp.where(visible, v0i, H))
        vmax = jnp.max(jnp.where(visible, vmax_pt, -1))
        r0 = (vmin // 8) * 8  # sublane-aligned dynamic-slice start
        nb = jnp.maximum((vmax + 1 - r0 + band - 1) // band, 0)
        wx32 = wx.astype(jnp.float32)

        def seg(s, acc):
            rs = r0 + s * band
            bimg = img_ref[pl.ds(rs, band), :]
            lr = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, band), 1) + rs
            mix = jnp.dot(
                _wy(lr).astype(idt), bimg,
                preferred_element_type=jnp.float32, precision=prec,
            )
            return acc + jnp.sum(mix * wx32, axis=-1)

        iwxp = jax.lax.fori_loop(0, nb, seg, jnp.zeros((_CHUNK,), jnp.float32))
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, H), 1)
        mix = jnp.dot(
            _wy(rows).astype(idt), img_ref[...],
            preferred_element_type=jnp.float32, precision=prec,
        )
        iwxp = jnp.sum(mix * wx.astype(jnp.float32), axis=-1)  # (C,)
    return iwxp, visible, templ


def _gram_chunk(g, jrows, img_ref, scal, H, W, interp, band=0):
    """One chunk's residual pass + Gram block (pure values; shared by the
    per-iteration NE kernel and the full in-kernel GN solver).

    g: (8, C) geometry rows [px, py, pz, templ, mask]; jrows: (8, C) Jᵀ rows;
    img_ref: (H, W) VMEM ref; scal as in _sample_chunk. Returns G (8, 8):
    G[:6,:6] = JᵀWJ, G[:6,6] = JᵀWr, G[6,6] = chi2, G[7,7] = n_visible.
    """
    iwxp, visible, templ = _sample_chunk(g, img_ref, scal, H, W, interp, band)

    # residual + quadratic weights (loss "None": w = visible)
    w = visible.astype(jnp.float32)
    r = iwxp - templ

    # Gram accumulation: one (8, C) x (C, 8) MXU pass
    right = jnp.concatenate(
        [jrows[:6, :], r.reshape(1, _CHUNK), jnp.ones((1, _CHUNK), jnp.float32)], axis=0
    )
    left = right * w.reshape(1, _CHUNK)
    return jax.lax.dot_general(
        left, right, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (8, 8)


def _ne_kernel(params_ref, geom_ref, jt_ref, img_ref, out_ref, *, H, W, interp, band):
    """Grid (F, nc); accumulates the 8x8 Gram block into out_ref[(f)]."""
    c = pl.program_id(1)

    scal = tuple(params_ref[0, k] for k in range(16))
    G = _gram_chunk(geom_ref[0, 0], jt_ref[0, 0], img_ref, scal, H, W, interp, band)
    Gp = jnp.pad(G, ((0, 0), (0, 120)))

    @pl.when(c == 0)
    def _():
        out_ref[0] = Gp

    @pl.when(c > 0)
    def _():
        out_ref[0] = out_ref[0] + Gp


@functools.partial(jax.jit, static_argnames=("interp",))
def fused_level_ne(
    pack: FusedLevelPack,
    img: jax.Array,  # (H, W) f32 or bf16 current-frame intensity
    rel: SE3,  # (F, 3, 3), (F, 3)
    cam: Camera,
    interp: str = "bilinear",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Raw (unnormalized) per-frame normal equations.

    Returns (A (F, 6, 6), b (F, 6), chi2 (F,), n_visible (F,)).
    """
    F, nc = pack.geom.shape[:2]
    H, W = img.shape
    band = _BAND if H > _BAND else 0
    if band:
        img = jnp.pad(img, ((0, band), (0, 0)))
    params = jnp.concatenate(
        [
            rel.R.reshape(F, 9).astype(jnp.float32),
            rel.t.reshape(F, 3).astype(jnp.float32),
            jnp.broadcast_to(
                jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]).astype(jnp.float32), (F, 4)
            ),
        ],
        axis=1,
    )  # (F, 16)

    kernel = functools.partial(_ne_kernel, H=H, W=W, interp=interp, band=band)
    out = pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        grid=(F, nc),
        in_specs=[
            pl.BlockSpec((1, 16), lambda f, c: (f, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8, _CHUNK), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, _CHUNK), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H + band, W), lambda f, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 8, 128), jnp.float32),
    )(params, pack.geom, pack.jt, img)

    A = (out[:, :6, :6] + jnp.swapaxes(out[:, :6, :6], 1, 2)) * 0.5  # exact symmetry
    b = out[:, :6, 6]
    chi2 = out[:, 6, 6]
    n_vis = out[:, 7, 7]
    return A, b, chi2, n_vis


def _sample_level_kernel(params_ref, geom_ref, img_ref, iw_ref, vis_ref, *, H, W, interp, band):
    """Grid (F, nc); emits sampled intensity + visibility per point chunk
    (the sampling-only companion of _ne_kernel, for robust losses whose
    scale/weights are computed in XLA from the compact residual arrays)."""
    scal = tuple(params_ref[0, k] for k in range(16))
    iwxp, visible, _ = _sample_chunk(geom_ref[0, 0], img_ref, scal, H, W, interp, band)
    iw_ref[0, 0] = iwxp.reshape(8, 128)
    vis_ref[0, 0] = visible.astype(jnp.float32).reshape(8, 128)


@functools.partial(jax.jit, static_argnames=("interp",))
def fused_level_sample(
    pack: FusedLevelPack,
    img: jax.Array,  # (H, W) f32 or bf16 current-frame intensity
    rel: SE3,  # (F, 3, 3), (F, 3)
    cam: Camera,
    interp: str = "bilinear",
) -> Tuple[jax.Array, jax.Array]:
    """Warped-intensity samples for every packed point.

    Returns (iwxp (F, Np) f32, visible (F, Np) bool) with Np = nc * chunk;
    callers slice back to the unpadded point count.
    """
    F, nc = pack.geom.shape[:2]
    H, W = img.shape
    band = _BAND if H > _BAND else 0
    if band:
        img = jnp.pad(img, ((0, band), (0, 0)))
    params = jnp.concatenate(
        [
            rel.R.reshape(F, 9).astype(jnp.float32),
            rel.t.reshape(F, 3).astype(jnp.float32),
            jnp.broadcast_to(
                jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]).astype(jnp.float32), (F, 4)
            ),
        ],
        axis=1,
    )  # (F, 16)

    kernel = functools.partial(_sample_level_kernel, H=H, W=W, interp=interp, band=band)
    iw, vis = pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        grid=(F, nc),
        in_specs=[
            pl.BlockSpec((1, 16), lambda f, c: (f, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8, _CHUNK), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H + band, W), lambda f, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, nc, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((F, nc, 8, 128), jnp.float32),
        ],
    )(params, pack.geom, img)
    Np = nc * _CHUNK
    return iw.reshape(F, Np), vis.reshape(F, Np) > 0.0
