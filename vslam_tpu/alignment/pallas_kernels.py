"""Pallas TPU kernels for the alignment hot path.

`bilinear_sample_mxu_single`: image sampling at scattered sub-pixel coords as
MXU work instead of HBM gathers. Random-access gathers from HBM cost ~18 ns
per lookup on v5e (latency-bound) and dominate the Gauss-Newton iteration;
hardware gathers inside Mosaic only support same-shape indices. Instead:

    sample(p) = onehot2_y(p) @ image @ onehot2_x(p)

where onehot2_y carries the two bilinear row weights (1-fy, fy) and the
column mix carries (1-fx, fx). Both masks are built IN the kernel from the
coordinates via iota comparisons — they never exist in HBM. The row mix is
one (CHUNK, H) x (H, W) matmul on the MXU; the column mix is a masked row
reduction on the VPU. The image block stays resident in VMEM across the
whole grid row (index_map ignores the chunk axis).

Cost per pair per call at 480x640, 8192 points: ~2.5 GFLOP MXU + ~10 MB VMEM
traffic — microseconds, versus ~0.15 ms for the HBM gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.platform import pallas_interpret

__all__ = ["bilinear_sample_mxu_single"]

_CHUNK = 1024  # points per grid step; (CHUNK, H) mask ~2 MB in VMEM


def bilinear_sample_mxu_single(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Unbatched variant: img (H, W), u/v (M,) -> (M,). Pads M up to the
    chunk size internally (padding samples pixel (0,0); callers mask).
    Composes with jax.vmap (pallas_call's batching rule adds a grid axis),
    which is how the batched-pairs aligner uses it."""
    H, W = img.shape
    M = u.shape[0]
    Mp = ((M + _CHUNK - 1) // _CHUNK) * _CHUNK
    if Mp != M:
        u = jnp.pad(u, (0, Mp - M))
        v = jnp.pad(v, (0, Mp - M))
    n_chunks = Mp // _CHUNK
    u4 = u.reshape(n_chunks, 8, 128)
    v4 = v.reshape(n_chunks, 8, 128)

    def kernel(u_ref, v_ref, img_ref, out_ref):
        _sample_body(u_ref[0], v_ref[0], img_ref, out_ref)

    out = pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 8, 128), jnp.float32),
    )(u4, v4, img)
    return out.reshape(Mp)[:M]


def _sample_body(u_blk, v_blk, img_ref, out_ref):
    """Shared kernel body: u_blk/v_blk (8, 128), img_ref (H, W) ref."""
    H, W = img_ref.shape[-2], img_ref.shape[-1]
    img = img_ref[...].reshape(H, W)
    u = u_blk.reshape(_CHUNK)
    v = v_blk.reshape(_CHUNK)

    v0 = jnp.floor(v)
    fy = (v - v0).astype(jnp.float32)
    u0 = jnp.floor(u)
    fx = (u - u0).astype(jnp.float32)
    v0i = v0.astype(jnp.int32).reshape(_CHUNK, 1)
    u0i = u0.astype(jnp.int32).reshape(_CHUNK, 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, H), 1)
    fyc = fy.reshape(_CHUNK, 1)
    wy = jnp.where(rows == v0i, 1.0 - fyc, 0.0) + jnp.where(rows == v0i + 1, fyc, 0.0)
    mix = jnp.dot(wy, img, preferred_element_type=jnp.float32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, W), 1)
    fxc = fx.reshape(_CHUNK, 1)
    wx = jnp.where(cols == u0i, 1.0 - fxc, 0.0) + jnp.where(cols == u0i + 1, fxc, 0.0)
    out_ref[0] = jnp.sum(mix * wx, axis=-1).reshape(8, 128)
