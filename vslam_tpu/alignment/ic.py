"""Dense inverse-compositional SE(3) image alignment — the hot path.

TPU-native rebuild of the reference's lukas_kanade stack
(`lukas_kanade/src/{Warp,InverseCompositional,InverseCompositionalStacked}.cpp`)
and `odometry/src/direct_image_alignment/SE3Alignment.cpp`, redesigned for
XLA:

- Variable-length interest-point lists -> dense boolean masks over the full
  pixel grid (static shapes; invalid pixels carry weight 0).
- Per-pixel virtual warp calls -> one fused elementwise pass computing the
  warp, projection, visibility and residual for every pixel.
- J^T W J / J^T W r accumulation -> a single weighted (P,6)^T x (P,6) matmul
  on the MXU per Gauss-Newton iteration (the steepest-descent rows J are
  precomputed once per level, as in inverse-compositional LK).
- The multi-frame "stacked" problem (keyframe + last frame) -> a leading
  frame axis F with a tree-sum of per-frame normal equations.
- The coarse-to-fine Gauss-Newton loop -> `lax.while_loop` per level inside
  one jit-compiled program.

Reference semantics preserved (with file:line cites in the relevant spots):
interest-point selection |grad I|^2 >= minGradient^2 and valid depth
(SE3Alignment.cpp:83-94), nearest-neighbor intensity lookup in the residual
pass (InverseCompositional.cpp:119-120), NE normalization by the constant
interest-point count (InverseCompositional.cpp:139-143), the 1/255^2
photometric-vs-prior normalizer (SE3Alignment.cpp:37-47), and the analytic
2x6 point-projection Jacobian (Warp.cpp:166-201).
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod
from ..core import image as img_ops
from ..core import se3
from ..core.camera import Camera
from ..core.frame import Frame
from ..core.se3 import SE3
from ..solvers import loss as loss_mod
from ..solvers.gauss_newton import SolverConfig, SolverResult, solve_gauss_newton
from ..solvers.linalg6 import inv_psd
from ..solvers.normal_equations import NormalEquations

__all__ = ["AlignmentConfig", "ICLevelData", "precompute_level", "precompute_frame", "level_normal_equations", "align", "iteration_images"]


@dataclasses.dataclass(frozen=True)
class AlignmentConfig:
    """Static alignment configuration (hashable -> usable as a jit static arg).

    Field names mirror the reference parameter tree
    (`config/NodeMapping.yaml`, `NodeRgbdAlignment.cpp:52-63`).
    """

    min_gradient: float = 30.0  # features.min_gradient
    solver: SolverConfig = SolverConfig(max_iterations=100, min_step_size=1e-11)
    loss: loss_mod.LossConfig = loss_mod.LossConfig("None")
    include_prior: bool = True  # OdometryRgbd always enables it (Odometry.cpp:24)
    # information weight of the motion prior (reference hardcodes unit
    # information, SE3Alignment.cpp:33-36, tuned for 640x480/fx=525; smaller
    # images carry ~(fx/525)^2 less photometric information, so scale this
    # down accordingly when tracking at low resolution)
    prior_weight: float = 1.0
    interpolation: str = "bilinear"  # sub-pixel sampling (default); "nearest" = strict reference parity (InverseCompositional.cpp:119-120)
    # renormalize R onto SO(3) every iteration (f32 drift control; negligible cost)
    orthonormalize: bool = True
    # Static interest-point budget at the finest level (halved 4x per level).
    # The reference builds exactly such a compacted list (variable-length,
    # SE3Alignment.cpp:83-94); on TPU the list has a fixed capacity and the
    # per-iteration work scales with it instead of with the full pixel grid.
    # 0 disables compaction (fully dense masks).
    max_points: int = 32768
    # "gather": XLA HBM gather (works everywhere). "mxu": Pallas sampling via
    # one-hot matmuls on the MXU (bilinear only). "fused": the full residual
    # pass — warp, projection, visibility, sampling AND the JᵀWJ/JᵀWr
    # accumulation — as ONE Pallas kernel per GN iteration with the image
    # resident in VMEM (fused_ne.py); quadratic loss only (robust losses need
    # a global residual scale and fall back to the gather path). "fused_gn":
    # the ENTIRE per-level Gauss-Newton solve as one kernel (fused_solve.py):
    # per-pair early exit under vmap + zero per-iteration XLA overhead; all
    # losses and scalers run in-kernel.
    sampler: str = "gather"
    # Image dtype for the fused sampler's MXU one-hot matmuls: "bfloat16"
    # doubles MXU throughput; intensities are 0..255 so bf16 rounding stays
    # below the reference's own uint8 quantization (types.h:33-65).
    image_dtype: str = "float32"
    # Exposure-robust mode (capability extension; the reference has no
    # photometric compensation): standardize every pyramid level of both
    # frames to mean 128 / spread 64 over valid pixels before aligning, so a
    # global gain/bias change between frames (auto-exposure on fr2_desk)
    # cancels out of the photometric residual. Off by default (strict
    # reference parity); changes the effective min_gradient scale.
    normalize_intensity: bool = False


def _masked_stats(x: jax.Array, axis=(-2, -1)):
    """(mean, std) over VALID pixels only — zero is the invalid sentinel
    throughout the frame pipeline (missing depth, out-of-scene render fill,
    warp border). Unmasked statistics would give frames with different
    invalid-area fractions different effective gains, breaking the exact
    gain/bias cancellation the exposure-robust mode exists for. keepdims so
    the results broadcast against x."""
    valid = x > 0.0
    n = jnp.maximum(jnp.sum(valid, axis=axis, keepdims=True), 1.0)
    m = jnp.sum(jnp.where(valid, x, 0.0), axis=axis, keepdims=True) / n
    var = jnp.sum(jnp.where(valid, (x - m) ** 2, 0.0), axis=axis, keepdims=True) / n
    return m, jnp.sqrt(var)


def _standardize(img: jax.Array) -> jax.Array:
    """Per-image photometric standardization to mean 128 / spread 64 (the
    exposure-robust mode, AlignmentConfig.normalize_intensity): a global
    gain/bias between frames cancels out of the residual. Statistics over
    valid (nonzero) pixels; per-image along any leading batch axes.
    Dtype-preserving."""
    x = img.astype(jnp.float32)
    m, s = _masked_stats(x)
    return ((x - m) / (s + 1e-6) * 64.0 + 128.0).astype(img.dtype)


def normalize_level(inten: jax.Array, dIx: jax.Array, dIy: jax.Array):
    """Standardize a reference level's template AND scale its gradients by
    the same linear gain (the steepest-descent rows must live in the
    normalized photometric units the residual is computed in). Works on
    (H, W) and stacked (F, H, W) levels; per-frame statistics either way.
    The ONE definition shared by precompute_frame, the in-align precompute,
    and the iteration-log replay (aligner._level_data_jit)."""
    x = inten.astype(jnp.float32)
    _, s = _masked_stats(x)
    g = 64.0 / (s + 1e-6)
    return (
        _standardize(inten),
        (dIx.astype(jnp.float32) * g).astype(dIx.dtype),
        (dIy.astype(jnp.float32) * g).astype(dIy.dtype),
    )


class ICLevelData(NamedTuple):
    """Precomputed per-(frame, level) quantities. Leading axes may include a
    frame-batch axis F: pcl (F, P, 3), J (F, P, 6), templ (F, P), mask (F, P)."""

    pcl: jax.Array
    J: jax.Array
    templ: jax.Array
    mask: jax.Array
    n_constraints: jax.Array  # (F,)


def _projection_jacobian(p: jax.Array, fx, fy) -> jax.Array:
    """Analytic d(uv)/d(xi) for uv = proj(exp(xi) * p), xi = [rho; phi].

    Matches reference `Warp.cpp:166-201` (rows scaled by fx / fy). ``p`` is
    (..., 3); returns (..., 2, 6). Invalid points (z <= 0) produce rows that
    the caller masks out.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_safe = jnp.where(z > 0, z, 1.0)
    zi = 1.0 / z_safe
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    j02 = -x * zi2
    j12 = -y * zi2
    row0 = jnp.stack(
        [zi, zero, j02, y * j02, 1.0 - x * j02, -y * zi], axis=-1
    ) * fx
    row1 = jnp.stack(
        [zero, zi, j12, -1.0 + y * j12, -y * j02, x * zi], axis=-1
    ) * fy
    return jnp.stack([row0, row1], axis=-2)


def _depth_valid_3x3(depth: jax.Array) -> jax.Array:
    """Depth validity eroded by the 3x3 neighborhood: a pixel participates
    only if its whole 3x3 depth window is valid (> 0 and finite) — the
    reference's WarpSE3 PCL exclusion rule (Warp.cpp:118-133). Sensor holes
    corrupt the blurred-Sobel template gradients of adjacent pixels; this
    keeps those boundary pixels out of the interest set."""
    valid = jnp.isfinite(depth) & (depth > 0.0)
    # pad with False: image-border pixels also fail the full-window rule
    padded = jnp.pad(valid, [(0, 0)] * (valid.ndim - 2) + [(1, 1), (1, 1)])
    out = jnp.ones_like(valid)
    for dy in range(3):
        for dx in range(3):
            out = out & padded[..., dy : dy + valid.shape[-2], dx : dx + valid.shape[-1]]
    return out


def precompute_level(
    intensity: jax.Array,
    dIx: jax.Array,
    dIy: jax.Array,
    depth: jax.Array,
    cam: Camera,
    min_gradient: float,
    max_points: int = 0,
) -> ICLevelData:
    """Interest mask, point cloud and steepest-descent rows for one level.

    Accepts an optional leading frame axis: all image args (..., H, W).
    Selection follows SE3Alignment.cpp:83-94 (|grad|^2 >= minGradient^2 and
    depth > 0); rows with invalid backprojection (z <= 0) are masked exactly
    like the reference's non-finite-J filter (InverseCompositional.cpp:76-88).
    """
    H, W = intensity.shape[-2], intensity.shape[-1]
    batch = intensity.shape[:-2]
    dtype = intensity.dtype
    P = H * W

    if max_points and max_points < P:
        fn = lambda i, gx, gy, d: _precompute_compact(
            i, gx, gy, d, cam, min_gradient, max_points
        )
        for _ in batch:
            fn = jax.vmap(fn)
        return fn(intensity, dIx, dIy, depth)

    grad2 = dIx * dIx + dIy * dIy
    depth_valid = _depth_valid_3x3(depth)
    mask = (grad2 >= min_gradient * min_gradient) & depth_valid

    ys = jnp.broadcast_to(jnp.arange(H, dtype=dtype)[:, None], (H, W))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=dtype)[None, :], (H, W))
    uv = jnp.stack([xs, ys], axis=-1)
    z = jnp.where(depth_valid, depth, 0.0)
    pcl = cam_mod.backproject(cam, uv, z)  # (..., H, W, 3)

    Jw = _projection_jacobian(pcl, fx=cam.fx, fy=cam.fy)  # (..., H, W, 2, 6)
    J = dIx[..., None] * Jw[..., 0, :] + dIy[..., None] * Jw[..., 1, :]
    mask = mask & (pcl[..., 2] > 0.0)
    J = jnp.where(mask[..., None], J, jnp.zeros_like(J))

    return ICLevelData(
        pcl=pcl.reshape(*batch, P, 3),
        J=J.reshape(*batch, P, 6),
        templ=intensity.reshape(*batch, P),
        mask=mask.reshape(*batch, P),
        n_constraints=jnp.sum(mask.reshape(*batch, P), axis=-1).astype(dtype),
    )


def precompute_frame(frame: Frame, cfg: "AlignmentConfig") -> Tuple[ICLevelData, ...]:
    """Per-level interest-point data for ONE frame (no frame axis), indexed
    like ``Frame.intensity`` (0 = finest).

    This is the cacheable half of the aligner: the reference precomputes the
    steepest-descent rows once per problem (InverseCompositional.cpp:50-59),
    and in a sequential scan the keyframe is constant for ~kf_period frames —
    its precompute is a loop invariant. Callers cache the returned tuple
    (e.g. in ``SequentialState``), stack two frames' tuples along a new F
    axis, and pass the result to :func:`align` as ``ref_data``.
    """
    out = []
    for level in range(len(frame.intensity)):
        cam = Camera(*(jnp.reshape(c, (-1,))[0] for c in frame.cameras[level]))
        budget = cfg.max_points >> (2 * level) if cfg.max_points else 0
        inten, dIx, dIy = frame.intensity[level], frame.dIx[level], frame.dIy[level]
        if cfg.normalize_intensity:
            inten, dIx, dIy = normalize_level(inten, dIx, dIy)
        out.append(
            precompute_level(
                inten,
                dIx,
                dIy,
                frame.depth[level],
                cam,
                cfg.min_gradient,
                max_points=budget,
            )
        )
    return tuple(out)


def _precompute_compact(
    intensity: jax.Array,  # (H, W)
    dIx: jax.Array,
    dIy: jax.Array,
    depth: jax.Array,
    cam: Camera,
    min_gradient: float,
    n_sel: int,
) -> ICLevelData:
    """Interest points gathered into a fixed-capacity list — the TPU version
    of the reference's interest-point vector (SE3Alignment.cpp:83-94):
    steepest-descent rows and the point cloud are built only for the
    selected points, and every Gauss-Newton iteration then scales with the
    budget, not the pixel grid.

    Round-5 redesign (the single biggest per-align cost on hardware): the
    previous `jnp.nonzero(size)` compaction lowers to a 307k-element XLA
    scatter that measured ~2.5 ms per 480x640 level on v5e — ~15x the whole
    fused GN solve. This version is scatter- and gather-free: the image is
    cut into 8-row blocks; each block takes its first (row-major)
    kb = n_sel // n_blocks masked pixels via a dense rank one-hot
    ((cumsum == r) & mask selects exactly the r-th masked pixel) and
    compacts coordinates, depth, gradients and template in one batched
    (kb, M) x (M, 8) matmul (~50 us total). Selection is therefore
    *block-stratified*: each 8-row band contributes up to kb points, so a
    tight budget spreads over the whole image instead of concentrating in
    the top rows — strictly better-conditioned normal equations; with the
    budget at or above the mask population it selects the same set as the
    dense path. Capacity is n_blocks * kb (<= n_sel); padding rows carry
    mask=False. Point order stays row-major by block, keeping the fused
    kernel's point chunks row-contiguous (fused_ne._BAND)."""
    H, W = intensity.shape
    dtype = intensity.dtype
    # block height: the rank one-hot is (n_blocks, kb, BR*W) — its element
    # count (and the compaction's HBM traffic) is ~ kb/BR-invariant in
    # theory, but smaller blocks shrink kb and with it the materialized
    # compare tensor; BR=2 measured fastest at 480x640/2048 (env override
    # for experiments)
    BR = int(_os.environ.get("VSLAM_COMPACT_BLOCK_ROWS", "2"))
    nb = -(-H // BR)
    Hp = nb * BR
    kb = max(n_sel // nb, 1)
    grad2 = dIx * dIx + dIy * dIy
    depth_valid = _depth_valid_3x3(depth)
    mask = grad2 >= min_gradient * min_gradient
    mask = mask & depth_valid

    ys = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
    z = jnp.where(depth_valid, depth, 0.0).astype(jnp.float32)
    planes = jnp.stack(
        [xs, ys, z, dIx.astype(jnp.float32), dIy.astype(jnp.float32),
         intensity.astype(jnp.float32)],
        axis=-1,
    )  # (H, W, 6); f32 keeps u/v/intensity sums exact through the matmul
    if Hp != H:
        planes = jnp.pad(planes, ((0, Hp - H), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, Hp - H), (0, 0)))
    M = BR * W
    mb = mask.reshape(nb, M)
    c = jnp.cumsum(mb.astype(jnp.int32), axis=1)  # per-block masked ranks
    # Uniformly STRIDED ranks per block: slot s takes the
    # floor(s * count / kb) + 1 -th masked pixel, so an over-budget block
    # thins its population evenly across the block (taking the FIRST kb
    # instead biases selection toward low column indices — measured as an
    # ATE regression on small-geometry replays). Under-budget blocks hit
    # each rank 1..count exactly once (duplicate ranks are masked), i.e.
    # they select every masked pixel, matching the dense path.
    cnt = c[:, -1]  # (nb,) masked population per block
    s_idx = jnp.arange(kb, dtype=jnp.int32)
    ranks = (s_idx[None, :] * cnt[:, None]) // kb + 1  # (nb, kb)
    dup = jnp.concatenate(
        [jnp.zeros((nb, 1), bool), ranks[:, 1:] == ranks[:, :-1]], axis=1
    )
    # masked pixels have unique cumsum values, so (c == r) & m is one-hot
    onehot = (c[:, None, :] == ranks[:, :, None]) & mb[:, None, :]
    sel = jax.lax.dot_general(
        onehot.astype(jnp.float32),
        planes.reshape(nb, M, 6),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nb, kb, 6)
    valid = ((cnt[:, None] >= ranks) & ~dup).reshape(-1)  # rank exists, once

    P = nb * kb
    sel = sel.reshape(P, 6)
    u = sel[:, 0].astype(dtype)
    v = sel[:, 1].astype(dtype)
    zs = jnp.where(valid, sel[:, 2], 0.0).astype(dtype)
    gx = sel[:, 3].astype(dtype)
    gy = sel[:, 4].astype(dtype)
    templ = sel[:, 5].astype(dtype)

    pcl = cam_mod.backproject(cam, jnp.stack([u, v], axis=-1), zs)
    Jw = _projection_jacobian(pcl, fx=cam.fx, fy=cam.fy)  # (P, 2, 6)
    J = gx[:, None] * Jw[..., 0, :] + gy[:, None] * Jw[..., 1, :]
    ok = valid & (pcl[..., 2] > 0.0)
    J = jnp.where(ok[:, None], J, 0.0)
    return ICLevelData(
        pcl=pcl,
        J=J,
        templ=templ,
        mask=ok,
        # count the rows that can actually contribute to A/b — on budget
        # overflow the dropped points must not deflate the normalized NE
        # (they would inflate covariance and shift the photometric-vs-prior
        # balance relative to the reference)
        n_constraints=jnp.sum(ok).astype(dtype),
    )


def _warp_visibility(data: ICLevelData, rel: SE3, image_shape, cam_cur: Camera):
    """Warp + projection + visibility for one or more frames (broadcasts
    over leading axes). Returns (u, v, visible)."""
    H, W = image_shape
    p_cur = se3.transform_points(rel if rel.t.ndim == 1 else SE3(rel.R[..., None, :, :], rel.t[..., None, :]), data.pcl)
    uv, z_ok = cam_mod.project(cam_cur, p_cur)
    u, v = uv[..., 0], uv[..., 1]
    visible = (
        data.mask
        & z_ok
        & (u > 1.0)
        & (u < W - 1.0)
        & (v > 1.0)
        & (v < H - 1.0)
    )
    return jnp.where(visible, u, 0.0), jnp.where(visible, v, 0.0), visible


def _frame_normal_equations(
    data: ICLevelData,
    rel: SE3,
    image_cur: jax.Array,  # (H, W)
    cam_cur: Camera,
    cfg: AlignmentConfig,
    x_pred: Optional[jax.Array],
    precomputed=None,  # optional (iwxp (P,), visible (P,)) from an external sampler
) -> NormalEquations:
    """NE of a single reference frame at the current relative pose.

    Mirrors InverseCompositional::computeNormalEquations
    (InverseCompositional.cpp:105-153) + MotionPrior::apply
    (SE3Alignment.cpp:37-47)."""
    H, W = image_cur.shape
    dtype = image_cur.dtype

    if precomputed is not None:
        iwxp, visible = precomputed
    else:
        u, v, visible = _warp_visibility(data, rel, (H, W), cam_cur)
        if cfg.interpolation == "bilinear":
            iwxp = img_ops.bilinear_sample(image_cur, u, v)
        else:
            iwxp = img_ops.nearest_sample(image_cur, u, v)
    r = jnp.where(visible, iwxp - data.templ, 0.0)

    if cfg.loss.function != "None":
        # Scale over the interest-point set (invisible entries contribute
        # r = 0, as in the reference, InverseCompositional.cpp:129-137).
        scale = loss_mod.compute_scale(cfg.loss, r, data.mask)
        r_std = (r - scale.offset) / scale.scale
        w = jnp.where(visible, loss_mod.compute_weights(cfg.loss, r_std), 0.0)
    else:
        w = visible.astype(dtype)

    Jw = data.J * w[:, None]
    A = Jw.T @ data.J
    b = Jw.T @ r
    chi2 = jnp.sum(w * r * r)
    return _normalize_prior(A, b, chi2, data.n_constraints, rel, cfg, x_pred, dtype)


def _normalize_prior(A, b, chi2, n, rel: SE3, cfg: AlignmentConfig, x_pred, dtype) -> NormalEquations:
    """NE normalization by the interest-point count
    (InverseCompositional.cpp:139-143) + the motion prior
    (SE3Alignment.cpp:37-47). Shared by the XLA and fused-Pallas paths."""
    inv_n = jnp.where(n > 1, 1.0 / jnp.maximum(n, 1.0), 1.0)
    A = A * inv_n
    b = b * inv_n
    chi2 = chi2 * inv_n

    if cfg.include_prior and x_pred is not None:
        # MotionPrior (SE3Alignment.cpp:37-47): photometric NE scaled by
        # 1/255^2, then a unit-information Gaussian prior on the predicted
        # relative pose. NOTE the sign: the IC solver applies updates
        # NEGATED (updateCompositional(-dx)), so pulling toward the
        # prediction requires b += (x - x_pred); the reference adds
        # (x_pred - x), which under its own negated update pushes AWAY from
        # the prediction — a latent sign bug that its fr2-scale photometric
        # term masks. We implement the correctly-signed prior.
        normalizer = 1.0 / (255.0 * 255.0)
        x = se3.log(rel)
        A = A * normalizer + cfg.prior_weight * jnp.eye(6, dtype=dtype)
        b = b * normalizer + cfg.prior_weight * (x - x_pred)

    return NormalEquations(A, b, chi2, n)


def _use_fused(cfg: AlignmentConfig) -> bool:
    return cfg.sampler == "fused" and cfg.loss.function == "None"


def _use_fused_sampling(cfg: AlignmentConfig) -> bool:
    """Robust losses with a fused-kernel sampler: sampling (the HBM-bound
    part) runs in the Pallas kernel, while the residual scale (median /
    t-dist fixed point — a global statistic) and the robust weighting run in
    XLA over the compact (P,) residual arrays, which are tiny."""
    return cfg.sampler in ("fused", "fused_gn") and cfg.loss.function != "None"


def level_normal_equations(
    data: ICLevelData,  # frame-batched: leaves (F, ...)
    rel: SE3,  # (F, 3, 3), (F, 3)
    image_cur: jax.Array,
    cam_cur: Camera,
    cfg: AlignmentConfig,
    x_pred: Optional[jax.Array],  # (F, 6)
    pack=None,  # optional fused_ne.FusedLevelPack (built once per level)
) -> NormalEquations:
    """Stacked NE: per-frame NEs summed (InverseCompositionalStacked.cpp:48-62)."""
    # The prior needs a MEAN: with x_pred=None there is nothing to pull
    # toward, so the prior must be OFF — statically, at trace time. (A zeros
    # placeholder substituted under vmap is a traced array, never None, so
    # gating on cfg.include_prior alone inside the lambda would
    # silently apply a unit-information prior toward zero relative motion.
    # solve_level_fused already gates this way; keep every sampler identical.)
    use_prior = bool(cfg.include_prior and x_pred is not None)
    xp = x_pred if x_pred is not None else jnp.zeros((data.J.shape[0], 6), image_cur.dtype)

    if _use_fused(cfg):
        from . import fused_ne

        dtype = data.templ.dtype
        if pack is None:
            pack = fused_ne.pack_level(data.pcl, data.J, data.templ, data.mask)
        img = image_cur
        if cfg.image_dtype == "bfloat16" and img.dtype != jnp.bfloat16:
            img = img.astype(jnp.bfloat16)
        interp = "bilinear" if cfg.interpolation == "bilinear" else "nearest"
        A, b, chi2, _ = fused_ne.fused_level_ne(pack, img, rel, cam_cur, interp)
        per_frame = jax.vmap(
            lambda A_f, b_f, c_f, n_f, g_f, x_f: _normalize_prior(
                A_f, b_f, c_f, n_f, g_f, cfg,
                x_f if use_prior else None, dtype,
            )
        )(A.astype(dtype), b.astype(dtype), chi2.astype(dtype), data.n_constraints, rel, xp)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), per_frame)

    if _use_fused_sampling(cfg):
        from . import fused_ne

        if pack is None:
            pack = fused_ne.pack_level(data.pcl, data.J, data.templ, data.mask)
        img = image_cur
        if cfg.image_dtype == "bfloat16" and img.dtype != jnp.bfloat16:
            img = img.astype(jnp.bfloat16)
        interp = "bilinear" if cfg.interpolation == "bilinear" else "nearest"
        iwxp, visible = fused_ne.fused_level_sample(pack, img, rel, cam_cur, interp)
        N = data.templ.shape[1]
        # the XLA-side scale/weight math stays in the template dtype (f32)
        # even when the kernel sampled a bf16 image copy
        dtype = data.templ.dtype
        iwxp = iwxp[:, :N].astype(dtype)
        visible = visible[:, :N]
        img_xla = image_cur.astype(dtype)
        per_frame = jax.vmap(
            lambda d, g, x, iw, vis: _frame_normal_equations(
                d, g, img_xla, cam_cur, cfg,
                x if use_prior else None, precomputed=(iw, vis),
            )
        )(data, rel, xp, iwxp, visible)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), per_frame)

    if cfg.sampler == "mxu":
        # sample ALL frames' points in one Pallas MXU pass (the current image
        # is shared across the stacked reference frames)
        from . import pallas_kernels as pk

        F, N = data.mask.shape
        u, v, visible = _warp_visibility(data, rel, image_cur.shape, cam_cur)
        iwxp = pk.bilinear_sample_mxu_single(
            image_cur, u.reshape(F * N), v.reshape(F * N)
        ).reshape(F, N)
        per_frame = jax.vmap(
            lambda d, g, x, iw, vis: _frame_normal_equations(
                d, g, image_cur, cam_cur, cfg,
                x if use_prior else None, precomputed=(iw, vis),
            )
        )(data, rel, xp, iwxp, visible)
    else:
        per_frame = jax.vmap(
            lambda d, g, x: _frame_normal_equations(
                d, g, image_cur, cam_cur, cfg, x if use_prior else None
            )
        )(data, rel, xp)
    return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), per_frame)


class _LevelState(NamedTuple):
    delta: SE3  # shared compositional update, applied right of every rel0


def solve_level(
    data: ICLevelData,
    rel0: SE3,  # (F,) batched initial relative transforms
    image_cur: jax.Array,
    cam_cur: Camera,
    cfg: AlignmentConfig,
    x_pred: Optional[jax.Array],
    record_iterations: bool = False,
) -> Tuple[SE3, SolverResult]:
    """One coarse-to-fine level: Gauss-Newton over the shared delta.

    All stacked frames receive the same compositional update
    (InverseCompositionalStacked::updateX broadcasts dx), i.e.
    rel_i = rel0_i . delta with one shared delta.

    ``record_iterations`` (static) records log(delta) per GN iteration for
    the visual-log replay; the in-kernel fused_gn solver keeps its history in
    SMEM rows without a per-iteration x, so recording runs the XLA loop.
    """
    dtype = image_cur.dtype

    if cfg.sampler == "fused_gn" and not record_iterations:
        # Whole-level GN as ONE kernel: per-pair early exit under vmap, zero
        # per-iteration XLA overhead (fused_solve.py). Covers all four
        # reference losses AND all three scalers — the scale statistics
        # (median / MAD rank bisection, mean, t-dist fixed point) run
        # in-kernel over VMEM-cached residuals.
        from .fused_solve import solve_level_fused

        return solve_level_fused(data, rel0, image_cur, cam_cur, cfg, x_pred)

    pack = None
    img_solve = image_cur
    if _use_fused(cfg) or _use_fused_sampling(cfg):
        # kernel operands packed ONCE per level, outside the GN while-loop
        # (the pack and the bf16 image copy are loop invariants)
        from . import fused_ne

        pack = fused_ne.pack_level(data.pcl, data.J, data.templ, data.mask)
        if cfg.image_dtype == "bfloat16":
            img_solve = image_cur.astype(jnp.bfloat16)

    def compute_ne(state: _LevelState) -> NormalEquations:
        rel = se3.compose(rel0, _broadcast(state.delta, rel0))
        return level_normal_equations(data, rel, img_solve, cam_cur, cfg, x_pred, pack=pack)

    def update_x(state: _LevelState, dx: jax.Array) -> _LevelState:
        # inverse-compositional: se3 <- se3 . exp(-dx)
        # (InverseCompositional.cpp:104 + Warp.cpp:153-157)
        d = se3.compose(state.delta, se3.exp(-dx))
        if cfg.orthonormalize:
            d = se3.orthonormalize(d)
        return _LevelState(d)

    x0 = _LevelState(se3.identity(dtype=dtype))
    result = solve_gauss_newton(
        compute_ne, update_x, x0, n_params=6, config=cfg.solver,
        encode_x=(lambda s: se3.log(s.delta)) if record_iterations else None,
    )
    rel_out = se3.compose(rel0, _broadcast(result.x.delta, rel0))
    return rel_out, result


def _broadcast(g: SE3, like: SE3) -> SE3:
    F = like.t.shape[0]
    return SE3(
        jnp.broadcast_to(g.R, (F, 3, 3)),
        jnp.broadcast_to(g.t, (F, 3)),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def iteration_images(
    data: ICLevelData,  # one level, leading F axis
    rel0_R: jax.Array,  # (F, 3, 3) level-entry relative transforms
    rel0_t: jax.Array,  # (F, 3)
    x_it: jax.Array,  # (6,) recorded log(delta) of one GN iteration
    image_cur: jax.Array,  # (H, W) current image at this level
    cam_cur: Camera,
    cfg: Optional[AlignmentConfig] = None,
):
    """Replay ONE recorded GN iteration into visual-log images.

    The reference emits warped image / residual / weights inside every GN
    iteration (InverseCompositional.cpp:149-151). On TPU the solve runs as a
    `lax.while_loop`, so instead of dragging image-sized buffers through the
    loop carry, the solver records the 6-dof state per iteration
    (SolverResult.x_history) and this function re-evaluates the residual pass
    at that state — one batched dispatch per logged iteration, only when a
    sink is enabled.

    Returns dict of (F, H, W): image_warped, residual, weights (the robust
    M-estimator weights when ``cfg`` carries a loss, else the visibility
    mask), scattered at the reference frames' interest pixels (background 0).
    """
    H, W = image_cur.shape
    if cfg is not None and cfg.normalize_intensity:
        # the solve ran in standardized photometric space; the replayed
        # residuals/weights must too (data's template is standardized by
        # aligner._level_data_jit via normalize_level)
        image_cur = _standardize(image_cur)
    rel0 = SE3(rel0_R, rel0_t)
    rel = se3.compose(rel0, _broadcast(se3.exp(x_it), rel0))
    u, v, visible = _warp_visibility(data, rel, (H, W), cam_cur)
    # replay with the SOLVER's sampling mode: in strict-parity nearest mode
    # the logged residuals must match the values that drove the solve
    sample = (
        img_ops.nearest_sample
        if cfg is not None and cfg.interpolation != "bilinear"
        else img_ops.bilinear_sample
    )
    iwxp = jax.vmap(lambda uu, vv: sample(image_cur, uu, vv))(u, v)
    r = jnp.where(visible, iwxp - data.templ, 0.0)

    if cfg is not None and cfg.loss.function != "None":
        def frame_w(r_f, m_f, vis_f):
            scale = loss_mod.compute_scale(cfg.loss, r_f, m_f)
            r_std = (r_f - scale.offset) / scale.scale
            return jnp.where(vis_f, loss_mod.compute_weights(cfg.loss, r_std), 0.0)

        weights = jax.vmap(frame_w)(r, data.mask, visible)
    else:
        weights = visible.astype(image_cur.dtype)

    # template pixel coords of each interest point (pcl is in the reference
    # camera frame; same rig as cur at this level)
    uv_t, _ = cam_mod.project(cam_cur, data.pcl)
    ui = jnp.clip(jnp.round(uv_t[..., 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv_t[..., 1]).astype(jnp.int32), 0, H - 1)

    def scatter(vals, mask):
        def one(vals_f, m_f, ui_f, vi_f):
            img = jnp.zeros((H, W), vals.dtype)
            vv = jnp.where(m_f, vals_f, 0.0)
            # masked-out points all collapse onto pixel (0,0); overwrite it
            # with 0 afterward rather than branch per point
            return img.at[vi_f, ui_f].add(vv).at[0, 0].set(0.0)

        return jax.vmap(one)(vals, mask, jnp.where(mask, ui, 0), jnp.where(mask, vi, 0))

    return {
        "image_warped": scatter(iwxp, visible),
        "residual": scatter(r, visible),
        "weights": scatter(weights, data.mask),
    }


def align(
    ref_frames: Optional[Frame],  # pytree with leading frame axis F on every leaf
    cur_frame: Frame,
    rel_init: SE3,  # (F,) initial cur<-ref transforms (prediction-based)
    x_pred: Optional[jax.Array],  # (F, 6) prior means log(pred . ref^-1)
    cfg: AlignmentConfig,
    with_diagnostics: bool = False,
    ref_data: Optional[Tuple[ICLevelData, ...]] = None,
    record_iterations: bool = False,
):
    """Full coarse-to-fine alignment (SE3Alignment.cpp:106-146 multi-frame).

    Returns ``(rel (F,), covariance (6,6), valid)``. ``rel[0]`` corresponds to
    the first reference frame; pose_cur = rel[0] . pose_ref0 (the reference
    reads warps[0]->poseCur(), SE3Alignment.cpp:142-143).

    Covariance = A^-1 of the final accepted NE (SE3Alignment.cpp:101).

    ``with_diagnostics=True`` (a Python-static flag) appends a dict of
    per-level solver telemetry — chi2/step_size (L, max_iterations) history
    buffers plus accepted-iteration counts, coarsest level first — the
    LOG_PLT("SolverGN") payload (reference GaussNewton.cpp:100).

    ``ref_data``, when given, supplies the per-level :class:`ICLevelData`
    (leading frame axis F on every leaf, indexed 0 = finest) and skips the
    precompute entirely — the sequential scan caches the keyframe's and last
    frame's data across steps (see :func:`precompute_frame`). ``ref_frames``
    may then be None (cameras are taken from ``cur_frame`` — same rig, the
    standing assumption of the stacked problem).
    """
    n_levels = len(ref_data) if ref_data is not None else len(ref_frames.intensity)
    rel = rel_init
    cov = jnp.eye(6, dtype=cur_frame.intensity[0].dtype)
    valid_any = jnp.asarray(False)
    hist_chi2, hist_step, hist_iters = [], [], []
    hist_x, hist_rel0_R, hist_rel0_t = [], [], []
    for level in range(n_levels - 1, -1, -1):
        if ref_data is not None:
            data = ref_data[level]
        else:
            # per-frame cameras are identical across the F axis (same rig);
            # take frame 0's intrinsics as scalars.
            cam_ref = Camera(*(jnp.reshape(c, (-1,))[0] for c in ref_frames.cameras[level]))
            budget = cfg.max_points >> (2 * level) if cfg.max_points else 0
            inten_r = ref_frames.intensity[level]
            dIx_r, dIy_r = ref_frames.dIx[level], ref_frames.dIy[level]
            if cfg.normalize_intensity:
                # per-frame standardization along the F axis (see
                # precompute_frame); gradients scaled by the same factor
                inten_r, dIx_r, dIy_r = normalize_level(inten_r, dIx_r, dIy_r)
            data = precompute_level(
                inten_r,
                dIx_r,
                dIy_r,
                ref_frames.depth[level],
                cam_ref,
                cfg.min_gradient,
                max_points=budget,
            )
        cam_cur = cur_frame.cameras[level]
        if record_iterations:
            hist_rel0_R.append(rel.R)
            hist_rel0_t.append(rel.t)
        image_cur = cur_frame.intensity[level]
        if cfg.normalize_intensity:
            image_cur = _standardize(image_cur)
        rel, result = solve_level(
            data, rel, image_cur, cam_cur, cfg, x_pred,
            record_iterations=record_iterations,
        )
        cov = jnp.where(result.valid, inv_psd(result.A), cov)
        valid_any = valid_any | result.valid
        if with_diagnostics or record_iterations:
            hist_chi2.append(result.chi2_history)
            hist_step.append(result.step_history)
            hist_iters.append(result.iterations)
        if record_iterations:
            hist_x.append(result.x_history)
    if with_diagnostics or record_iterations:
        diag = {
            "chi2": jnp.stack(hist_chi2),
            "step_size": jnp.stack(hist_step),
            "iterations": jnp.stack(hist_iters),
        }
        if record_iterations:
            # per-level GN trace for the visual-log replay: each level's
            # entry rel (rel0) + log(delta) per evaluated iteration,
            # coarsest level first (the solve order)
            diag["x_log"] = jnp.stack(hist_x)  # (L, max_iter, 6)
            diag["rel0_R"] = jnp.stack(hist_rel0_R)  # (L, F, 3, 3)
            diag["rel0_t"] = jnp.stack(hist_rel0_t)  # (L, F, 3)
        return rel, cov, valid_any, diag
    return rel, cov, valid_any
