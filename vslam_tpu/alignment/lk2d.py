"""2-D Lucas-Kanade variants: optical-flow (translation) and affine warps,
inverse-compositional and forward-additive.

Rebuild of the reference's WarpAffine / WarpOpticalFlow
(`lukas_kanade/src/Warp.cpp:23-103`) and ForwardAdditive
(`ForwardAdditive.cpp`) as dense masked problems sharing the framework's
Gauss-Newton solver. Warp parameterizations match the reference:

- optical flow: 2 params (tx, ty); W(u,v) = (u+tx, v+ty); J = I_2
- affine: 6 params; W = [[1+p0, p2, p4], [p1, 1+p3, p5]] (u,v,1)^T;
  J = [[u-cx, 0, v-cy, 0, 1, 0], [0, u-cx, 0, v-cy, 0, 1]]
  (the reference centers the Jacobian at the principal point, Warp.cpp:50-55)

IC mode precomputes steepest-descent rows from the template gradients and
applies compositional updates W <- W . W(dx)^-1 (exact matrix composition —
the reference's parameter-space update formula, Warp.cpp:33-43, is the same
product written out). FA mode rebuilds J each iteration from warped image
gradients and updates additively (ForwardAdditive.cpp:35,51-72), with
r = T - I(W(x)) (note the opposite residual sign vs IC).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import image as img_ops
from ..solvers import loss as loss_mod
from ..solvers.gauss_newton import SolverConfig, SolverResult, solve_gauss_newton
from ..solvers.normal_equations import NormalEquations

__all__ = ["Lk2dConfig", "align_optical_flow", "align_affine"]


@dataclasses.dataclass(frozen=True)
class Lk2dConfig:
    min_gradient: float = 0.0
    solver: SolverConfig = SolverConfig(max_iterations=50, min_step_size=1e-7)
    loss: loss_mod.LossConfig = loss_mod.LossConfig("None")
    method: str = "inverse_compositional"  # or "forward_additive"


def _affine_matrix(p: jax.Array) -> jax.Array:
    """3x3 warp matrix from 6 params (Warp.cpp:60-66 toMat)."""
    one = jnp.ones((), p.dtype)
    zero = jnp.zeros((), p.dtype)
    return jnp.stack(
        [
            jnp.stack([1.0 + p[0], p[2], p[4]]),
            jnp.stack([p[1], 1.0 + p[3], p[5]]),
            jnp.stack([zero, zero, one]),
        ]
    )


def _affine_params(W: jax.Array) -> jax.Array:
    return jnp.stack([W[0, 0] - 1.0, W[1, 0], W[0, 1], W[1, 1] - 1.0, W[0, 2], W[1, 2]])


def _grid(templ):
    H, W = templ.shape
    ys = jnp.broadcast_to(jnp.arange(H, dtype=templ.dtype)[:, None], (H, W)).reshape(-1)
    xs = jnp.broadcast_to(jnp.arange(W, dtype=templ.dtype)[None, :], (H, W)).reshape(-1)
    return xs, ys


def _masked_ne(J, r, vis, interest, loss_cfg, n):
    """Weighted NE over the visible set. The robust-loss SCALE is computed
    over the FULL interest-point residual vector (r = 0 at currently
    invisible points), matching the reference and the SE(3) path
    (InverseCompositional.cpp:105-137; ic._frame_normal_equations passes
    data.mask) — scaling over the visible subset only would weight outliers
    differently than the aligner these 2-D baselines cross-check."""
    dtype = r.dtype
    if loss_cfg.function != "None":
        scale = loss_mod.compute_scale(loss_cfg, r, interest)
        w = jnp.where(vis, loss_mod.compute_weights(loss_cfg, (r - scale.offset) / scale.scale), 0.0)
    else:
        w = vis.astype(dtype)
    Jw = J * w[:, None]
    A = Jw.T @ J
    b = Jw.T @ r
    chi2 = jnp.sum(w * r * r)
    inv_n = jnp.where(n > 1, 1.0 / jnp.maximum(n, 1.0), 1.0)
    return NormalEquations(A * inv_n, b * inv_n, chi2 * inv_n, n)


def _interest_mask(dTx, dTy, min_gradient):
    g = jnp.sqrt(dTx * dTx + dTy * dTy)
    return (g >= min_gradient).reshape(-1)


def align_optical_flow(
    templ: jax.Array,
    image: jax.Array,
    x0: Optional[jax.Array] = None,
    cfg: Lk2dConfig = Lk2dConfig(),
) -> Tuple[jax.Array, SolverResult]:
    """Recover the translation warping `templ` into `image`. Returns
    (flow (2,), solver result)."""
    H, W = templ.shape
    dtype = templ.dtype
    dTx = img_ops.sobel_x(img_ops.gaussian_blur_3x3(templ)) / 8.0
    dTy = img_ops.sobel_y(img_ops.gaussian_blur_3x3(templ)) / 8.0
    xs, ys = _grid(templ)
    mask0 = _interest_mask(dTx, dTy, cfg.min_gradient)
    n0 = jnp.sum(mask0).astype(dtype)
    t_flat = templ.reshape(-1)

    if cfg.method == "inverse_compositional":
        J = jnp.stack([dTx.reshape(-1), dTy.reshape(-1)], axis=-1)
        J = jnp.where(mask0[:, None], J, 0.0)

        def compute_ne(p):
            u = xs + p[0]
            v = ys + p[1]
            vis = mask0 & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
            iw = img_ops.bilinear_sample(image, jnp.where(vis, u, 0.0), jnp.where(vis, v, 0.0))
            r = jnp.where(vis, iw - t_flat, 0.0)
            return _masked_ne(J, r, vis, mask0, cfg.loss, n0)

        def update(p, dx):
            return p - dx  # compositional for pure translation = subtract

    else:  # forward_additive
        dIx = img_ops.sobel_x(img_ops.gaussian_blur_3x3(image)) / 8.0
        dIy = img_ops.sobel_y(img_ops.gaussian_blur_3x3(image)) / 8.0

        def compute_ne(p):
            u = xs + p[0]
            v = ys + p[1]
            vis = mask0 & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
            us = jnp.where(vis, u, 0.0)
            vs = jnp.where(vis, v, 0.0)
            gx = img_ops.bilinear_sample(dIx, us, vs)
            gy = img_ops.bilinear_sample(dIy, us, vs)
            J = jnp.where(vis[:, None], jnp.stack([gx, gy], axis=-1), 0.0)
            iw = img_ops.bilinear_sample(image, us, vs)
            r = jnp.where(vis, t_flat - iw, 0.0)  # FA residual T - I(W)
            return _masked_ne(J, r, vis, mask0, cfg.loss, n0)

        def update(p, dx):
            return p + dx

    x_init = x0 if x0 is not None else jnp.zeros(2, dtype)
    res = solve_gauss_newton(compute_ne, update, x_init, n_params=2, config=cfg.solver)
    return res.x, res


def align_affine(
    templ: jax.Array,
    image: jax.Array,
    x0: Optional[jax.Array] = None,
    cfg: Lk2dConfig = Lk2dConfig(),
) -> Tuple[jax.Array, SolverResult]:
    """Recover the 6-param affine warp W(p) mapping template pixels into the
    image: I(W(p)(u, v)) ~= T(u, v). Returns (params (6,), solver result)."""
    H, W = templ.shape
    dtype = templ.dtype
    cx, cy = W / 2.0, H / 2.0
    dTx = img_ops.sobel_x(img_ops.gaussian_blur_3x3(templ)) / 8.0
    dTy = img_ops.sobel_y(img_ops.gaussian_blur_3x3(templ)) / 8.0
    xs, ys = _grid(templ)
    mask0 = _interest_mask(dTx, dTy, cfg.min_gradient)
    n0 = jnp.sum(mask0).astype(dtype)
    t_flat = templ.reshape(-1)

    # warp Jacobian columns centered at the principal point (Warp.cpp:50-55)
    uc = xs - cx
    vc = ys - cy

    def warp_uv(p):
        Wm = _affine_matrix(p)
        u = Wm[0, 0] * xs + Wm[0, 1] * ys + Wm[0, 2]
        v = Wm[1, 0] * xs + Wm[1, 1] * ys + Wm[1, 2]
        return u, v

    def _rows(gx, gy):
        return jnp.stack([gx * uc, gy * uc, gx * vc, gy * vc, gx, gy], axis=-1)

    if cfg.method == "inverse_compositional":
        # steepest-descent rows J = dT . Jw, precomputed once from the
        # template gradients (InverseCompositional.cpp:50-59)
        J = jnp.where(mask0[:, None], _rows(dTx.reshape(-1), dTy.reshape(-1)), 0.0)

        def compute_ne(p):
            u, v = warp_uv(p)
            vis = mask0 & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
            iw = img_ops.bilinear_sample(image, jnp.where(vis, u, 0.0), jnp.where(vis, v, 0.0))
            r = jnp.where(vis, iw - t_flat, 0.0)
            return _masked_ne(J, r, vis, mask0, cfg.loss, n0)

        def update(p, dx):
            # inverse-compositional: W(p) <- W(p) . W(dx)^-1 (exact composition)
            Wp = _affine_matrix(p)
            Wd = _affine_matrix(dx)
            return _affine_params(Wp @ jnp.linalg.inv(Wd))

    else:  # forward_additive (ForwardAdditive.cpp:51-90)
        dIx = img_ops.sobel_x(img_ops.gaussian_blur_3x3(image)) / 8.0
        dIy = img_ops.sobel_y(img_ops.gaussian_blur_3x3(image)) / 8.0

        def compute_ne(p):
            u, v = warp_uv(p)
            vis = mask0 & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
            us = jnp.where(vis, u, 0.0)
            vs = jnp.where(vis, v, 0.0)
            # J rebuilt each iteration from IMAGE gradients at the warped
            # coordinates, times the warp Jacobian at the template pixel
            gx = img_ops.bilinear_sample(dIx, us, vs)
            gy = img_ops.bilinear_sample(dIy, us, vs)
            J = jnp.where(vis[:, None], _rows(gx, gy), 0.0)
            iw = img_ops.bilinear_sample(image, us, vs)
            r = jnp.where(vis, t_flat - iw, 0.0)  # FA residual T - I(W)
            return _masked_ne(J, r, vis, mask0, cfg.loss, n0)

        def update(p, dx):
            return p + dx

    x_init = x0 if x0 is not None else jnp.zeros(6, dtype)
    res = solve_gauss_newton(compute_ne, update, x_init, n_params=6, config=cfg.solver)
    return res.x, res
