"""Whole-level Gauss-Newton solver as ONE Pallas TPU kernel.

The reference's entire `GaussNewton::solve` over an `InverseCompositional`
problem (`GaussNewton.cpp:33-102` + `InverseCompositional.cpp:105-153`) runs
on-chip as a single kernel instance per frame-pair: the iteration
`while_loop`, the residual/Gram passes (`fused_ne._gram_chunk`), the 6x6
Cholesky solve, the guard/rollback logic and the compositional SE(3) update
all execute without returning to XLA between iterations.

Why this beats the per-iteration fused-NE kernel:
- Per-pair early exit. Under `vmap`, an XLA `while_loop` runs every pair for
  the *maximum* iteration count in the batch; here each grid step (pair)
  stops at its own convergence — batched cost scales with the *mean*.
- Zero per-iteration launch/HLO overhead: the ~30 small XLA ops per GN
  iteration (compose, Cholesky, norms, history scatter) become straight-line
  scalar-core code between the vector passes.

The 6-dof linear algebra runs on f32 scalars (registers / scalar core):
unrolled Cholesky with the determinant guard (mirroring
`solvers/linalg6.py`), Rodrigues exp and the SE(3) log via polynomial series
(valid for inter-frame rotations below ~pi/2 — always true for tracking;
the XLA path in `ic.solve_level` remains the general fallback and the
semantics oracle, tested against this kernel).

Guard semantics mirrored 1:1 from `solvers/gauss_newton.solve_gauss_newton`
(itself mirroring GaussNewton.cpp:53-98): constraint-count stop, |det|>=1e-6
stop, chi2-regression rollback to the pre-iteration x, step/gradient/
reduction convergence from the second iteration, NaN-step restore-and-stop.
Per-iteration chi2/step telemetry is recorded in-kernel into two SMEM
history rows (Solver::Results parity, Solver.h:40-56).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.platform import pallas_interpret

from ..core.camera import Camera
from ..core.se3 import SE3
from ..solvers.loss import TUKEY_C
from .fused_ne import _CHUNK, _gram_chunk, _sample_chunk, pack_level

__all__ = ["solve_level_fused"]


# ---------------------------------------------------------------------------
# Scalar SE(3) helpers (tuples of traced f32 scalars; straight-line code)
# ---------------------------------------------------------------------------


def _mat3_mul(a, b):
    """Row-major 9-tuples: (a @ b)."""
    return tuple(
        a[3 * i + 0] * b[3 * 0 + j] + a[3 * i + 1] * b[3 * 1 + j] + a[3 * i + 2] * b[3 * 2 + j]
        for i in range(3)
        for j in range(3)
    )


def _mat3_vec(a, v):
    return tuple(a[3 * i] * v[0] + a[3 * i + 1] * v[1] + a[3 * i + 2] * v[2] for i in range(3))


def _se3_exp(xi):
    """Scalar Rodrigues/V-matrix exp (se3.exp); series coefficients
    A = sin t/t, B = (1-cos t)/t^2, C = (t-sin t)/t^3 as polynomials in t^2
    (f32-exact below |t| ~ 1; GN steps are far smaller)."""
    rho = xi[:3]
    wx, wy, wz = xi[3], xi[4], xi[5]
    t2 = wx * wx + wy * wy + wz * wz
    A = 1.0 - t2 / 6.0 + t2 * t2 / 120.0 - t2 * t2 * t2 / 5040.0
    B = 0.5 - t2 / 24.0 + t2 * t2 / 720.0 - t2 * t2 * t2 / 40320.0
    C = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0 - t2 * t2 * t2 / 362880.0
    # W and W^2 entries (row-major)
    W = (0.0, -wz, wy, wz, 0.0, -wx, -wy, wx, 0.0)
    W2 = _mat3_mul(W, W)
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    R = tuple(eye[k] + A * W[k] + B * W2[k] for k in range(9))
    V = tuple(eye[k] + B * W[k] + C * W2[k] for k in range(9))
    return R, _mat3_vec(V, rho)


def _se3_log(R, t):
    """Scalar SE(3) log via series (se3.log); valid for theta < ~pi/2 —
    the tracking regime the motion prior operates in."""
    v0 = R[7] - R[5]  # R[2,1]-R[1,2]
    v1 = R[2] - R[6]  # R[0,2]-R[2,0]
    v2 = R[3] - R[1]  # R[1,0]-R[0,1]
    s2 = 0.25 * (v0 * v0 + v1 * v1 + v2 * v2)  # sin^2 theta
    # theta/(2 sin theta) = asin(s)/(2 s) = 0.5 (1 + s^2/6 + 3 s^4/40 + 15 s^6/336)
    factor = 0.5 * (1.0 + s2 / 6.0 + 3.0 * s2 * s2 / 40.0 + 15.0 * s2 * s2 * s2 / 336.0)
    phi = (factor * v0, factor * v1, factor * v2)
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    cot = 1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0
    W = (0.0, -phi[2], phi[1], phi[2], 0.0, -phi[0], -phi[1], phi[0], 0.0)
    W2 = _mat3_mul(W, W)
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    Vinv = tuple(eye[k] - 0.5 * W[k] + cot * W2[k] for k in range(9))
    rho = _mat3_vec(Vinv, t)
    return rho + phi


def _orthonormalize(R):
    """Column Gram-Schmidt, mirroring se3.orthonormalize (columns r0, r1)."""
    c0 = (R[0], R[3], R[6])
    c1 = (R[1], R[4], R[7])

    def norm3(v):
        return jnp.sqrt(jnp.maximum(v[0] * v[0] + v[1] * v[1] + v[2] * v[2], 1e-24))

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2], a[0] * b[1] - a[1] * b[0])

    n0 = norm3(c0)
    x = (c0[0] / n0, c0[1] / n0, c0[2] / n0)
    z = cross(x, c1)
    nz = norm3(z)
    z = (z[0] / nz, z[1] / nz, z[2] / nz)
    y = cross(z, x)
    return (x[0], y[0], z[0], x[1], y[1], z[1], x[2], y[2], z[2])


def _chol6(A, b):
    """Unrolled scalar Cholesky solve + det (mirrors linalg6.cholesky_det_solve:
    clamped pivots keep the straight-line code finite; the det guard rejects
    indefinite systems)."""
    N = 6
    L = [[None] * N for _ in range(N)]
    scale = A[0][0]
    for j in range(1, N):
        scale = jnp.maximum(scale, A[j][j])
    bad = ~jnp.isfinite(scale)
    for j in range(N):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # relative degeneracy test (mirrors linalg6._chol_factor): a rank-
        # deficient A with large healthy pivots has a huge det, so the
        # absolute guard alone would accept it and the solve would step
        # along the unobservable direction
        bad = bad | (s <= 1e-10 * scale)
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, N):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # log-domain determinant (raw det overflows f32 for close-range depth;
    # the reference's f64 guard accepts those systems, GaussNewton.cpp:59-63)
    logdet = jnp.log(L[0][0])
    for j in range(1, N):
        logdet = logdet + jnp.log(L[j][j])
    logdet = jnp.where(bad, -jnp.inf, 2.0 * logdet)
    y = [None] * N
    for i in range(N):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * N
    for i in reversed(range(N)):
        s = y[i]
        for k in range(i + 1, N):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x), logdet


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

# params row layout per frame (f32): [R0 (9), t0 (3), x_pred (6), n_constraints,
# fx, fy, cx, cy] = 23 used, padded to 32
_PROW = 32
# out layout (f32, SMEM): [A (36), b (6), chi2, pushed, valid, delta R (9),
# delta t (3)] = 57, padded to the 128 lane tile (Mosaic requires the last
# dim of a vmap-batched block to align to 128)
_OUT = 128
# per-iteration chi2/step history rows (lane-tile length; iterations beyond
# _HIST simply stop being recorded)
_HIST = 128


def _solve_impl(params_ref, geom_ref, jt_ref, img_ref, out_ref_2d,
                chist_ref, shist_ref, r_buf, vis_buf, *,
                H, W, F, nc, band, interp, include_prior, prior_weight,
                max_iterations, min_step_size, min_gradient, min_reduction,
                min_relative_reduction, orthonormalize,
                loss_kind, scaler_kind, huber_c, tdist_v):
    out_ref = out_ref_2d.at[0]
    frames = []
    for f in range(F):
        R0 = tuple(params_ref[f, k] for k in range(9))
        t0 = tuple(params_ref[f, 9 + k] for k in range(3))
        xp = tuple(params_ref[f, 12 + k] for k in range(6))
        n_f = params_ref[f, 18]
        frames.append((R0, t0, xp, n_f))
    fx, fy, cx, cy = (params_ref[0, 19 + k] for k in range(4))

    n_total = frames[0][3]
    for f in range(1, F):
        n_total = n_total + frames[f][3]

    def _robust_weight(r_std):
        """Vectorized M-estimator weight — mirrors solvers.loss.compute_weights
        (incl. the reference Huber 1/|r| outlier quirk, Loss.cpp:65-72)."""
        if loss_kind == 1:  # Huber
            a = jnp.abs(r_std)
            return jnp.where(a < huber_c, 1.0, 1.0 / jnp.maximum(a, 1e-30))
        if loss_kind == 2:  # Tukey (Loss.cpp:49-63)
            rc = r_std / TUKEY_C
            w = jnp.square(1.0 - rc * rc)
            return jnp.where(jnp.abs(r_std) < TUKEY_C, w, jnp.zeros_like(w))
        # t-distribution (Loss.cpp:92)
        return (tdist_v + 1.0) / (tdist_v + r_std * r_std)

    def _masked_vals(f, c):
        """Cached residuals + the frame's interest mask for chunk c: scale
        statistics run over the full interest set with r = 0 at currently-
        invisible points (InverseCompositional.cpp:129-137 semantics)."""
        m = geom_ref[f, c][4, :] > 0.0
        r = r_buf[f, c].reshape(_CHUNK)
        return m, r

    def _scale_tdist(f, n_f):
        """ScalerTDistribution fixed point (Scaler.cpp:49-67), identical
        constants to solvers.loss._t_dist_scale."""
        n_safe = jnp.maximum(n_f, 1.0)

        def cond(s):
            _, step, it = s
            return (it < 30) & (step > 1e-5)

        def body(s):
            sigma, _, it = s
            sigma2 = jnp.maximum(sigma * sigma, 1e-24)
            acc = jnp.float32(0.0)
            for c in range(nc):
                m, r = _masked_vals(f, c)
                r2 = jnp.where(m, r * r, 0.0)
                acc = acc + jnp.sum(r2 * (tdist_v + 1.0) / (tdist_v + r2 / sigma2))
            sigma_new = jnp.sqrt(acc / n_safe)
            return sigma_new, jnp.abs(sigma - sigma_new), it + 1

        sigma, _, _ = jax.lax.while_loop(
            cond, body, (jnp.float32(1.0), jnp.float32(jnp.inf), jnp.int32(0))
        )
        return jnp.float32(0.0), jnp.maximum(sigma, 1e-12)

    def _masked_median(f, n_f, value):
        """Masked median of value(r) over the frame's interest set, as a rank
        selection via value-domain bisection over the cached residuals (24
        halvings of the [min, max] bracket -> ~3e-5 intensity-unit precision,
        far below the sensor's quantization step); two ranks are averaged
        exactly like core.image.masked_median. `value` maps the cached
        residual chunk to the statistic's domain (identity for the median of
        r, |r - med| for the MAD deviation pass)."""
        mn, mx = jnp.float32(jnp.inf), jnp.float32(-jnp.inf)
        for c in range(nc):
            m, r = _masked_vals(f, c)
            v = value(r)
            mn = jnp.minimum(mn, jnp.min(jnp.where(m, v, jnp.inf)))
            mx = jnp.maximum(mx, jnp.max(jnp.where(m, v, -jnp.inf)))
        empty = ~(mx >= mn)  # no masked entries
        mn = jnp.where(empty, 0.0, mn)
        mx = jnp.where(empty, 0.0, mx)

        def count_le(x):
            acc = jnp.float32(0.0)
            for c in range(nc):
                m, r = _masked_vals(f, c)
                acc = acc + jnp.sum(jnp.where(m & (value(r) <= x), 1.0, 0.0))
            return acc

        def rank_value(k):  # k-th smallest (0-indexed), k an f32 scalar
            def bis(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                below = count_le(mid) >= k + 1.0
                return (jnp.where(below, lo, mid), jnp.where(below, mid, hi))

            lo, hi = jax.lax.fori_loop(0, 24, bis, (mn, mx))
            return hi

        k_lo = jnp.maximum(jnp.floor((n_f - 1.0) * 0.5), 0.0)
        k_hi = jnp.maximum(jnp.floor(n_f * 0.5), 0.0)
        med = 0.5 * (rank_value(k_lo) + rank_value(k_hi))
        return jnp.where(n_f > 0, med, 0.0)

    def _scale_median(f, n_f):
        """MedianScaler (Scaler.cpp:21-35): offset = median, scale =
        sqrt(sum|r - med| / (n - 1))."""
        med = _masked_median(f, n_f, lambda r: r)
        dev = jnp.float32(0.0)
        for c in range(nc):
            m, r = _masked_vals(f, c)
            dev = dev + jnp.sum(jnp.where(m, jnp.abs(r - med), 0.0))
        std = jnp.sqrt(dev / jnp.maximum(n_f - 1.0, 1.0))
        std = jnp.where(std > 0, std, jnp.float32(1.0))
        return med, std

    def _scale_mad(f, n_f):
        """Extension MAD scaler (solvers.loss._mad_scale): offset = median,
        sigma = 1.4826 * median|r - med| — two rank bisections over the same
        cached residuals."""
        med = _masked_median(f, n_f, lambda r: r)
        mad = _masked_median(f, n_f, lambda r: jnp.abs(r - med))
        sigma = 1.4826 * mad
        sigma = jnp.where(sigma > 1e-6, sigma, jnp.float32(1.0))
        return med, sigma

    def _scale_mean(f, n_f):
        """MeanScaler (Scaler.cpp:37-47), identical formulas to
        solvers.loss._mean_scale (empty set -> offset 0, scale 1)."""
        n_safe = jnp.maximum(n_f, 1.0)
        acc = jnp.float32(0.0)
        for c in range(nc):
            m, r = _masked_vals(f, c)
            acc = acc + jnp.sum(jnp.where(m, r, 0.0))
        mean = acc / n_safe
        dev = jnp.float32(0.0)
        for c in range(nc):
            m, r = _masked_vals(f, c)
            dev = dev + jnp.sum(jnp.where(m, jnp.abs(r - mean), 0.0))
        std = jnp.sqrt(dev / jnp.maximum(n_f - 1.0, 1.0))
        empty = n_f < 1.0
        mean = jnp.where(empty, 0.0, mean)
        std = jnp.where(empty | (std <= 0), jnp.float32(1.0), std)
        return mean, std

    def compute_ne(Rd, td):
        """Stacked, normalized NE at delta: A (6x6 nested tuple), b (6), chi2."""
        A_s = [[jnp.float32(0.0)] * 6 for _ in range(6)]
        b_s = [jnp.float32(0.0)] * 6
        chi2_s = jnp.float32(0.0)
        for f in range(F):
            R0, t0, xp, n_f = frames[f]
            R = _mat3_mul(R0, Rd)
            t = tuple(_mat3_vec(R0, td)[i] + t0[i] for i in range(3))
            scal = R + t + (fx, fy, cx, cy)
            if loss_kind == 0:
                G = _gram_chunk(geom_ref[f, 0], jt_ref[f, 0], img_ref, scal, H, W, interp, band)
                for c in range(1, nc):
                    G = G + _gram_chunk(
                        geom_ref[f, c], jt_ref[f, c], img_ref, scal, H, W, interp, band
                    )
            else:
                # Robust losses: two passes per iteration over VMEM-cached
                # residuals. Pass A warps/samples once and caches r; the
                # global scale statistic (median bisection or t-dist fixed
                # point) then re-reads the cache — never re-sampling — and
                # pass B is the weighted Gram accumulation.
                for c in range(nc):
                    iwxp, visible, templ = _sample_chunk(
                        geom_ref[f, c], img_ref, scal, H, W, interp, band
                    )
                    r = jnp.where(visible, iwxp - templ, 0.0)
                    r_buf[f, c] = r.reshape(8, 128)
                    vis_buf[f, c] = visible.astype(jnp.float32).reshape(8, 128)
                if loss_kind == 3:
                    # tdistribution pairs with its own fixed-point scale
                    # regardless of the scaler setting (NodeMapping.cpp:73-84,
                    # solvers.loss.compute_scale)
                    offset, sigma = _scale_tdist(f, n_f)
                elif scaler_kind == 1:
                    offset, sigma = _scale_mad(f, n_f)
                elif scaler_kind == 2:
                    offset, sigma = _scale_mean(f, n_f)
                else:
                    offset, sigma = _scale_median(f, n_f)
                G = jnp.zeros((8, 8), jnp.float32)
                for c in range(nc):
                    r = r_buf[f, c].reshape(_CHUNK)
                    vis = vis_buf[f, c].reshape(_CHUNK)
                    w = vis * _robust_weight((r - offset) / sigma)
                    right = jnp.concatenate(
                        [jt_ref[f, c][:6, :], r.reshape(1, _CHUNK),
                         jnp.ones((1, _CHUNK), jnp.float32)], axis=0
                    )
                    left = right * w.reshape(1, _CHUNK)
                    G = G + jax.lax.dot_general(
                        left, right, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            # extract scalars; symmetrize like the XLA path's 0.5 (G + G^T)
            inv_n = jnp.where(n_f > 1, 1.0 / jnp.maximum(n_f, 1.0), 1.0)
            A_f = [[0.5 * (G[i, j] + G[j, i]) * inv_n for j in range(6)] for i in range(6)]
            b_f = [G[i, 6] * inv_n for i in range(6)]
            chi2_f = G[6, 6] * inv_n
            if include_prior:
                # MotionPrior (SE3Alignment.cpp:37-47) with the corrected
                # sign (see ic._normalize_prior)
                x = _se3_log(R, t)
                nrm = jnp.float32(1.0 / (255.0 * 255.0))
                for i in range(6):
                    for j in range(6):
                        A_f[i][j] = A_f[i][j] * nrm
                    A_f[i][i] = A_f[i][i] + prior_weight
                    b_f[i] = b_f[i] * nrm + prior_weight * (x[i] - xp[i])
            for i in range(6):
                for j in range(6):
                    A_s[i][j] = A_s[i][j] + A_f[i][j]
                b_s[i] = b_s[i] + b_f[i]
            chi2_s = chi2_s + chi2_f
        return A_s, b_s, chi2_s

    # initial out: identity A, zero b (solve_gauss_newton's init carry);
    # history rows NaN-filled like SolverResult's fixed-length buffers
    for k in range(36):
        out_ref[k] = jnp.float32(1.0 if k % 7 == 0 else 0.0)
    for k in range(36, 42):
        out_ref[k] = jnp.float32(0.0)
    for k in range(_HIST):
        chist_ref[0, k] = jnp.float32(jnp.nan)
        shist_ref[0, k] = jnp.float32(jnp.nan)

    def cond(carry):
        i, pushed, done, chi2_prev, Rd, td = carry
        return (~done) & (i < max_iterations)

    def body(carry):
        i, pushed, done, chi2_prev, Rd, td = carry
        A, b, chi2 = compute_ne(Rd, td)
        dx, logdet = _chol6(A, b)

        stop_constraints = n_total < 6.0
        stop_det = ~jnp.isfinite(logdet) | (logdet < jnp.log(1e-6))
        chi2_increased = (pushed > 0) & (chi2 > chi2_prev)
        abort = stop_constraints | stop_det | chi2_increased

        step2 = dx[0] * dx[0]
        for k in range(1, 6):
            step2 = step2 + dx[k] * dx[k]
        step = jnp.sqrt(step2)
        nan_step = ~jnp.isfinite(step)

        # compositional update delta <- delta . exp(-dx)
        Re, te = _se3_exp(tuple(-d for d in dx))
        R_new = _mat3_mul(Rd, Re)
        t_new = tuple(_mat3_vec(Rd, te)[k] + td[k] for k in range(3))
        if orthonormalize:
            R_new = _orthonormalize(R_new)

        # per-iteration telemetry (Solver::Results chi2/stepSize buffers,
        # Solver.h:40-56): dynamic scalar stores into the SMEM history rows
        @pl.when(i < _HIST)
        def _():
            chist_ref[0, i] = chi2
            shist_ref[0, i] = step

        b_max = b[0]
        for k in range(1, 6):
            b_max = jnp.maximum(b_max, b[k])
        d_chi2 = jnp.abs(chi2 - chi2_prev)
        converged = (pushed > 0) & (
            (step < min_step_size)
            | (jnp.abs(b_max) < min_gradient)
            | (d_chi2 < min_reduction)
        )
        if min_relative_reduction is not None:
            converged = converged | ((pushed > 0) & (d_chi2 < min_relative_reduction * jnp.abs(chi2)))

        # a NaN step is NOT an accepted iteration (mirrors
        # solvers.gauss_newton): x rolls back AND A/b/chi2/pushed keep the
        # last truly-accepted state
        accepted = ~abort & ~nan_step
        keep_old = abort | nan_step
        Rd_next = tuple(jnp.where(keep_old, Rd[k], R_new[k]) for k in range(9))
        td_next = tuple(jnp.where(keep_old, td[k], t_new[k]) for k in range(3))
        chi2_next = jnp.where(accepted, chi2, chi2_prev)

        @pl.when(accepted)
        def _():
            for r_ in range(6):
                for c_ in range(6):
                    out_ref[6 * r_ + c_] = A[r_][c_]
                out_ref[36 + r_] = b[r_]

        return (
            i + 1,
            pushed + jnp.where(accepted, 1, 0).astype(jnp.int32),
            abort | nan_step | converged,
            chi2_next,
            Rd_next,
            td_next,
        )

    eye = tuple(jnp.float32(1.0 if k % 4 == 0 else 0.0) for k in range(9))
    zero3 = tuple(jnp.float32(0.0) for _ in range(3))
    init = (jnp.int32(0), jnp.int32(0), jnp.asarray(False), jnp.float32(jnp.inf), eye, zero3)
    i, pushed, done, chi2_prev, Rd, td = jax.lax.while_loop(cond, body, init)

    out_ref[42] = chi2_prev
    out_ref[43] = pushed.astype(jnp.float32)
    out_ref[44] = (pushed > 0).astype(jnp.float32)
    for k in range(9):
        out_ref[45 + k] = Rd[k]
    for k in range(3):
        out_ref[54 + k] = td[k]
    for k in range(57, _OUT):
        out_ref[k] = jnp.float32(0.0)


def _solve_kernel(params_ref, geom_ref, jt_ref, img_ref, out_ref_2d,
                  chist_ref, shist_ref, **kw):
    """Quadratic-loss entry: no residual scratch."""
    _solve_impl(params_ref, geom_ref, jt_ref, img_ref, out_ref_2d,
                chist_ref, shist_ref, None, None, **kw)


def _solve_kernel_robust(params_ref, geom_ref, jt_ref, img_ref, out_ref_2d,
                         chist_ref, shist_ref, r_buf, vis_buf, **kw):
    """Robust-loss entry: residual + visibility VMEM scratch (cached across
    the per-iteration scale and weighted-Gram passes)."""
    _solve_impl(params_ref, geom_ref, jt_ref, img_ref, out_ref_2d,
                chist_ref, shist_ref, r_buf, vis_buf, **kw)


# ---------------------------------------------------------------------------
# XLA wrapper
# ---------------------------------------------------------------------------


def solve_level_fused(
    data,  # ICLevelData, frame-batched leaves (F, ...)
    rel0: SE3,  # (F, 3, 3), (F, 3)
    image_cur: jax.Array,
    cam_cur: Camera,
    cfg,  # AlignmentConfig
    x_pred: Optional[jax.Array],  # (F, 6)
):
    """Drop-in replacement for ic.solve_level running the whole level in one
    kernel. Returns (rel_out (F,), SolverResult-compatible tuple fields).
    Composes with vmap (the batch axis becomes the kernel grid: every pair
    iterates to ITS OWN convergence)."""
    from ..solvers.gauss_newton import SolverResult
    from .ic import _LevelState

    F = rel0.t.shape[0]
    dtype = data.templ.dtype
    pack = pack_level(data.pcl, data.J, data.templ, data.mask)
    nc = pack.geom.shape[1]
    H, W = image_cur.shape
    img = image_cur
    if cfg.image_dtype == "bfloat16":
        img = img.astype(jnp.bfloat16)
    from .fused_ne import _BAND

    band = _BAND if H > _BAND else 0
    if band:
        img = jnp.pad(img, ((0, band), (0, 0)))

    xp = x_pred if x_pred is not None else jnp.zeros((F, 6), jnp.float32)
    params = jnp.zeros((F, _PROW), jnp.float32)
    params = params.at[:, 0:9].set(rel0.R.reshape(F, 9).astype(jnp.float32))
    params = params.at[:, 9:12].set(rel0.t.reshape(F, 3).astype(jnp.float32))
    params = params.at[:, 12:18].set(xp.astype(jnp.float32))
    params = params.at[:, 18].set(data.n_constraints.astype(jnp.float32))
    params = params.at[:, 19:23].set(
        jnp.broadcast_to(
            jnp.stack([cam_cur.fx, cam_cur.fy, cam_cur.cx, cam_cur.cy]).astype(jnp.float32),
            (F, 4),
        )
    )

    s = cfg.solver
    loss_kind = {"None": 0, "Huber": 1, "Tukey": 2, "tdistribution": 3}[cfg.loss.function]
    scaler_kind = {"reference": 0, "mad": 1, "mean": 2}[cfg.loss.scaler]
    kernel = functools.partial(
        _solve_kernel if loss_kind == 0 else _solve_kernel_robust,
        H=H, W=W, F=F, nc=nc, band=band,
        interp="bilinear" if cfg.interpolation == "bilinear" else "nearest",
        include_prior=bool(cfg.include_prior and x_pred is not None),
        prior_weight=float(cfg.prior_weight),
        max_iterations=int(s.max_iterations),
        min_step_size=float(s.min_step_size),
        min_gradient=float(s._min_gradient),
        min_reduction=float(s._min_reduction),
        min_relative_reduction=(
            None if s.min_relative_reduction is None else float(s.min_relative_reduction)
        ),
        orthonormalize=bool(cfg.orthonormalize),
        loss_kind=loss_kind,
        scaler_kind=scaler_kind,
        huber_c=float(cfg.loss.huber_c),
        tdist_v=float(cfg.loss.tdistribution_v),
    )
    out = pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        # outputs are 2-D (1, N): under vmap the batch dim is squeezed onto
        # the front and the TPU lowering requires the last two block dims to
        # equal the array dims — 1-D blocks would violate that
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, _OUT), jnp.float32),
            jax.ShapeDtypeStruct((1, _HIST), jnp.float32),
            jax.ShapeDtypeStruct((1, _HIST), jnp.float32),
        ],
        scratch_shapes=(
            []
            if loss_kind == 0
            else [
                pltpu.VMEM((F, nc, 8, 128), jnp.float32),
                pltpu.VMEM((F, nc, 8, 128), jnp.float32),
            ]
        ),
    )(params, pack.geom, pack.jt, img)
    out, chist, shist = out[0][0], out[1][0], out[2][0]

    A = out[0:36].reshape(6, 6).astype(dtype)
    b = out[36:42].astype(dtype)
    chi2 = out[42].astype(dtype)
    iterations = out[43].astype(jnp.int32)
    valid = out[44] > 0.0
    Rd = out[45:54].reshape(3, 3).astype(dtype)
    td = out[54:57].astype(dtype)

    from ..core import se3 as se3_mod

    delta = SE3(Rd, td)
    rel_out = se3_mod.compose(rel0, SE3(jnp.broadcast_to(Rd, (F, 3, 3)), jnp.broadcast_to(td, (F, 3))))

    # fixed-length history buffers matching the XLA path's SolverResult
    # (Solver.h:40-56 telemetry; NaN beyond the recorded iterations)
    n_it = int(s.max_iterations)
    def to_hist(row):
        if n_it <= _HIST:
            return row[:n_it].astype(dtype)
        return jnp.concatenate([row, jnp.full((n_it - _HIST,), jnp.nan, row.dtype)]).astype(dtype)

    result = SolverResult(
        x=_LevelState(delta),
        A=A, b=b, chi2=chi2, iterations=iterations, valid=valid,
        chi2_history=to_hist(chist), step_history=to_hist(shist),
    )
    return rel_out, result
