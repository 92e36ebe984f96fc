"""Gauss-Newton and Levenberg-Marquardt as `lax.while_loop` solvers.

Rebuild of reference `least_squares/src/GaussNewton.cpp:33-102` with its exact
guard/rollback semantics, re-expressed as a single jit-compiled while loop
over an arbitrary pytree optimization state (the reference's virtual
`Problem` interface becomes a pair of closures):

  - ``compute_ne(x) -> NormalEquations`` (the hot dense kernel)
  - ``update_x(x, dx) -> x`` (e.g. compositional SE(3) update with -dx)

Guard semantics mirrored from the reference:
  * stop if nConstraints < nParameters            (GaussNewton.cpp:53-58)
  * stop if det(A) non-finite or |det| < 1e-6     (GaussNewton.cpp:59-63)
  * stop if chi2 increased vs previous iteration; the "rollback" keeps the
    pre-iteration x (the reference's setX(row(i-1)) restores exactly that
    value, GaussNewton.cpp:70-75)
  * converged if i>0 and (|dx| < minStepSize or |max(b)| < minGradient or
    |dChi2| < minReduction)                        (GaussNewton.cpp:86-91)
    — note max(b), not max|b|: reference uses b.maxCoeff()
  * NaN step: restore pre-iteration x and stop     (GaussNewton.cpp:93-98)

The final covariance input is A of the last *accepted* normal equations
(SE3Alignment.cpp:101 inverts exactly that matrix).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .linalg6 import cholesky_logdet_solve, cholesky_solve
from .normal_equations import NormalEquations

__all__ = ["SolverConfig", "SolverResult", "solve_gauss_newton", "solve_levenberg_marquardt"]


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Mirrors the reference GaussNewton ctor (GaussNewton.cpp:25-31):
    minGradient and minReduction default to minStepSize, as the reference's
    NodeMapping wiring does (solver.min_step_size / solver.max_iterations)."""

    max_iterations: int = 100
    min_step_size: float = 1e-11
    min_gradient: float | None = None
    min_reduction: float | None = None
    # TPU/f32 extension (no reference equivalent): also stop when the chi2
    # improvement falls below this FRACTION of the current chi2. The
    # reference's absolute thresholds are tuned for f64 and are unreachable
    # in f32, so without this the loop always burns its full budget. None
    # disables (strict parity).
    min_relative_reduction: float | None = None

    @property
    def _min_gradient(self) -> float:
        return self.min_step_size if self.min_gradient is None else self.min_gradient

    @property
    def _min_reduction(self) -> float:
        return self.min_step_size if self.min_reduction is None else self.min_reduction


class SolverResult(NamedTuple):
    x: Any  # final optimization state (pytree)
    A: jax.Array  # (N, N) last accepted normal-equation matrix
    b: jax.Array
    chi2: jax.Array
    iterations: jax.Array  # number of completed (accepted) iterations
    valid: jax.Array  # bool: at least one iteration was accepted
    # per-iteration history (reference Solver::Results records chi2/stepSize/x
    # per iteration, Solver.h:40-56, consumed by PlotGaussNewton). Fixed
    # length = config.max_iterations; entries beyond `iterations` are NaN.
    chi2_history: jax.Array
    step_history: jax.Array
    # (max_iterations, K) encoded state at which each iteration's NE was
    # evaluated (only when the caller passed encode_x; None otherwise). Feeds
    # the per-iteration visual-log replay (ic.iteration_images).
    x_history: Any = None


class _Carry(NamedTuple):
    x: Any
    chi2_prev: jax.Array
    A_last: jax.Array
    b_last: jax.Array
    i: jax.Array
    pushed: jax.Array  # accepted-iteration count
    done: jax.Array
    chi2_hist: jax.Array
    step_hist: jax.Array
    x_hist: Any  # (max_iterations, K) or None


def _select_tree(pred, a, b):
    return jax.tree_util.tree_map(
        lambda u, v: jnp.where(pred, u, v), a, b
    )


def solve_gauss_newton(
    compute_ne: Callable[[Any], NormalEquations],
    update_x: Callable[[Any, jax.Array], Any],
    x0: Any,
    n_params: int,
    config: SolverConfig = SolverConfig(),
    encode_x: Callable[[Any], jax.Array] | None = None,
) -> SolverResult:
    """``encode_x``, when given, maps the optimization state to a flat (K,)
    vector recorded per evaluated iteration (the reference stores x per row of
    Solver::Results, Solver.h:46); the history comes back as
    ``SolverResult.x_history`` for post-hoc replay (per-iteration visual
    logs) without burdening the while-loop with image-sized buffers."""
    ne0 = jax.eval_shape(compute_ne, x0)
    dtype = ne0.A.dtype

    def body(c: _Carry) -> _Carry:
        ne = compute_ne(c.x)
        # unrolled Cholesky: solve + determinant in one straight-line pass
        # (jnp.linalg.det/solve lower to sequential LU while-loops on TPU)
        # log-domain determinant: the raw det overflows f32 for large
        # Jacobians (close-range depth) and would spuriously abort systems
        # the reference's f64 det guard accepts (GaussNewton.cpp:59-63)
        dx, logdet = cholesky_logdet_solve(ne.A, ne.b)
        stop_constraints = ne.n < n_params
        stop_det = ~jnp.isfinite(logdet) | (logdet < jnp.log(1e-6))
        chi2_increased = (c.pushed > 0) & (ne.chi2 > c.chi2_prev)
        abort = stop_constraints | stop_det | chi2_increased
        step = jnp.linalg.norm(dx)
        nan_step = ~jnp.isfinite(step)
        x_new = update_x(c.x, dx)

        d_chi2 = jnp.abs(ne.chi2 - c.chi2_prev)
        converged = (c.pushed > 0) & (
            (step < config.min_step_size)
            | (jnp.abs(jnp.max(ne.b)) < config._min_gradient)
            | (d_chi2 < config._min_reduction)
        )
        if config.min_relative_reduction is not None:
            converged = converged | (
                (c.pushed > 0)
                & (d_chi2 < config.min_relative_reduction * jnp.abs(ne.chi2))
            )

        # a NaN step is NOT an accepted iteration: x rolls back (reference
        # GaussNewton.cpp:93-98), and A/b/chi2/pushed must keep the last
        # truly-accepted state — otherwise the returned covariance comes
        # from the NaN-producing NE while valid still reads True
        accepted = ~abort & ~nan_step
        # on abort or NaN keep the pre-iteration x
        keep_old = abort | nan_step
        x_next = _select_tree(keep_old, c.x, x_new)
        A_next = jnp.where(accepted, ne.A, c.A_last)
        b_next = jnp.where(accepted, ne.b, c.b_last)
        chi2_next = jnp.where(accepted, ne.chi2, c.chi2_prev)
        pushed_next = c.pushed + jnp.where(accepted, 1, 0)
        done = abort | nan_step | converged
        # iteration telemetry (chi2/step recorded for every evaluated
        # iteration, like the reference's r->chi2(i)/stepSize(i))
        chi2_hist = c.chi2_hist.at[c.i].set(ne.chi2)
        step_hist = c.step_hist.at[c.i].set(step)
        x_hist = None if encode_x is None else c.x_hist.at[c.i].set(encode_x(c.x))
        return _Carry(
            x_next, chi2_next, A_next, b_next, c.i + 1, pushed_next, done,
            chi2_hist, step_hist, x_hist,
        )

    def cond(c: _Carry) -> jax.Array:
        return (~c.done) & (c.i < config.max_iterations)

    n = ne0.A.shape[-1]
    init = _Carry(
        x=x0,
        chi2_prev=jnp.asarray(jnp.inf, dtype),
        A_last=jnp.eye(n, dtype=dtype),
        b_last=jnp.zeros((n,), dtype),
        i=jnp.asarray(0, jnp.int32),
        pushed=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        chi2_hist=jnp.full((config.max_iterations,), jnp.nan, dtype),
        step_hist=jnp.full((config.max_iterations,), jnp.nan, dtype),
        x_hist=(
            None
            if encode_x is None
            else jnp.full(
                (config.max_iterations,) + jax.eval_shape(encode_x, x0).shape,
                jnp.nan,
                dtype,
            )
        ),
    )
    out = lax.while_loop(cond, body, init)
    return SolverResult(
        x=out.x,
        A=out.A_last,
        b=out.b_last,
        chi2=out.chi2_prev,
        iterations=out.pushed,
        valid=out.pushed > 0,
        chi2_history=out.chi2_hist,
        step_history=out.step_hist,
        x_history=out.x_hist,
    )


def solve_levenberg_marquardt(
    compute_ne: Callable[[Any], NormalEquations],
    update_x: Callable[[Any, jax.Array], Any],
    x0: Any,
    n_params: int,
    config: SolverConfig = SolverConfig(),
    lambda0: float = 1e-3,
    lambda_up: float = 10.0,
    lambda_down: float = 0.1,
    max_lambda: float = 1e6,
) -> SolverResult:
    """Levenberg-Marquardt with multiplicative damping on diag(A).

    The reference ships only Gauss-Newton in `least_squares` (its visuals
    module has a leftover LM plot type); LM is provided here as the more
    robust option for the BA backend and as a solver-API extension.
    """
    ne0 = jax.eval_shape(compute_ne, x0)
    dtype = ne0.A.dtype
    n = ne0.A.shape[-1]

    class CarryLM(NamedTuple):
        x: Any
        ne: NormalEquations  # NE linearized at x (reused across rejections)
        lam: jax.Array
        i: jax.Array
        pushed: jax.Array
        done: jax.Array
        chi2_hist: jax.Array
        step_hist: jax.Array

    def body(c: CarryLM) -> CarryLM:
        # ONE compute_ne per iteration: the NE at the current x rides the
        # carry, and the trial point's NE doubles as both the acceptance
        # check (its chi2) and the next linearization — the standard LM
        # structure (a rejected trial re-dampens the CARRIED NE, no re-
        # linearization needed).
        stop_constraints = c.ne.n < n_params
        damped = c.ne.A + c.lam * jnp.diag(jnp.diagonal(c.ne.A))
        dx = cholesky_solve(damped, c.ne.b)
        x_new = update_x(c.x, dx)
        ne_new = compute_ne(x_new)
        improved = ne_new.chi2 < c.ne.chi2
        step = jnp.linalg.norm(dx)
        nan_step = ~jnp.isfinite(step) | ~jnp.isfinite(ne_new.chi2)

        accept = improved & ~nan_step & ~stop_constraints
        x_next = _select_tree(accept, x_new, c.x)
        ne_next = _select_tree(accept, ne_new, c.ne)
        lam_next = jnp.where(
            accept,
            jnp.maximum(c.lam * lambda_down, 1e-12),
            jnp.minimum(c.lam * lambda_up, max_lambda),
        )
        converged = accept & (step < config.min_step_size)
        # saturated lambda stops the solver only when the trial at that
        # lambda was REJECTED (an accepted step at max_lambda is live
        # progress; lambda is about to decrease)
        done = stop_constraints | converged | (~accept & (c.lam >= max_lambda))
        return CarryLM(
            x_next,
            ne_next,
            lam_next,
            c.i + 1,
            c.pushed + jnp.where(accept, 1, 0),
            done,
            c.chi2_hist.at[c.i].set(ne_new.chi2),
            c.step_hist.at[c.i].set(step),
        )

    def cond(c: CarryLM) -> jax.Array:
        return (~c.done) & (c.i < config.max_iterations)

    init = CarryLM(
        x=x0,
        ne=compute_ne(x0),
        lam=jnp.asarray(lambda0, dtype),
        i=jnp.asarray(0, jnp.int32),
        pushed=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        chi2_hist=jnp.full((config.max_iterations,), jnp.nan, dtype),
        step_hist=jnp.full((config.max_iterations,), jnp.nan, dtype),
    )
    out = lax.while_loop(cond, body, init)
    return SolverResult(
        x=out.x,
        A=out.ne.A,
        b=out.ne.b,
        chi2=out.ne.chi2,
        iterations=out.pushed,
        valid=out.pushed > 0,
        chi2_history=out.chi2_hist,
        step_history=out.step_hist,
    )
