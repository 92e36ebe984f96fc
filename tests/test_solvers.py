"""Loss/scaler unit tests (mirroring reference `test_loss.cpp`) and
Gauss-Newton behavior tests against closed-form least-squares."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)

from vslam_tpu.solvers import (
    LossConfig,
    SolverConfig,
    loss,
    normal_equations as ne_mod,
    solve_gauss_newton,
    solve_levenberg_marquardt,
)


def test_tukey_weight_closed_form():
    c = loss.TUKEY_C
    # center: weight 1
    assert float(loss.tukey_weight(jnp.float32(0.0))) == pytest.approx(1.0)
    # outliers beyond C are cut off entirely (Loss.cpp:49-63)
    assert float(loss.tukey_weight(jnp.float32(c + 0.1))) == 0.0
    assert float(loss.tukey_weight(jnp.float32(-c - 5.0))) == 0.0
    # interior matches (1-(r/c)^2)^2
    r = 2.0
    want = (1 - (r / c) ** 2) ** 2
    assert float(loss.tukey_weight(jnp.float32(r))) == pytest.approx(want, rel=1e-5)


def test_huber_weight_reference_semantics():
    # inside: 1; outside: reference returns 1/|r| (Loss.cpp:65-72)
    assert float(loss.huber_weight(jnp.float32(0.5))) == 1.0
    assert float(loss.huber_weight(jnp.float32(4.0))) == pytest.approx(0.25)
    assert float(loss.huber_weight(jnp.float32(-4.0))) == pytest.approx(0.25)


def test_t_dist_weight():
    v = 5.0
    assert float(loss.t_dist_weight(jnp.float32(0.0), v)) == pytest.approx((v + 1) / v)
    assert float(loss.t_dist_weight(jnp.float32(2.0), v)) == pytest.approx(6.0 / 9.0)


def test_median_scale():
    r = jnp.asarray([1.0, 2.0, 3.0, 4.0, 100.0])
    mask = jnp.ones(5, bool)
    s = loss.compute_scale(LossConfig("Tukey"), r, mask)
    assert float(s.offset) == 3.0
    # sqrt(sum|r-3|/(n-1)) = sqrt((2+1+0+1+97)/4)
    assert float(s.scale) == pytest.approx(np.sqrt(101 / 4), rel=1e-5)


def test_t_dist_scale_converges():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_t(5, size=2000).astype(np.float32))
    s = loss.compute_scale(LossConfig("tdistribution"), r, jnp.ones(2000, bool))
    assert float(s.offset) == 0.0
    assert 0.7 < float(s.scale) < 1.4  # sigma of unit t-dist residuals


def _reference_gauss_newton(compute_ne_np, update_np, x0, n_params, max_iterations, min_step_size):
    """Transparent numpy re-enactment of the reference solver's exact control
    flow (GaussNewton.cpp:33-102): per iteration compute NE -> record chi2 ->
    guards (nConstraints, det >= 1e-6, chi2 regression rollback) -> ldlt
    solve -> updateX -> convergence on stepSize / maxCoeff(b) / dChi2 -> NaN
    rollback. Returns (x, chi2_history list)."""
    x = np.array(x0, np.float64)
    chi2s = []
    chi2_prev = np.inf
    x_prev = x.copy()
    for i in range(max_iterations):
        A, b, chi2, n = compute_ne_np(x)
        chi2s.append(chi2)
        if n < n_params:
            break
        det = np.linalg.det(A)
        if not np.isfinite(det) or abs(det) < 1e-6:
            break
        if i > 0 and chi2 > chi2_prev:
            x = x_prev.copy()  # rollback (GaussNewton.cpp:70-75)
            break
        dx = np.linalg.solve(A, b)
        x_prev = x.copy()
        x = update_np(x, dx)
        d_chi2 = abs(chi2 - chi2_prev)
        chi2_prev = chi2
        step = np.linalg.norm(dx)
        if not np.isfinite(step):
            x = x_prev.copy()
            break
        if i > 0 and (step < min_step_size or abs(np.max(b)) < min_step_size or d_chi2 < min_step_size):
            break
    return x, chi2s


def test_gn_iterates_match_reference_semantics():
    """Numeric parity: our lax.while_loop GN must produce the same iterate
    sequence (chi2 per iteration, accepted count, final x) as a line-by-line
    numpy re-enactment of GaussNewton.cpp:33-102 on a small nonlinear
    problem (damped update -> several distinct iterations)."""
    t = np.linspace(0.0, 1.0, 8)
    rng = np.random.default_rng(4)
    # noise floors chi2 well above f32 epsilon so f64/f32 histories compare
    y = np.exp(0.9 * t) + 0.3 + rng.normal(0, 0.01, t.shape)

    def ne_np(params):
        a, b = params
        pred = np.exp(a * t) + b
        r = pred - y
        J = np.stack([t * np.exp(a * t), np.ones_like(t)], axis=1)
        return J.T @ J, J.T @ r, float(r @ r), len(t)

    def upd_np(params, dx):
        return params - 0.5 * dx  # damped: forces a multi-iteration trajectory

    x_ref, chi2_ref = _reference_gauss_newton(
        ne_np, upd_np, [0.0, 0.0], 2, max_iterations=25, min_step_size=1e-6
    )

    tj = jnp.asarray(t, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)

    def ne_jax(params):
        pred = jnp.exp(params[0] * tj) + params[1]
        r = pred - yj
        J = jnp.stack([tj * jnp.exp(params[0] * tj), jnp.ones_like(tj)], axis=1)
        return ne_mod.NormalEquations(J.T @ J, J.T @ r, jnp.sum(r * r), jnp.asarray(8.0))

    res = solve_gauss_newton(
        ne_jax,
        lambda x, dx: x - 0.5 * dx,
        jnp.zeros(2, jnp.float32),
        2,
        SolverConfig(max_iterations=25, min_step_size=1e-6),
    )
    chi2_jax = np.asarray(res.chi2_history, np.float64)
    n_jax = int(np.sum(np.isfinite(chi2_jax)))
    # identical iterate trajectory; the stop iteration may differ by one when
    # the threshold crossing lands within f32 rounding of the f64 model
    assert abs(n_jax - len(chi2_ref)) <= 1, (n_jax, len(chi2_ref))
    m = min(n_jax, len(chi2_ref))
    assert m >= 5  # a real multi-iteration trajectory, not a trivial match
    np.testing.assert_allclose(chi2_jax[:m], chi2_ref[:m], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x_ref, rtol=5e-3, atol=1e-3)


def _linear_problem(a_true=2.0, b_true=-1.0, n=50):
    rng = np.random.default_rng(1)
    x = rng.uniform(-2, 2, n).astype(np.float32)
    y = (a_true * x + b_true).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def compute_ne(params):
        pred = params[0] * xj + params[1]
        r = yj - pred
        J = jnp.stack([xj, jnp.ones_like(xj)], axis=1)
        return ne_mod.build(J, r, jnp.ones_like(r))

    def update(params, dx):
        return params + dx

    return compute_ne, update


def test_gauss_newton_linear_fit():
    compute_ne, update = _linear_problem()
    res = solve_gauss_newton(
        compute_ne, update, jnp.zeros(2, jnp.float32), n_params=2,
        config=SolverConfig(max_iterations=20, min_step_size=1e-9),
    )
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.x), [2.0, -1.0], atol=1e-4)
    assert int(res.iterations) <= 6  # linear problem converges almost immediately


def test_gauss_newton_insufficient_constraints():
    """nConstraints < nParameters must stop without producing a step
    (GaussNewton.cpp:53-58)."""

    def compute_ne(params):
        J = jnp.ones((1, 2), jnp.float32)
        r = jnp.ones((1,), jnp.float32)
        return ne_mod.build(J, r, jnp.ones((1,), jnp.float32))

    res = solve_gauss_newton(
        compute_ne, lambda p, dx: p + dx, jnp.zeros(2, jnp.float32), n_params=2
    )
    assert not bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_gauss_newton_singular_hessian_stops():
    """|det A| < 1e-6 aborts (GaussNewton.cpp:59-63)."""

    def compute_ne(params):
        J = jnp.stack([jnp.ones(10, jnp.float32), jnp.ones(10, jnp.float32)], axis=1)
        r = jnp.ones(10, jnp.float32)
        return ne_mod.build(J, r, jnp.ones(10, jnp.float32))

    res = solve_gauss_newton(
        compute_ne, lambda p, dx: p + dx, jnp.zeros(2, jnp.float32), n_params=2
    )
    assert not bool(res.valid)


def test_levenberg_marquardt_nonlinear():
    """LM on an exponential-decay fit y = exp(-k x)."""
    x = jnp.linspace(0, 3, 40)
    k_true = 1.3
    y = jnp.exp(-k_true * x)

    def compute_ne(params):
        pred = jnp.exp(-params[0] * x)
        r = y - pred
        J = (-x * pred)[:, None]  # J = d pred / d k = -x exp(-kx)
        return ne_mod.build(J, r, jnp.ones_like(r))

    res = solve_levenberg_marquardt(
        compute_ne, lambda p, dx: p + dx, jnp.asarray([0.2], jnp.float32),
        n_params=1, config=SolverConfig(max_iterations=50, min_step_size=1e-10),
    )
    assert bool(res.valid)
    assert float(res.x[0]) == pytest.approx(k_true, abs=1e-3)


def test_normal_equations_combine():
    J = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    r = jnp.asarray([1.0, 2.0])
    w = jnp.ones(2)
    ne1 = ne_mod.build(J, r, w)
    ne2 = ne_mod.build(J, 2 * r, w)
    tot = ne_mod.combine([ne1, ne2])
    np.testing.assert_allclose(np.asarray(tot.A), 2 * np.eye(2))
    np.testing.assert_allclose(np.asarray(tot.b), [3.0, 6.0])
    assert float(tot.n) == 4.0


def test_nan_first_iteration_not_accepted():
    """A NaN residual pass on iteration 0 must leave the solver INVALID:
    x rolls back (GaussNewton.cpp:93-98) and A/b/chi2/iterations must keep
    the last truly-accepted state — previously the NaN-producing NE was
    stored and valid read True."""
    def compute_ne(x):
        A = jnp.eye(2, dtype=jnp.float32)
        b = jnp.array([jnp.nan, jnp.nan], jnp.float32)
        return ne_mod.NormalEquations(
            A, b, jnp.asarray(jnp.nan, jnp.float32), jnp.asarray(100.0)
        )

    res = solve_gauss_newton(
        compute_ne, lambda x, dx: x - dx, jnp.zeros(2, jnp.float32), n_params=2,
        config=SolverConfig(max_iterations=5, min_step_size=1e-9),
    )
    assert not bool(res.valid)
    assert int(res.iterations) == 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0)
    assert np.all(np.isfinite(np.asarray(res.A))), "A must keep the accepted (init) state"


def test_rank_deficient_large_scale_hessian_aborts():
    """An EXACTLY rank-deficient A (duplicated constraint direction — e.g.
    every interest point collinear) whose healthy pivots are huge has a huge
    det: the reference's absolute |det| >= 1e-6 guard passes on sheer scale
    and the solve would step enormously along the unobservable direction.
    The factorization's relative-pivot degeneracy flag must drive the guard
    value to -inf. (A true sub-eps eigenvalue is indistinguishable from f32
    rounding noise and falls to the chi2 rollback instead — see
    linalg6._chol_factor.)"""
    from vslam_tpu.solvers.linalg6 import cholesky_logdet_solve

    rng = np.random.default_rng(0)
    # duplicated-direction construction: last pivot cancels exactly or goes
    # negative in f32, so the degeneracy flag must fire
    U = np.linalg.qr(rng.normal(size=(6, 6)))[0].astype(np.float32)
    A_dup = (U * np.float32(1e8)) @ U.T
    A_dup[5, :] = A_dup[4, :]
    A_dup[:, 5] = A_dup[:, 4]
    _, logdet_dup = cholesky_logdet_solve(
        jnp.asarray(A_dup), jnp.ones(6, jnp.float32)
    )
    assert np.asarray(logdet_dup) == -np.inf, np.asarray(logdet_dup)

    # a merely ill-conditioned (condition 1e6) but full-rank system at the
    # same scale must still pass the guard
    eigs_ok = np.array([1e8, 1e8, 1e8, 1e8, 1e8, 1e2])
    A_ok = (U.astype(np.float64) * eigs_ok) @ U.T.astype(np.float64)
    _, logdet_ok = cholesky_logdet_solve(
        jnp.asarray(A_ok, jnp.float32), jnp.ones(6, jnp.float32)
    )
    assert np.isfinite(np.asarray(logdet_ok))
    np.testing.assert_allclose(
        np.asarray(logdet_ok), np.linalg.slogdet(A_ok)[1], rtol=1e-3
    )


def test_mean_scaler_dispatch():
    """LossConfig(scaler="mean") dispatches to the reference MeanScaler
    (Scaler.cpp:37-47): mean offset + L1-based pseudo-std (previously
    _mean_scale existed but no config value reached it)."""
    r = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 100.0], np.float32))
    mask = jnp.ones(5, bool)
    cfg = LossConfig("Huber", scaler="mean")
    scale = loss.compute_scale(cfg, r, mask)
    mean = 22.0
    dev = np.abs(np.array([1, 2, 3, 4, 100.0]) - mean).sum()
    np.testing.assert_allclose(float(scale.offset), mean, rtol=1e-6)
    np.testing.assert_allclose(float(scale.scale), np.sqrt(dev / 4.0), rtol=1e-5)
