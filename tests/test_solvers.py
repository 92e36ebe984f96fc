"""Loss/scaler unit tests (mirroring reference `test_loss.cpp`) and
Gauss-Newton behavior tests against closed-form least-squares."""

import jax.numpy as jnp
import numpy as np
import pytest

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
