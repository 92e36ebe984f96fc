"""Observability tests: visual-log registry, debug images, perf timers
(reference LOG_IMG/TIMED_SCOPE roles, SURVEY §5)."""

import numpy as np

from vslam_tpu.utils import log as log_mod
from vslam_tpu.utils import timer


def test_log_image_null_object_by_default(tmp_path):
    sink = log_mod.log_img("TestSinkOff")
    sink.log(np.ones((4, 4)))  # disabled -> no-op, no files
    assert sink._ctr == 0


def test_log_image_saves_when_enabled(tmp_path):
    sink = log_mod.log_img("TestSinkOn")
    sink.enabled = True
    sink.save_dir = str(tmp_path)
    captured = []
    sink.callback = lambda name, arr: captured.append((name, arr.shape))
    sink << np.ones((4, 6))
    sink << np.zeros((4, 6))
    import os

    assert len(os.listdir(tmp_path)) == 2
    assert captured == [("TestSinkOn", (4, 6)), ("TestSinkOn", (4, 6))]
    assert "TestSinkOn" in log_mod.registered_image_logs()


def test_debug_images_shapes():
    import jax.numpy as jnp

    from vslam_tpu.alignment.aligner import debug_images
    from vslam_tpu.core import lie_np
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.core.frame import create_frame
    from vslam_tpu.io import synthetic

    H, W, FX = 48, 64, 55.0
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    i0, d0 = synthetic.render(K, np.eye(4), (H, W))
    xi = np.array([0.01, 0, 0, 0, 0.005, 0])
    i1, d1 = synthetic.render(K, lie_np.exp(xi), (H, W))
    f0 = create_frame(jnp.asarray(i0), jnp.asarray(d0), cam, n_levels=2)
    f1 = create_frame(jnp.asarray(i1), jnp.asarray(d1), cam, n_levels=2)
    dbg = debug_images(f0, f1, lie_np.exp(xi))
    assert dbg["image_warped"].shape == (H, W)
    assert dbg["residual"].shape == (H, W)
    # the residual at the TRUE pose (interp error only; the tiny fx aliases
    # the texture) must be far below the residual at a WRONG pose
    vis = dbg["visible_mask"]
    r_true = np.abs(dbg["residual"][vis]).mean()
    dbg_bad = debug_images(f0, f1, lie_np.exp(xi + np.array([0.1, 0, 0, 0, 0, 0])))
    r_bad = np.abs(dbg_bad["residual"][dbg_bad["visible_mask"]]).mean()
    assert r_true < 0.5 * r_bad, (r_true, r_bad)


def test_log_plot_saves_npz_and_renders(tmp_path):
    sink = log_mod.log_plt("TestPlotOn")
    sink.enabled = True
    sink.save_dir = str(tmp_path)
    from vslam_tpu.eval.plot import plot_gauss_newton

    sink.renderer = plot_gauss_newton
    chi2 = np.array([10.0, 4.0, 1.5, np.nan, np.nan])
    step = np.array([1.0, 0.5, 0.1, np.nan, np.nan])
    sink << {"chi2": chi2, "step_size": step}
    import os

    files = sorted(os.listdir(tmp_path))
    assert any(f.endswith(".npz") for f in files)
    assert any(f.endswith(".png") for f in files)
    loaded = np.load(tmp_path / "TestPlotOn_000000.npz")
    np.testing.assert_allclose(loaded["chi2"], chi2)
    assert "TestPlotOn" in log_mod.registered_plot_logs()


def test_solver_iteration_history():
    """The GN solver records per-iteration chi2/stepSize like the reference's
    Solver::Results (Solver.h:40-56): decreasing chi2 while iterating, NaN
    beyond the final iteration."""
    import jax.numpy as jnp

    from vslam_tpu.solvers import SolverConfig, solve_gauss_newton
    from vslam_tpu.solvers.normal_equations import NormalEquations

    target = jnp.asarray([1.0, -2.0], jnp.float32)

    def compute_ne(x):
        r = x - target
        J = jnp.eye(2, dtype=jnp.float32)
        A = J.T @ J
        b = J.T @ r
        return NormalEquations(A, b, jnp.sum(r * r), jnp.asarray(2.0))

    def update(x, dx):
        return x - 0.5 * dx  # half steps -> several iterations

    cfg = SolverConfig(max_iterations=20, min_step_size=1e-5)
    res = solve_gauss_newton(compute_ne, update, jnp.zeros(2, jnp.float32), 2, cfg)
    chi2 = np.asarray(res.chi2_history)
    step = np.asarray(res.step_history)
    assert chi2.shape == (20,) and step.shape == (20,)
    n = int(np.sum(np.isfinite(chi2)))
    assert 2 <= n <= 20
    assert np.all(np.diff(chi2[:n]) <= 0)  # monotone decrease on this problem
    assert np.all(np.isnan(chi2[n:]))
    assert np.all(np.isfinite(step[:n]))


def test_aligner_emits_solver_plot(tmp_path):
    """RgbdAligner routes per-level convergence history into
    LOG_PLT("SolverGN") when the sink is enabled (GaussNewton.cpp:100)."""
    import jax.numpy as jnp

    from vslam_tpu.alignment.aligner import RgbdAligner
    from vslam_tpu.alignment.ic import AlignmentConfig
    from vslam_tpu.core import lie_np
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.core.frame import create_frame
    from vslam_tpu.io import synthetic
    from vslam_tpu.solvers import SolverConfig

    H, W, FX = 48, 64, 55.0
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    i0, d0 = synthetic.render(K, np.eye(4), (H, W))
    xi = np.array([0.01, 0, 0, 0, 0.005, 0])
    i1, d1 = synthetic.render(K, lie_np.exp(xi), (H, W))
    f0 = create_frame(jnp.asarray(i0), jnp.asarray(d0), cam, n_levels=2)
    f1 = create_frame(jnp.asarray(i1), jnp.asarray(d1), cam, n_levels=2)

    sink = log_mod.log_plt("SolverGN")
    sink.enabled = True
    sink.save_dir = str(tmp_path)
    payloads = []
    sink.callback = lambda name, data: payloads.append(data)
    try:
        cfg = AlignmentConfig(
            min_gradient=5.0,
            solver=SolverConfig(max_iterations=10, min_step_size=1e-7),
            include_prior=False,
            prior_weight=0.0,
        )
        aligner = RgbdAligner(cfg)
        pose, cov, ok = aligner.align([f0], [np.eye(4)], f1, np.eye(4))
    finally:
        sink.enabled = False
        sink.save_dir = None
        sink.callback = None
    assert ok
    assert len(payloads) == 1
    d = payloads[0]
    assert d["chi2"].shape == (2, 10)  # (levels, max_iterations)
    assert d["step_size"].shape == (2, 10)
    assert d["iterations"].shape == (2,)
    n0 = int(d["iterations"][0])
    assert n0 >= 1 and np.all(np.isfinite(d["chi2"][0, :n0]))


def test_aligner_emits_per_iteration_images(tmp_path):
    """Enabling the ImageWarped/Residual/Weights sinks makes the aligner
    emit one image per evaluated GN iteration (per level, coarsest first) —
    the reference logs inside every iteration
    (InverseCompositional.cpp:149-151)."""
    import jax.numpy as jnp

    from vslam_tpu.alignment.aligner import RgbdAligner
    from vslam_tpu.alignment.ic import AlignmentConfig
    from vslam_tpu.core import lie_np
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.core.frame import create_frame
    from vslam_tpu.io import synthetic
    from vslam_tpu.solvers import SolverConfig

    H, W, FX = 48, 64, 55.0
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    i0, d0 = synthetic.render(K, np.eye(4), (H, W))
    xi = np.array([0.05, 0, 0, 0, 0.02, 0])
    i1, d1 = synthetic.render(K, lie_np.exp(xi), (H, W))
    f0 = create_frame(jnp.asarray(i0), jnp.asarray(d0), cam, n_levels=2)
    f1 = create_frame(jnp.asarray(i1), jnp.asarray(d1), cam, n_levels=2)

    sinks = {n: log_mod.log_img(n) for n in ("ImageWarped", "Residual", "Weights")}
    arrays = {n: [] for n in sinks}
    for n, s in sinks.items():
        s.enabled = True
        s.save_dir = str(tmp_path / n)
        s.callback = (lambda nn: lambda name, arr: arrays[nn].append(arr))(n)
    try:
        cfg = AlignmentConfig(
            min_gradient=5.0,
            solver=SolverConfig(max_iterations=10, min_step_size=1e-7),
            include_prior=False,
            prior_weight=0.0,
        )
        aligner = RgbdAligner(cfg)
        pose, cov, ok = aligner.align([f0], [np.eye(4)], f1, np.eye(4))
    finally:
        for s in sinks.values():
            s.enabled = False
            s.save_dir = None
            s.callback = None
    assert ok
    n_imgs = len(arrays["ImageWarped"])
    assert n_imgs >= 2, "expected one image per evaluated GN iteration"
    assert len(arrays["Residual"]) == n_imgs == len(arrays["Weights"])
    # .npy stacks on disk (the done-criterion artifact)
    import os

    assert len(os.listdir(tmp_path / "ImageWarped")) == n_imgs
    # iterating reduces the residual: compare mean |r| over logged pixels of
    # the first vs last iteration at the COARSEST level (the level that
    # absorbs the initial motion; the fine level starts near-converged)
    coarse = [a for a in arrays["Residual"] if a.shape == (1, H // 2, W // 2)]
    assert coarse and len([a for a in arrays["Residual"] if a.shape == (1, H, W)]), (
        "missing per-level residual stacks"
    )

    def mean_abs(a):
        nz = np.abs(a[0])
        return nz[nz > 0].mean() if (nz > 0).any() else 0.0

    assert mean_abs(coarse[-1]) <= mean_abs(coarse[0]) * 0.9, (
        mean_abs(coarse[0]),
        mean_abs(coarse[-1]),
    )


def test_timer_registry():
    timer.reset()
    with timer.scope("unit.test"):
        pass
    timer.record("unit.test", 0.01)
    s = timer.stats("unit.test")
    assert s["count"] == 2
    assert "unit.test" in timer.report()
    timer.reset()
    assert timer.stats("unit.test") == {}


def test_fused_gn_kernel_records_history():
    """The in-kernel GN solver (fused_solve.py) records per-iteration
    chi2/step into its SMEM history rows — same Solver::Results telemetry as
    the XLA path (Solver.h:40-56), available through align(with_diagnostics)."""
    import jax
    import jax.numpy as jnp

    from vslam_tpu.alignment.ic import AlignmentConfig, align
    from vslam_tpu.core import lie_np
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.core.frame import create_frame
    from vslam_tpu.core.se3 import SE3
    from vslam_tpu.io import synthetic
    from vslam_tpu.solvers import SolverConfig

    H, W, FX = 96, 128, 110.0
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    i0, d0 = synthetic.render(K, np.eye(4), (H, W))
    i1, d1 = synthetic.render(
        K, lie_np.exp(np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002])), (H, W)
    )
    f0 = create_frame(jnp.asarray(i0), jnp.asarray(d0), cam, n_levels=2)
    f1 = create_frame(jnp.asarray(i1), jnp.asarray(d1), cam, n_levels=2)
    cfg = AlignmentConfig(
        min_gradient=10.0,
        solver=SolverConfig(max_iterations=30, min_step_size=1e-7),
        include_prior=False,
        sampler="fused_gn",
    )
    refs = jax.tree_util.tree_map(lambda x: x[None], f0)
    rel0 = SE3(jnp.eye(3, dtype=jnp.float32)[None], jnp.zeros((1, 3), jnp.float32))
    _, _, ok, diag = align(refs, f1, rel0, None, cfg, with_diagnostics=True)
    assert bool(ok)
    chi2 = np.asarray(diag["chi2"])  # (levels, max_iterations)
    step = np.asarray(diag["step_size"])
    assert chi2.shape == (2, 30) and step.shape == (2, 30)
    n_rec = np.sum(np.isfinite(chi2), axis=-1)
    assert (n_rec >= 1).all(), n_rec
    # recorded prefix is finite-step too
    for lvl in range(2):
        assert np.all(np.isfinite(step[lvl][: n_rec[lvl]]))


def test_plot_histogram(tmp_path):
    """vis::Histogram parity (visuals.h:34-70): residual-distribution plot."""
    from vslam_tpu.eval.plot import plot_histogram

    rng = np.random.default_rng(0)
    vals = np.concatenate([rng.normal(0, 1, 500), [np.nan, np.inf]])
    out = str(tmp_path / "hist.png")
    plot_histogram(vals, out, title="residuals", xlabel="r")
    import os

    assert os.path.getsize(out) > 0
