"""Evaluation-metric tests against closed-form cases (mirrors the role of the
reference's TUM scripts as the system-level oracle)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min iteration tier (see pyproject)

from vslam_tpu.core import lie_np
from vslam_tpu.eval import metrics


def make_traj(n=50, dt=0.1, seed=0):
    rng = np.random.default_rng(seed)
    poses = {}
    T = np.eye(4)
    for i in range(n):
        xi = np.concatenate([rng.uniform(-0.05, 0.05, 3), rng.uniform(-0.02, 0.02, 3)])
        T = T @ lie_np.exp(xi)
        poses[i * dt] = T.copy()
    return poses


def test_associate_exact_and_offset():
    a = [0.0, 1.0, 2.0, 3.0]
    b = [0.005, 1.004, 2.5, 3.001]
    m = metrics.associate(a, b, max_difference=0.02)
    assert m == [(0, 0), (1, 1), (3, 3)]


def test_ate_identical_trajectories_is_zero():
    gt = make_traj()
    ate, n = metrics.ate_rmse(gt, gt)
    assert ate == pytest.approx(0.0, abs=1e-12)
    assert n == len(gt)


def test_ate_invariant_to_rigid_offset():
    """ATE aligns with Horn's method, so a global rigid transform of the
    estimate must not change the error."""
    gt = make_traj()
    offset = lie_np.exp(np.array([0.5, -0.3, 0.2, 0.3, -0.1, 0.2]))
    est = {t: offset @ T for t, T in gt.items()}
    ate, _ = metrics.ate_rmse(gt, est)
    assert ate == pytest.approx(0.0, abs=1e-9)


def test_ate_known_noise():
    gt = make_traj()
    rng = np.random.default_rng(1)
    est = {}
    for t, T in gt.items():
        T2 = T.copy()
        T2[:3, 3] += rng.normal(0, 0.01, 3)
        est[t] = T2
    ate, _ = metrics.ate_rmse(gt, est)
    assert 0.005 < ate < 0.05


def test_rpe_identical_is_zero():
    gt = make_traj(n=40, dt=0.1)
    t_rmse, r_rmse, n = metrics.rpe(gt, gt, fixed_delta=1.0)
    assert t_rmse == pytest.approx(0.0, abs=1e-12)
    assert r_rmse == pytest.approx(0.0, abs=1e-12)
    assert n > 10


def test_rpe_constant_drift():
    """Estimate drifting by a constant translation per second shows that
    translation as RPE."""
    dt = 0.1
    gt = {i * dt: np.eye(4) for i in range(40)}
    drift_per_s = 0.05
    est = {}
    for i in range(40):
        T = np.eye(4)
        T[0, 3] = drift_per_s * i * dt
        est[i * dt] = T
    t_rmse, _, _ = metrics.rpe(gt, est, fixed_delta=1.0)
    assert t_rmse == pytest.approx(drift_per_s, rel=1e-6)


def test_trajectory_file_roundtrip(tmp_path):
    from vslam_tpu.io import tum

    gt = make_traj(n=10)
    path = str(tmp_path / "traj.txt")
    tum.write_trajectory(path, gt)
    back = tum.read_trajectory(path)
    assert len(back) == len(gt)
    # timestamps are serialized at 9 decimals; match by order, compare poses
    for (t0, T0), (t1, T1) in zip(sorted(gt.items()), sorted(back.items())):
        assert abs(t0 - t1) < 1e-8
        np.testing.assert_allclose(T1, T0, atol=1e-5)


def test_trajectory_interpolation():
    from vslam_tpu.odometry.trajectory import Trajectory

    tr = Trajectory()
    p0 = np.eye(4)
    xi = np.array([0.2, 0.0, 0.0, 0.0, 0.0, 0.4])
    p1 = lie_np.exp(xi) @ p0
    tr.append(0, p0)
    tr.append(1_000_000_000, p1)
    mid = tr.pose_at(500_000_000)
    want = lie_np.exp(xi * 0.5) @ p0
    np.testing.assert_allclose(mid, want, atol=1e-9)
    rel = tr.motion_between(0, 1_000_000_000)
    np.testing.assert_allclose(rel, lie_np.exp(xi), atol=1e-12)


def test_suite_unique_output_names():
    """Two --dataset roots with the same leaf directory name must not write
    the same trajectory file (silent overwrite)."""
    from vslam_tpu.eval.evaluate import _unique_names

    assert _unique_names(["/a/fr2", "/b/kitti", "/c/tum"]) == ["fr2", "kitti", "tum"]
    assert _unique_names(["/runA/kitti", "/runB/kitti/"]) == ["kitti.1", "kitti.2"]
    assert _unique_names(["/x/s", "/y/s", "/z/other"]) == ["s.1", "s.2", "other"]


def test_cli_ate_rpe_subcommands(tmp_path, capsys):
    """The `ate` / `rpe` CLI subcommands (the reference evaluate_ate.py /
    evaluate_rpe.py interfaces): verbose statistics blocks in the scripts'
    formats, --save files written."""
    from vslam_tpu.eval.evaluate import main
    from vslam_tpu.io import tum

    gt = make_traj(40, seed=1)
    rng = np.random.default_rng(2)
    est = {
        t: lie_np.exp(np.concatenate([rng.normal(0, 2e-3, 3), np.zeros(3)])) @ T
        for t, T in gt.items()
    }
    gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    tum.write_trajectory(gt_f, gt)
    tum.write_trajectory(est_f, est)

    save = str(tmp_path / "aligned.txt")
    rc = main(["ate", "--gt", gt_f, "--algo", est_f, "--verbose", "--save", save])
    assert rc == 0
    out = capsys.readouterr().out
    assert "compared_pose_pairs 40 pairs" in out
    rmse = [l for l in out.splitlines() if l.startswith("absolute_translational_error.rmse")]
    assert rmse and float(rmse[0].split()[1]) < 0.01
    assert np.loadtxt(save).shape == (40, 4)

    pairs = str(tmp_path / "pairs.txt")
    rc = main([
        "rpe", "--gt", gt_f, "--algo", est_f, "--fixed-delta",
        "--delta", "0.3", "--verbose", "--save", pairs,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "translational_error.rmse" in out and "rotational_error.rmse" in out
    assert np.loadtxt(pairs).shape[1] == 6

    # bare mode prints one number (reference parity: ate=rmse, rpe=mean)
    rc = main(["ate", "--gt", gt_f, "--algo", est_f])
    assert rc == 0
    float(capsys.readouterr().out.strip())
