"""Golden-file tests for the full RPE protocol (`metrics.evaluate_rpe_full`)
against the reference's own TUM script run directly from
`/root/reference/script/vslam_evaluation/tum/evaluate_rpe.py` — the exact
program that defines the published 0.036 m number (README.md:10-12).

delta_unit 's' (the published protocol, script/evaluate.py:65-75) and 'f' are
compared row-for-row; 'm'/'rad' use `dict.keys().sort()` in the reference
script (a Python-2-ism that crashes under the py3 interpreter available
here), so those units get internal-consistency checks instead.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from vslam_tpu.core import lie_np
from vslam_tpu.eval import metrics
from vslam_tpu.io import tum

REF_SCRIPT = "/root/reference/script/vslam_evaluation/tum/evaluate_rpe.py"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isfile(REF_SCRIPT), reason="reference evaluate_rpe.py not present"
    ),
    pytest.mark.quick,  # <5-min iteration tier (see pyproject)
]


def _make_trajectories(n=120, seed=3):
    """Ground truth + noisy estimate with slightly jittered timestamps."""
    rng = np.random.default_rng(seed)
    gt, est = {}, {}
    T = np.eye(4)
    for i in range(n):
        xi = np.concatenate([rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.01, 0.01, 3)])
        T = lie_np.exp(xi) @ T
        t = round(i / 30.0, 6)
        gt[t] = lie_np.inv(T)
        noise = np.concatenate([rng.normal(0, 2e-3, 3), rng.normal(0, 1e-3, 3)])
        est[round(t + rng.uniform(-2e-3, 2e-3), 6)] = lie_np.inv(lie_np.exp(noise) @ T)
    return gt, est


@pytest.fixture(scope="module")
def traj_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("rpe")
    gt, est = _make_trajectories()
    gt_f, est_f = str(d / "gt.txt"), str(d / "est.txt")
    tum.write_trajectory(gt_f, gt)
    tum.write_trajectory(est_f, est)
    return gt_f, est_f


def _run_reference(gt_f, est_f, *args):
    save = gt_f + ".pairs"
    cmd = [
        sys.executable, REF_SCRIPT, gt_f, est_f, "--save", save, "--verbose", *args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    rows = np.loadtxt(save)
    stats = {}
    for line in out.stdout.splitlines():
        parts = line.split()
        if len(parts) >= 2 and "." in parts[0]:
            stats[parts[0]] = float(parts[1])
    return rows, stats


@pytest.mark.parametrize(
    "ref_args, kwargs",
    [
        (["--fixed_delta"], dict(fixed_delta=True)),
        (
            ["--fixed_delta", "--delta", "0.5", "--offset", "0.01"],
            dict(fixed_delta=True, delta=0.5, offset=0.01),
        ),
        (
            ["--fixed_delta", "--delta_unit", "f", "--delta", "3"],
            dict(fixed_delta=True, delta_unit="f", delta=3),
        ),
        (
            ["--fixed_delta", "--scale", "1.1"],
            dict(fixed_delta=True, scale=1.1),
        ),
        ([], dict()),  # all-pairs mode with max_pairs=10000 seeded sampling
        (["--max_pairs", "300"], dict(max_pairs=300)),
    ],
    ids=["fixed_s", "delta_offset", "frames", "scale", "all_pairs", "downsample"],
)
def test_rpe_protocol_matches_reference_script(traj_files, ref_args, kwargs):
    gt_f, est_f = traj_files
    ref_rows, ref_stats = _run_reference(gt_f, est_f, *ref_args)
    gt = tum.read_trajectory(gt_f)
    est = tum.read_trajectory(est_f)
    rows = metrics.evaluate_rpe_full(gt, est, **kwargs)

    assert rows.shape == np.atleast_2d(ref_rows).shape, (
        rows.shape,
        ref_rows.shape,
    )
    # identical pair selection (stamps) and errors; the reference --save file
    # quantizes with "%f" (6 decimals), so compare at that precision
    np.testing.assert_allclose(rows[:, :4], np.atleast_2d(ref_rows)[:, :4], atol=2e-6)
    np.testing.assert_allclose(
        rows[:, 4:], np.atleast_2d(ref_rows)[:, 4:], rtol=1e-4, atol=2e-6
    )
    stats = metrics.rpe_stats(rows)
    for key, val in ref_stats.items():
        assert abs(stats[key] - val) < 1e-4 * max(1.0, abs(val)), key


@pytest.mark.parametrize("unit", ["m", "rad", "deg"])
def test_rpe_distance_units_consistency(traj_files, unit):
    """'m'/'rad'/'deg' delta units (py3-broken in the reference script):
    internal consistency — a delta of ~the whole trajectory length yields few
    pairs; a small delta yields pairs with nearby indices."""
    gt_f, est_f = traj_files
    gt = tum.read_trajectory(gt_f)
    est = tum.read_trajectory(est_f)
    small = dict(m=0.05, rad=0.02, deg=1.1)[unit]
    rows = metrics.evaluate_rpe_full(gt, est, fixed_delta=True, delta=small, delta_unit=unit)
    assert len(rows) > 50
    # pair span must be short in time for a small distance delta
    spans = rows[:, 1] - rows[:, 0]
    assert np.median(spans) < 0.5
    stats = metrics.rpe_stats(rows)
    assert stats["translational_error.rmse"] < 0.05


REF_ATE = "/root/reference/script/vslam_evaluation/tum/evaluate_ate.py"


def _run_reference_ate(gt_f, est_f, *args):
    save = gt_f + ".ate_aligned"
    assoc = gt_f + ".ate_assoc"
    cmd = [
        sys.executable, REF_ATE, gt_f, est_f,
        "--save", save, "--save_associations", assoc, "--verbose", *args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    stats = {}
    for line in out.stdout.splitlines():
        parts = line.split()
        if len(parts) >= 2 and "." in parts[0]:
            stats[parts[0]] = float(parts[1])
        elif parts and parts[0] == "compared_pose_pairs":
            stats[parts[0]] = int(parts[1])
    return np.loadtxt(save), np.loadtxt(assoc), stats


@pytest.mark.skipif(not os.path.isfile(REF_ATE), reason="reference script absent")
@pytest.mark.parametrize(
    "ref_args, kwargs",
    [
        ([], dict()),
        (["--offset", "0.005"], dict(offset=0.005)),
        (["--scale", "1.25"], dict(scale=1.25)),
        (["--max_difference", "0.01"], dict(max_difference=0.01)),
    ],
    ids=["default", "offset", "scale", "max_difference"],
)
def test_ate_protocol_matches_reference_script(traj_files, ref_args, kwargs):
    """metrics.evaluate_ate_full vs the reference's own evaluate_ate.py
    (the program that defines the published 0.21 m ATE), option-for-option:
    same association, same Horn alignment, same statistics, same --save /
    --save_associations row contents."""
    gt_f, est_f = traj_files
    ref_full, ref_assoc, ref_stats = _run_reference_ate(gt_f, est_f, *ref_args)
    gt = tum.read_trajectory(gt_f)
    est = tum.read_trajectory(est_f)
    stats, assoc, full = metrics.evaluate_ate_full(gt, est, **kwargs)

    assert stats["compared_pose_pairs"] == ref_stats["compared_pose_pairs"]
    for key, val in ref_stats.items():
        if key == "compared_pose_pairs":
            continue
        assert abs(stats[key] - val) < 1e-4 * max(1.0, abs(val)), key
    np.testing.assert_allclose(assoc, np.atleast_2d(ref_assoc), atol=2e-6)
    np.testing.assert_allclose(full, np.atleast_2d(ref_full), atol=2e-6)
