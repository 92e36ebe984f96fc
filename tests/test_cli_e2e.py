"""Full-system CLI test on a generated mini TUM dataset: PNG files on disk
(8-bit gray rgb + 16-bit depth) -> `vslam-run odometry` -> trajectory file ->
`vslam-run evaluate` vs ground truth. Exercises the complete real-data path:
PNG decode (native loader when built), timestamp pairing, tracking,
TUM-format IO and the metrics — the role of the reference's CI `evaluate`
job (SURVEY §4 tier 4) without needing the real fr2_desk download."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from vslam_tpu.core import lie_np
from vslam_tpu.eval.evaluate import main as cli_main
from vslam_tpu.io import synthetic, tum

H, W, FX = 96, 128, 110.0
N_FRAMES = 12


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_tum")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(N_FRAMES, trans_amp=0.06, rot_amp=0.02, seed=11)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]

    rgb_lines, depth_lines, gt = [], [], {}
    for i, p in enumerate(poses):
        t = 1000.0 + i / 30.0
        intensity, depth = synthetic.render(K, p, (H, W))
        Image.fromarray(np.clip(intensity, 0, 255).astype(np.uint8), mode="L").save(
            root / "rgb" / f"{t:.6f}.png"
        )
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(root / "depth" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt[t] = lie_np.inv(p)  # TUM files are cam->world

    (root / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# ts file\n" + "\n".join(depth_lines) + "\n")
    tum.write_trajectory(str(root / "groundtruth.txt"), gt)
    return root


def test_cli_odometry_and_evaluate(mini_dataset, tmp_path, capsys):
    out = str(tmp_path / "trajectory.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_dataset),
            "--out", out,
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
            "--no-eval",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert lines[0]["frames"] == N_FRAMES
    assert os.path.exists(out)
    assert os.path.exists(out + ".meta.json")

    rc = cli_main(
        [
            "evaluate",
            "--gt", str(mini_dataset / "groundtruth.txt"),
            "--algo", out,
            "--fixed-delta", "0.2",
            "--plot",
        ]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # uint8-quantized synthetic frames through the full file pipeline:
    # comfortably inside the reference budgets (RPE 0.036 m / ATE 0.21 m)
    assert res["ate_rmse_m"] < 0.02, res
    assert res["rpe_trans_rmse_m"] < 0.02, res
    out_dir = os.path.dirname(out)
    assert os.path.exists(os.path.join(out_dir, "ate_summary.txt"))
    assert os.path.exists(os.path.join(out_dir, "rpe_summary.txt"))
    assert os.path.exists(os.path.join(out_dir, "traj.png"))
    assert os.path.exists(os.path.join(out_dir, "rpe.png"))


def test_cli_fused_mapping(mini_dataset, tmp_path, capsys):
    """--fused --mapping: device-scan odometry + chunk mapping backend via
    the real file pipeline (PNG decode -> uint8/uint16 transport -> scan ->
    track/BA between chunks)."""
    out = str(tmp_path / "traj_fused.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_dataset),
            "--out", out,
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
            "--fused", "--mapping",
            "--chunk", "4",
            "--no-eval",
        ]
    )
    assert rc == 0
    assert os.path.exists(out)

    rc = cli_main(
        [
            "evaluate",
            "--gt", str(mini_dataset / "groundtruth.txt"),
            "--algo", out,
            "--fixed-delta", "0.2",
        ]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ate_rmse_m"] < 0.02, res


@pytest.fixture(scope="module")
def mini_dataset_b(tmp_path_factory):
    """Second mini TUM sequence (different trajectory) for the multi-dataset
    suite mode."""
    root = tmp_path_factory.mktemp("mini_tum_b")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(8, trans_amp=0.05, rot_amp=0.02, seed=23)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    rgb_lines, depth_lines, gt = [], [], {}
    for i, p in enumerate(poses):
        t = 2000.0 + i / 30.0
        intensity, depth = synthetic.render(K, p, (H, W))
        Image.fromarray(np.clip(intensity, 0, 255).astype(np.uint8), mode="L").save(
            root / "rgb" / f"{t:.6f}.png"
        )
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(root / "depth" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt[t] = lie_np.inv(p)
    (root / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# ts file\n" + "\n".join(depth_lines) + "\n")
    tum.write_trajectory(str(root / "groundtruth.txt"), gt)
    return root


def test_cli_odometry_multi_dataset(mini_dataset, mini_dataset_b, tmp_path, capsys):
    """Suite mode: two --dataset flags batch both sequences through the
    multi-sequence fused scan (ragged lengths: 12 and 8 frames); per-sequence
    trajectories + metrics come back in one JSON summary."""
    out = str(tmp_path / "suite.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_dataset),
            "--dataset", str(mini_dataset_b),
            "--out", out,
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
            "--fused",
            "--chunk", "4",
        ]
    )
    assert rc == 0
    summary = json.loads(
        [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["sequences"] == 2
    assert summary["frames"] == N_FRAMES + 8
    assert len(summary["results"]) == 2
    for entry in summary["results"]:
        assert os.path.exists(entry["trajectory"])
        assert entry["ate_rmse_m"] < 0.02, entry
    assert os.path.exists(str(tmp_path / "suite_suite.meta.json"))


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    """Synthetic stereo mini-KITTI: left images at the trajectory poses,
    right images at a baseline shift along camera +x; depth comes from the
    on-device block matcher — the full --format kitti path."""
    return _build_mini_kitti(tmp_path_factory.mktemp("mini_kitti"), seed=4)


@pytest.fixture(scope="module")
def mini_kitti_b(tmp_path_factory):
    """Second mini-KITTI root (different trajectory) for the stereo suite."""
    return _build_mini_kitti(tmp_path_factory.mktemp("mini_kitti_b"), seed=12)


def _build_mini_kitti(root, seed):
    seq = root / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (root / "poses").mkdir()
    BASELINE = 0.54
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(N_FRAMES, trans_amp=0.05, rot_amp=0.015, seed=seed)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]

    # right camera frame = left frame translated +b along camera x, so
    # T_right<-world = T_shift @ T_left<-world where T_shift maps left-frame
    # coordinates to right-frame ones (x' = x - b)
    shift = np.eye(4)
    shift[0, 3] = -BASELINE
    times, pose_rows = [], []
    for i, p in enumerate(poses):
        left, _ = synthetic.render(K, p, (H, W))
        right, _ = synthetic.render(K, shift @ p, (H, W))
        name = f"{i:06d}.png"
        Image.fromarray(np.clip(left, 0, 255).astype(np.uint8), mode="L").save(
            seq / "image_0" / name
        )
        Image.fromarray(np.clip(right, 0, 255).astype(np.uint8), mode="L").save(
            seq / "image_1" / name
        )
        times.append(i / 10.0)
        Tcw = lie_np.inv(p)  # cam0 -> world
        pose_rows.append(" ".join(f"{v:.9f}" for v in Tcw[:3, :4].reshape(-1)))
    (seq / "times.txt").write_text("\n".join(f"{t:.6f}" for t in times) + "\n")
    cx, cy = (W - 1) / 2, (H - 1) / 2
    p0_row = f"P0: {FX} 0 {cx} 0 0 {FX} {cy} 0 0 0 1 0"
    p1_row = f"P1: {FX} 0 {cx} {-FX*BASELINE} 0 {FX} {cy} 0 0 0 1 0"
    (seq / "calib.txt").write_text(p0_row + "\n" + p1_row + "\n")
    (root / "poses" / "00.txt").write_text("\n".join(pose_rows) + "\n")
    return root


def test_cli_kitti_odometry(mini_kitti, tmp_path, capsys):
    """--format kitti end to end: stereo PNGs -> block-matching depth ->
    tracking -> trajectory -> ATE vs KITTI-format ground truth. Stereo
    depth is quantized (integer disparities + subpixel fit), so the budget
    is looser than the RGB-D path's."""
    out = str(tmp_path / "kitti_traj.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_kitti),
            "--format", "kitti",
            "--sequence", "00",
            "--out", out,
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()
    lines = [json.loads(l) for l in printed if l.startswith("{")]
    assert lines[0]["frames"] == N_FRAMES
    res = lines[-1]
    assert "ate_rmse_m" in res, printed
    assert res["ate_rmse_m"] < 0.05, res


def test_cli_kitti_fused_stereo(mini_kitti, tmp_path, capsys):
    """--format kitti --fused: raw u8 stereo pairs stream to the device and
    block-matching depth is computed INSIDE the scan step (fully fused
    KITTI path)."""
    out = str(tmp_path / "kitti_fused.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_kitti),
            "--format", "kitti",
            "--sequence", "00",
            "--fused",
            "--chunk", "4",
            "--out", out,
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()
    lines = [json.loads(l) for l in printed if l.startswith("{")]
    res = lines[-1]
    assert "ate_rmse_m" in res, printed
    assert res["ate_rmse_m"] < 0.05, res


def test_cli_kitti_fused_mapping(mini_kitti, tmp_path, capsys):
    """--format kitti --fused --mapping: the chunk backend's keyframes build
    their depth with the block matcher from the scan's staged stereo slices
    (sequential_mapping._light_arrays stereo branch)."""
    out = str(tmp_path / "kitti_fused_map.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_kitti),
            "--format", "kitti",
            "--sequence", "00",
            "--fused", "--mapping",
            "--chunk", "4",
            "--out", out,
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()
    lines = [json.loads(l) for l in printed if l.startswith("{")]
    res = lines[-1]
    assert "ate_rmse_m" in res, printed
    assert res["ate_rmse_m"] < 0.05, res

def test_cli_kitti_suite(mini_kitti, mini_kitti_b, tmp_path, capsys):
    """KITTI suite mode: two --dataset roots batch through the multi-sequence
    fused scan with ON-DEVICE block-matching depth in every sequence's step
    (raw u8 stereo transport). Shared static stereo baseline is validated;
    per-sequence trajectories + ATE come back in one JSON summary."""
    out = str(tmp_path / "ksuite.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_kitti),
            "--dataset", str(mini_kitti_b),
            "--format", "kitti",
            "--sequence", "00",
            "--fused",
            "--chunk", "4",
            "--out", out,
        ]
    )
    assert rc == 0
    summary = json.loads(
        [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["sequences"] == 2
    assert summary["frames"] == 2 * N_FRAMES
    for entry in summary["results"]:
        assert os.path.exists(entry["trajectory"])
        assert entry["ate_rmse_m"] < 0.05, entry


REF_YAML = os.path.join(
    os.environ.get("VSLAM_REFERENCE_ROOT", "/root/reference"),
    "config", "NodeMapping.yaml",
)


@pytest.mark.skipif(not os.path.isfile(REF_YAML), reason="reference YAML not present")
def test_cli_odometry_with_reference_yaml(mini_dataset, tmp_path, capsys):
    """The reference's OWN canonical runtime config drives the pipeline
    end-to-end: `--config /root/reference/config/NodeMapping.yaml` (the file
    NodeMapping.cpp:52-64 declares its parameters from) tracks the mini
    dataset within budget — the 'reference YAMLs load 1:1' claim exercised
    through the full CLI, not just the loader."""
    out = str(tmp_path / "traj_refcfg.txt")
    rc = cli_main(
        [
            "odometry",
            "--dataset", str(mini_dataset),
            "--out", out,
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
            "--config", REF_YAML,
            "--no-eval",
        ]
    )
    assert rc == 0
    rc = cli_main(
        [
            "evaluate",
            "--gt", str(mini_dataset / "groundtruth.txt"),
            "--algo", out,
            "--fixed-delta", "0.2",
        ]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ate_rmse_m"] < 0.02, res


@pytest.mark.quick  # the one command that matters on a dataset-connected
def test_cli_reproduce_dry_run(mini_dataset, tmp_path, capsys):  # machine
    """`vslam-run reproduce` — the one-command readiness artifact for the
    real fr2_desk replication (VERDICT r3 item 3): replay + OPTION-EXACT
    reference RPE (--fixed_delta --delta_unit s) + ATE protocols + pass/fail
    against the published budgets, dry-run on the mini TUM fixture. The
    sequence spans 0.37 s so the 1 s fixed-delta RPE protocol yields no
    pairs on it; the ATE budget is the meaningful pass/fail check here (on
    the real 99 s sequence both bind)."""
    out = str(tmp_path / "repro.txt")
    rc = cli_main(
        [
            "reproduce",
            "--dataset", str(mini_dataset),
            "--out", out,
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
        ]
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, res
    assert res["pass"] is True
    assert res["ate_rmse_m"] < 0.02, res
    assert os.path.exists(out)
    assert res["rpe_budget_m"] == 0.036 and res["ate_budget_m"] == 0.21

    # regression must FAIL loudly (exit 1): rerun with an impossible budget
    rc = cli_main(
        [
            "reproduce",
            "--dataset", str(mini_dataset),
            "--out", out,
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
            "--ate-budget", "1e-9",
        ]
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and res["pass"] is False


@pytest.mark.quick
def test_cli_reproduce_usage_error_exit_2(mini_dataset, tmp_path, capsys):
    """Exit code 2 = usage error (the reproduce contract's third code): a
    dataset without ground truth cannot be scored. Copies the fixture's
    stream files but not groundtruth.txt."""
    import shutil

    broken = tmp_path / "no_gt"
    shutil.copytree(mini_dataset, broken)
    (broken / "groundtruth.txt").unlink()
    rc = cli_main(
        [
            "reproduce",
            "--dataset", str(broken),
            "--out", str(tmp_path / "t.txt"),
            "--intrinsics", f"{FX},{FX},{(W-1)/2},{(H-1)/2}",
        ]
    )
    capsys.readouterr()
    assert rc == 2
