"""Live visualization channel (vslam_tpu.viz.live).

Covers the reference's RViz affordance (NodeMapping.cpp:231-272: /odom,
/path, TF + markers): publisher semantics, the HTTP state bus, the HTML
viewer page, and the pipeline wiring.
"""

import json
import urllib.request

import numpy as np
import pytest

from vslam_tpu.core import lie_np
from vslam_tpu.viz import LiveViz

pytestmark = pytest.mark.quick


def _get(port: int, path: str) -> bytes:
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        assert r.status == 200
        return r.read()


def test_publish_and_state_bus():
    viz = LiveViz(port=0)
    try:
        # world->cam poses walking +x in camera-in-world terms: w2c has
        # t = -R^T p; with R = I, w2c translation = -p
        for i in range(10):
            T = np.eye(4)
            T[:3, 3] = [-0.1 * i, 0.0, 0.0]
            cov = np.eye(6) * 1e-4
            viz.publish_odometry(
                int(i * 1e8), T, cov=cov, twist=np.array([3.0, 0, 0, 0, 0, 0])
            )
        viz.publish_keyframe(0, np.eye(4))
        viz.publish_landmarks(np.random.default_rng(0).normal(size=(50, 3)))

        state = json.loads(_get(viz.port, "/state.json"))
        assert state["n_frames"] == 10
        assert state["n_keyframes"] == 1
        assert state["n_landmarks"] == 50
        # displayed path is camera-in-world: +x forward
        assert np.isclose(state["path"][-1][0], 0.9)
        assert np.isclose(state["position"][0], 0.9)
        assert state["t_ns"] == int(9e8)
        # sigma_translation = sqrt(trace of 3x3 translation block)
        assert np.isclose(state["sigma_translation"], np.sqrt(3e-4))
        assert np.isclose(state["speed"], 3.0)

        page = _get(viz.port, "/").decode()
        assert "state.json" in page and "<svg" in page
    finally:
        viz.close()


def test_display_inverts_w2c_pose():
    """The viewer shows camera-in-world, inverting the pipeline's
    world->camera convention exactly as NodeMapping.cpp:238 does."""
    viz = LiveViz(port=0)
    try:
        rng = np.random.default_rng(1)
        T_c2w = lie_np.exp(rng.normal(scale=0.3, size=6))
        T_w2c = np.linalg.inv(T_c2w)
        viz.publish_odometry(0, T_w2c)
        state = viz.state()
        np.testing.assert_allclose(state["position"], T_c2w[:3, 3], atol=1e-9)
    finally:
        viz.close()


def test_path_ring_decimates():
    viz = LiveViz(port=0, max_path=64)
    try:
        for i in range(200):
            T = np.eye(4)
            T[0, 3] = float(i)
            viz.publish_odometry(i, T)
        state = viz.state()
        assert state["n_frames"] == 200
        assert len(state["path"]) <= 65  # bounded, uniformly thinned
        assert state["n_landmarks"] == 0
    finally:
        viz.close()


def test_landmark_cap():
    viz = LiveViz(port=0, max_landmarks=16)
    try:
        viz.publish_landmarks(np.arange(300.0).reshape(100, 3))
        assert len(viz.state()["landmarks"]) == 16
    finally:
        viz.close()


def test_pipeline_wiring():
    """cfg.live_viz_port spins up the viewer and process-path publishing
    feeds it (both trajectory.append sites call _publish_viz)."""
    from vslam_tpu.config import PipelineConfig
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.odometry.map import HostFrame
    from vslam_tpu.odometry.pipeline import OdometryPipeline

    cam = Camera.create(525.0, 525.0, 319.5, 239.5)
    pipe = OdometryPipeline(cam, PipelineConfig(live_viz_port=0))
    try:
        assert pipe.viz is not None and pipe.viz.port > 0
        T = np.eye(4)
        T[2, 3] = -1.0
        hf = HostFrame(frame=None, t_ns=42, pose=T, cov=np.eye(6) * 1e-6)
        pipe._publish_viz(42, hf, is_kf=True)
        state = json.loads(_get(pipe.viz.port, "/state.json"))
        assert state["n_frames"] == 1 and state["n_keyframes"] == 1
        assert np.isclose(state["position"][2], 1.0)
    finally:
        pipe.viz.close()


def test_fused_path_publishes_retired_chunks():
    """SequentialOdometry(viz=...) publishes each retired chunk's frames and
    keyframes — live viz on the fused production path."""
    from vslam_tpu.alignment.ic import AlignmentConfig
    from vslam_tpu.core.camera import Camera
    from vslam_tpu.io import synthetic
    from vslam_tpu.core import lie_np
    from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry
    from vslam_tpu.solvers import SolverConfig

    H, W, FX = 96, 128, 110.0
    N, dt_ns = 10, int(1e9 / 30)
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(N, trans_amp=0.08, rot_amp=0.03)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    frames = [synthetic.render(K, p, (H, W)) for p in poses]
    # config identical to test_sequential._seq_cfg -> jit cache hit
    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
            prior_weight=(FX / 525.0) ** 2,
        ),
        n_levels=3,
        kf_period=5,
    )
    viz = LiveViz(port=0)
    try:
        odo = SequentialOdometry(
            Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2), cfg, chunk=4, viz=viz
        )
        results = odo.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
        state = viz.state()
        assert state["n_frames"] == len(results) == N
        assert state["n_keyframes"] >= 1  # kf_period=5 over 10 frames
        # published positions match the retired trajectory (camera-in-world)
        t, T, _ = results[-1]
        assert state["t_ns"] == t
        np.testing.assert_allclose(
            state["position"], np.linalg.inv(T)[:3, 3], atol=1e-6
        )
    finally:
        viz.close()


def test_unknown_path_404():
    viz = LiveViz(port=0)
    try:
        with pytest.raises(urllib.error.HTTPError):
            _get(viz.port, "/nope")
    finally:
        viz.close()
