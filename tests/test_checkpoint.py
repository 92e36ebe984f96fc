"""Checkpoint/resume of mid-sequence tracking state (SURVEY §5 extension:
the reference persists only trajectories; we snapshot the live scan state
and landmark map as arrays)."""

import numpy as np

from vslam_tpu.alignment.ic import AlignmentConfig
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.io import synthetic
from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry, init_state
from vslam_tpu.solvers import SolverConfig
from vslam_tpu.utils import checkpoint

H, W, FX = 96, 128, 110.0


def _stream(n, seed=3):
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(n, trans_amp=0.06, rot_amp=0.02, seed=seed)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    dt = int(1e9 / 30)
    return [(i * dt, *synthetic.render(K, p, (H, W))) for i, p in enumerate(poses)], poses


def test_sequential_checkpoint_resume(tmp_path):
    """Stop after the first half, checkpoint, resume in a new driver: the
    resumed trajectory must match the uninterrupted run."""
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=40, min_step_size=1e-7),
            include_prior=True,
        ),
        n_levels=2,
        kf_period=3,
    )
    stream, _ = _stream(12)

    # uninterrupted reference run
    full = SequentialOdometry(cam, cfg, chunk=4).run(iter(stream))

    # first half, checkpoint, fresh driver, second half
    odo1 = SequentialOdometry(cam, cfg, chunk=4)
    first = odo1.run(iter(stream[:8]))
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_sequential(ckpt, odo1.state, odo1._t_last_ns)

    odo2 = SequentialOdometry(cam, cfg, chunk=4)
    t0, i0, d0 = stream[0]
    state_like = init_state(i0, d0, cam, cfg)
    odo2.state, odo2._t_last_ns = checkpoint.load_sequential(ckpt, state_like)
    second = odo2.run(iter(stream[8:]))

    resumed = first + second
    assert len(resumed) == len(full) == 12
    for (t_a, T_a, _), (t_b, T_b, _) in zip(resumed, full):
        assert t_a == t_b
        d = np.linalg.norm(lie_np.log(lie_np.relative(T_a, T_b)))
        assert d < 1e-4, d


def test_landmark_roundtrip(tmp_path):
    from vslam_tpu.odometry.map import Landmark

    lms = [
        Landmark(position=np.array([1.0, 2.0, 3.0]), observations={5: 2, 9: 7}),
        Landmark(position=np.array([-0.5, 0.1, 4.2]), observations={}),
    ]
    path = str(tmp_path / "landmarks.npz")
    checkpoint.save_landmarks(path, lms)
    back = checkpoint.load_landmarks(path)
    assert len(back) == 2
    np.testing.assert_allclose(back[0].position, lms[0].position)
    assert back[0].observations == {5: 2, 9: 7}
    assert back[0].id == lms[0].id
    assert back[1].observations == {}
