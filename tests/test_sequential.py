"""Fused sequential odometry (lax.scan per-frame fusion): must track the same
synthetic trajectory the host pipeline tracks, with chunked dispatch and
padded final chunks handled correctly."""

import numpy as np
import pytest

from vslam_tpu.alignment.ic import AlignmentConfig
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.eval import metrics
from vslam_tpu.io import synthetic
from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry
from vslam_tpu.solvers import SolverConfig

H, W, FX = 96, 128, 110.0
N_FRAMES = 10
DT_NS = int(1e9 / 30)


def _make_sequence():
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(N_FRAMES, trans_amp=0.08, rot_amp=0.03)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    frames = [synthetic.render(K, p, (H, W)) for p in poses]
    return poses, frames


def _seq_cfg():
    return SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
            prior_weight=(FX / 525.0) ** 2,
        ),
        n_levels=3,
        kf_period=5,
    )


def _run(chunk):
    poses, frames = _make_sequence()
    odo = SequentialOdometry(Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2), _seq_cfg(), chunk=chunk)
    results = odo.run((i * DT_NS, f[0], f[1]) for i, f in enumerate(frames))
    assert len(results) == N_FRAMES
    gt = {i * DT_NS / 1e9: lie_np.inv(p) for i, p in enumerate(poses)}
    est = {t / 1e9: lie_np.inv(p) for t, p, _ in results}
    ate, n = metrics.ate_rmse(gt, est)
    assert n == N_FRAMES
    return ate, results


def test_fused_scan_tracks_synthetic_sequence():
    ate, results = _run(chunk=4)
    assert ate < 0.01, f"fused-path ATE {ate}"
    # covariances come back per frame
    assert results[3][2].shape == (6, 6)


def test_fused_scan_padding_invariant():
    """chunk > remaining frames: padded slots must not corrupt the state."""
    ate_small, res_small = _run(chunk=4)
    ate_big, res_big = _run(chunk=16)  # 10 frames -> one padded chunk (9 live)
    assert ate_big < 0.01
    # same trajectory regardless of chunking
    for (t1, p1, _), (t2, p2, _) in zip(res_small, res_big):
        assert t1 == t2
        err = np.linalg.norm(lie_np.log(lie_np.relative(p1, p2)))
        assert err < 1e-4, err


def test_fused_scan_with_mapping_backend():
    """Full SLAM on the fused path: the device scan flags keyframes, the
    chunk backend runs track -> BA between chunks (NodeMapping.cpp:162-180
    role), landmarks accumulate, and tracking stays within the odometry
    accuracy budget."""
    from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry
    from vslam_tpu.odometry.sequential_mapping import ChunkMappingBackend

    N = 12
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(N, trans_amp=0.06, rot_amp=0.02)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    frames = [synthetic.render(K, p, (H, W)) for p in poses]
    dt_ns = int(1e9 / 30)

    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
        ),
        n_levels=3,
        kf_period=3,
    )
    backend = ChunkMappingBackend(enable_ba=True)
    odo = SequentialOdometry(CAM, cfg, chunk=4, mapping=backend)
    results = odo.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
    assert len(results) == N

    errs = [
        np.linalg.norm(lie_np.log(lie_np.relative(np.asarray(T), poses[i])))
        for i, (_, T, _) in enumerate(results)
    ]
    assert np.mean(errs) < 0.01, np.mean(errs)
    # the backend actually ran: keyframes inserted + landmarks triangulated
    assert len(backend.map.keyframes()) >= 2
    assert backend.n_landmarks > 0, "no landmarks created by the chunk backend"

    # async mode (the default above) vs sync mode: the worker only shifts
    # WHERE corrections fold in (one chunk later); both must stay inside the
    # accuracy budget and the async run must be deterministic across repeats
    backend2 = ChunkMappingBackend(enable_ba=True)
    odo2 = SequentialOdometry(CAM, cfg, chunk=4, mapping=backend2, async_mapping=False)
    results2 = odo2.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
    errs2 = [
        np.linalg.norm(lie_np.log(lie_np.relative(np.asarray(T), poses[i])))
        for i, (_, T, _) in enumerate(results2)
    ]
    assert np.mean(errs2) < 0.01, np.mean(errs2)
    assert backend2.n_landmarks > 0

    backend3 = ChunkMappingBackend(enable_ba=True)
    odo3 = SequentialOdometry(CAM, cfg, chunk=4, mapping=backend3, async_mapping=True)
    results3 = odo3.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
    for (t1, T1, _), (t3, T3, _) in zip(results, results3):
        assert t1 == t3
        np.testing.assert_allclose(T1, T3, atol=1e-9)


def test_run_staged_matches_run():
    """run_staged (device-resident replay, zero per-frame uploads) must
    produce the same trajectory as run() on the same stream — including the
    padded final chunk — and repeated staged replays must be identical
    (replays share one staging pass and are independent)."""
    from vslam_tpu.odometry.sequential import stage_stream

    poses, frames = _make_sequence()
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cfg = _seq_cfg()
    stream = [(i * DT_NS, f[0], f[1]) for i, f in enumerate(frames)]

    res_run = SequentialOdometry(cam, cfg, chunk=4).run(iter(stream))
    first, chunks = stage_stream(iter(stream), 4)
    assert len(chunks) == 3 and chunks[-1].n == 1  # 10 frames: 1 init + 4+4+1
    odo = SequentialOdometry(cam, cfg, chunk=4)
    res_staged = odo.run_staged(first, chunks)
    res_staged2 = odo.run_staged(first, chunks)  # same driver, same chunks

    assert len(res_staged) == len(res_run) == N_FRAMES
    for (t1, p1, c1), (t2, p2, c2) in zip(res_run, res_staged):
        assert t1 == t2
        np.testing.assert_allclose(p1, p2, atol=1e-9)
        np.testing.assert_allclose(c1, c2, atol=1e-9)
    for (_, p1, _), (_, p2, _) in zip(res_staged, res_staged2):
        np.testing.assert_allclose(p1, p2, atol=1e-12)

    # mapping mode: staged replay drives the same backend cadence
    from vslam_tpu.odometry.sequential_mapping import ChunkMappingBackend

    res_m = SequentialOdometry(
        cam, cfg, chunk=4, mapping=ChunkMappingBackend(enable_ba=True)
    ).run(iter(stream))
    res_ms = SequentialOdometry(
        cam, cfg, chunk=4, mapping=ChunkMappingBackend(enable_ba=True)
    ).run_staged(first, chunks)
    for (t1, p1, _), (t2, p2, _) in zip(res_m, res_ms):
        assert t1 == t2
        np.testing.assert_allclose(p1, p2, atol=1e-9)


def test_mapping_backend_compute_device_parity():
    """compute_device="cpu" routes the backend's match/BA programs through
    jax.default_device(cpu) (on a TPU session they then run CONCURRENTLY
    with the scan instead of queueing behind it); the trajectory must be
    identical to the default-device path."""
    from vslam_tpu.odometry.sequential_mapping import ChunkMappingBackend

    poses, frames = _make_sequence()
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cfg = _seq_cfg()
    stream = [(i * DT_NS, f[0], f[1]) for i, f in enumerate(frames)]

    res_default = SequentialOdometry(
        cam, cfg, chunk=4,
        mapping=ChunkMappingBackend(enable_ba=True, compute_device="default"),
    ).run(iter(stream))
    b_cpu = ChunkMappingBackend(enable_ba=True, compute_device="cpu")
    assert b_cpu._compute_dev is not None  # forced host path is active
    res_cpu = SequentialOdometry(cam, cfg, chunk=4, mapping=b_cpu).run(iter(stream))
    assert b_cpu.n_landmarks > 0
    for (t1, p1, _), (t2, p2, _) in zip(res_default, res_cpu):
        assert t1 == t2
        np.testing.assert_allclose(p1, p2, atol=1e-9)


def test_chunk_batched_tracking_matches_sequential():
    """track_schedule='chunk' (ALL of a chunk's keyframes matched in one
    vmapped device program, FeatureTracking.track_batch) vs the reference's
    per-keyframe cadence: same trajectory accuracy, comparable landmark
    yield, and in-chunk keyframes share landmarks via the transitive
    resolution path."""
    from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry
    from vslam_tpu.odometry.sequential_mapping import ChunkMappingBackend

    N = 12
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    poses = synthetic.smooth_trajectory(N, trans_amp=0.06, rot_amp=0.02)
    p0i = lie_np.inv(poses[0])
    poses = [p @ p0i for p in poses]
    frames = [synthetic.render(K, p, (H, W)) for p in poses]
    dt_ns = int(1e9 / 30)

    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
        ),
        n_levels=3,
        kf_period=3,  # chunk=6 below -> 2 keyframes per chunk
    )

    def run(track_schedule):
        backend = ChunkMappingBackend(enable_ba=True, track_schedule=track_schedule)
        odo = SequentialOdometry(CAM, cfg, chunk=6, mapping=backend)
        results = odo.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
        errs = [
            np.linalg.norm(lie_np.log(lie_np.relative(np.asarray(T), poses[i])))
            for i, (_, T, _) in enumerate(results)
        ]
        return backend, float(np.mean(errs))

    b_chunk, err_chunk = run("chunk")
    b_seq, err_seq = run("keyframe")
    assert err_chunk < 0.01, err_chunk
    assert err_seq < 0.01, err_seq
    # trajectory-level parity (advisor r3): the batched cadence's known
    # divergence — a window landmark re-observed by keyframe i-1 is seen by
    # keyframe i as both the landmark copy and the raw in-chunk feature, so
    # the ratio test can reject a true match or triangulate a duplicate —
    # must not show up as accuracy loss on the mapping trajectory
    assert err_chunk <= err_seq + 0.002, (err_chunk, err_seq)
    assert b_chunk.n_landmarks > 0 and b_seq.n_landmarks > 0
    # same physical scene, same detector output -> the two cadences must
    # triangulate comparable landmark sets (the batched path only changes
    # WHEN associations resolve, not what can be matched)
    ratio = b_chunk.n_landmarks / b_seq.n_landmarks
    assert 0.6 < ratio < 1.7, (b_chunk.n_landmarks, b_seq.n_landmarks)
    # transitive in-chunk association: at least one landmark is observed by
    # more than one keyframe under the batched cadence
    multi = [p for p in b_chunk.map.points() if len(p.observations) >= 2]
    assert multi, "batched tracking produced no multi-view landmarks"


def test_async_backend_rebase_on_correction():
    """Async mapping: corrections that fold into the device chain AFTER a
    chunk's solve must also re-base the poses the backend receives for that
    chunk. Otherwise the backend measures the same drift against its
    landmark map a second time and the write-back gate re-applies it
    (overshoot, then oscillation).

    The pipelined schedule's deterministic contract (backend_depth=2): a
    correction measured on chunk k folds into the device chain at chunk
    (k+2)'s retire — which runs after chunk (k+3)'s dispatch — so the first
    chunk solved FROM the corrected chain is k+4, and every chunk solved in
    between is re-based by the WORKER's own cumulative-correction
    bookkeeping (SequentialOdometry._worker_job / _C_worker). The stub
    backend returns a fixed world-frame delta for the first chunk and
    records every pose list it is handed."""
    N = 21  # seed + 5 full chunks of 4: c1=1-4 ... c5=17-20
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    traj = synthetic.smooth_trajectory(N, trans_amp=0.08, rot_amp=0.03)
    frames = [synthetic.render(K, p, (H, W)) for p in traj]
    delta = np.eye(4)
    delta[:3, 3] = [0.5, -0.2, 0.1]

    class StubBackend:
        def __init__(self):
            self.calls = []

        def process_chunk(self, buf, est_poses, covs, kf_flags, camera, cfg,
                          device_images=None):
            self.calls.append([np.asarray(p, np.float64) for p in est_poses])
            # call 1 = frame-0 seed, call 2 = first real chunk -> correct it
            return delta if len(self.calls) == 2 else None

    backend = StubBackend()
    odo = SequentialOdometry(
        Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2), _seq_cfg(), chunk=4,
        mapping=backend, async_mapping=True,
    )
    results = odo.run((i * DT_NS, f[0], f[1]) for i, f in enumerate(frames))
    assert len(results) == N
    assert len(backend.calls) == 6
    # chunks 2, 3 and 4 were all solved before chunk 1's delta folded into
    # the device chain (the fold happens at chunk 3's retire, after chunk
    # 4's dispatch); the backend must see ALL of them in the corrected frame
    raw = [np.asarray(T) for _, T, _ in results]
    for call, lo in ((2, 5), (3, 9), (4, 13)):
        for handed, raw_T in zip(backend.calls[call], raw[lo : lo + 4]):
            # right-composed correction algebra (r5): re-basing appends the
            # delta, preserving each pose's camera-relative history
            np.testing.assert_allclose(handed, raw_T @ delta, atol=1e-12)
    # ...while the chunk AFTER the fold continues from the corrected chain
    # directly: frame 17 tracks from a state that already contains delta, so
    # its pose must carry the correction (and the backend is handed its
    # poses UN-re-based — the chain already includes delta)
    jump = np.asarray(results[17][1])
    drift = np.linalg.norm((jump @ lie_np.inv(raw[16]))[:3, 3])
    assert drift > 0.3, "the fold never reached the device chain"
    for handed, raw_T in zip(backend.calls[5], raw[17:21]):
        np.testing.assert_allclose(handed, raw_T, atol=1e-12)


def test_descriptor_bit_packing_roundtrip():
    """pack_bits/unpack_bits/as_float_bits agree with np.unpackbits bit
    order, and the packed transport is lossless."""
    import jax.numpy as jnp

    from vslam_tpu.features import descriptor as desc_mod

    rng = np.random.default_rng(3)
    bits = (rng.random((17, desc_mod.N_BITS)) < 0.5).astype(np.float32)
    packed = np.asarray(desc_mod.pack_bits(jnp.asarray(bits)))
    assert packed.shape == (17, desc_mod.N_BYTES) and packed.dtype == np.uint8
    np.testing.assert_array_equal(
        np.unpackbits(packed, axis=-1).astype(np.float32), bits
    )
    np.testing.assert_array_equal(
        np.asarray(desc_mod.unpack_bits(jnp.asarray(packed))), bits
    )
    np.testing.assert_array_equal(desc_mod.as_float_bits(packed), bits)
    np.testing.assert_array_equal(desc_mod.as_float_bits(bits), bits)


def test_fused_path_loop_closure_fires():
    """Loop closure on the fused path: an out-and-back sweep revisits the
    start view; the chunk backend's place recognition + pose graph must fire
    and the applied correction must keep the trajectory consistent."""
    from vslam_tpu.features.loop_closure import LoopClosureConfig
    from vslam_tpu.odometry.graph_backend import PoseGraphBackend
    from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry
    from vslam_tpu.odometry.sequential_mapping import ChunkMappingBackend

    # N chosen so the final frame is BOTH a keyframe (kf_period | N-1) and
    # the exact revisit of the start view (sin(2 pi) = 0)
    N = 25
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    scene = synthetic.BoxScene(seed=6)
    # smooth out-and-back: sinusoidal lateral sweep + small yaw, ends at start
    ts = np.linspace(0, 2 * np.pi, N)
    poses = [
        lie_np.exp(np.array([0.25 * np.sin(t), 0.0, 0.0, 0.0, 0.08 * np.sin(t), 0.0]))
        for t in ts
    ]
    frames = [synthetic.render_boxes(K, p, (H, W), scene) for p in poses]
    dt_ns = int(1e9 / 30)

    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
        ),
        n_levels=2,
        kf_period=4,
    )
    backend = ChunkMappingBackend(enable_ba=False, enable_loop_closure=True)
    # tighter thresholds for the small test images
    backend._graph = PoseGraphBackend(LoopClosureConfig(min_gap=3, min_matches=10, min_inliers=8))
    odo = SequentialOdometry(CAM, cfg, chunk=6, mapping=backend)
    results = odo.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
    assert len(results) == N

    errs = [
        np.linalg.norm(lie_np.log(lie_np.relative(np.asarray(T), poses[i])))
        for i, (_, T, _) in enumerate(results)
    ]
    # occluded box scene at a fast sweep drifts more than the plane tests;
    # the point here is the closure machinery, not odometry accuracy
    assert np.mean(errs) < 0.06, np.mean(errs)
    assert backend._graph.n_closures >= 1, "revisit not detected on the fused path"


def test_fused_scan_kalman_prediction():
    """prediction.model=Kalman on the fused path: the in-scan EKF
    (predict/anchor/velocity-update per frame, MotionPrediction.cpp:57-81
    semantics) tracks the sequence and its velocity estimate converges to
    the true inter-frame twist."""
    import dataclasses
    import jax

    from vslam_tpu.odometry.sequential import SequentialConfig, SequentialOdometry

    N = 14
    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    # constant-velocity ground truth: the EKF's exact process model
    xi_step = np.array([0.01, -0.004, 0.006, 0.002, -0.003, 0.001])
    poses = [np.eye(4)]
    for _ in range(N - 1):
        poses.append(lie_np.exp(xi_step) @ poses[-1])
    frames = [synthetic.render(K, p, (H, W)) for p in poses]
    dt_ns = int(1e9 / 30)

    cfg = SequentialConfig(
        alignment=AlignmentConfig(
            min_gradient=10.0,
            solver=SolverConfig(max_iterations=50, min_step_size=1e-7),
            include_prior=True,
        ),
        prediction_model="Kalman",
        n_levels=2,
        kf_period=4,
    )
    odo = SequentialOdometry(CAM, cfg, chunk=7)
    results = odo.run((i * dt_ns, f[0], f[1]) for i, f in enumerate(frames))
    assert len(results) == N
    errs = np.asarray([
        np.linalg.norm(lie_np.log(lie_np.relative(np.asarray(T), poses[i])))
        for i, (_, T, _) in enumerate(results)
    ])
    # the filter starts at zero velocity, so the first frames lag and that
    # offset persists in the dead-reckoned chain (ATE stays bounded and
    # decays); the meaningful post-warm-up claim is on the INCREMENTS:
    # once the velocity has converged, per-frame drift stops accumulating
    assert np.mean(errs) < 0.03, errs
    assert errs[-1] <= errs[N // 2] + 1e-4, errs  # no further growth
    rel_errs = [
        np.linalg.norm(
            lie_np.log(
                lie_np.relative(
                    lie_np.relative(np.asarray(results[i][1]), np.asarray(results[i + 1][1])),
                    lie_np.relative(poses[i], poses[i + 1]),
                )
            )
        )
        for i in range(N // 2, N - 1)
    ]
    assert np.mean(rel_errs) < 0.005, rel_errs
    # the filter's velocity state converged toward the true twist rate
    v = np.asarray(odo.state.ekf.velocity)
    v_true = xi_step * 30.0  # per second
    assert np.linalg.norm(v - v_true) < 0.2 * np.linalg.norm(v_true), (v, v_true)
