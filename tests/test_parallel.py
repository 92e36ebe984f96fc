"""Batched / sharded tracking tests: the batched path must match the
single-pair aligner, and the sharded step must run on a CPU mesh (the
driver's dryrun_multichip covers compile+run; this covers correctness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.alignment import AlignmentConfig, RgbdAligner
from vslam_tpu.core import lie_np, se3
from vslam_tpu.core.camera import Camera
from vslam_tpu.core.frame import create_frame
from vslam_tpu.core.se3 import SE3
from vslam_tpu.io import synthetic
from vslam_tpu.kalman import ekf_se3
from vslam_tpu.parallel import batched
from vslam_tpu.solvers import SolverConfig

H, W, FX = 96, 128, 110.0
K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
CAM = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)

CFG = AlignmentConfig(
    min_gradient=10.0,
    solver=SolverConfig(max_iterations=40, min_step_size=1e-7),
    include_prior=False,
)


def make_pairs(B, seed=0):
    rng = np.random.default_rng(seed)
    refs, curs, xis = [], [], []
    for b in range(B):
        scene = synthetic.default_scene(seed=b)
        xi = np.concatenate([rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.01, 0.01, 3)])
        xis.append(xi)
        i0, d0 = synthetic.render(K, np.eye(4), (H, W), scene)
        i1, d1 = synthetic.render(K, lie_np.exp(xi), (H, W), scene)
        refs.append(create_frame(jnp.asarray(i0), jnp.asarray(d0), CAM, n_levels=3))
        curs.append(create_frame(jnp.asarray(i1), jnp.asarray(d1), CAM, n_levels=3))
    stack = lambda fs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fs)
    return stack(refs), stack(curs), refs, curs, xis


def test_batched_matches_single():
    B = 3
    ref_b, cur_b, refs, curs, xis = make_pairs(B)
    rel0 = SE3(
        jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)),
        jnp.zeros((B, 3), jnp.float32),
    )
    rel, cov, valid = batched.align_pairs(ref_b, cur_b, rel0, None, CFG)
    assert bool(jnp.all(valid))
    aligner = RgbdAligner(CFG)
    for b in range(B):
        # batched result close to ground truth and to the single-pair result
        Tb = np.eye(4)
        u, _, vt = np.linalg.svd(np.asarray(rel.R[b], np.float64))
        Tb[:3, :3] = u @ vt
        Tb[:3, 3] = np.asarray(rel.t[b])
        err = np.linalg.norm(lie_np.log(Tb) - xis[b])
        assert err < 0.01, f"pair {b} err {err}"
        pose_s, _, ok = aligner.align([refs[b]], [np.eye(4)], curs[b], np.eye(4))
        assert ok
        d = np.linalg.norm(lie_np.log(lie_np.relative(Tb, pose_s)))
        assert d < 2e-3, f"batched vs single mismatch {d}"


def test_tracking_step_converges_sequences():
    """Two on-device tracking steps over the same pair: the EKF velocity
    should move toward the measured twist."""
    B = 2
    ref_b, cur_b, _, _, xis = make_pairs(B, seed=3)
    ekf0 = jax.vmap(lambda _: ekf_se3.init(dtype=jnp.float32))(jnp.arange(B))
    dt = jnp.full((B,), 1.0 / 30.0, jnp.float32)
    cfg = AlignmentConfig(
        min_gradient=10.0,
        solver=SolverConfig(max_iterations=30, min_step_size=1e-7),
        include_prior=True,
        # unit prior information is tuned for fx=525; this test runs fx=110
        prior_weight=(110.0 / 525.0) ** 2,
    )
    # iterate the same pair: the EKF bootstraps its velocity and the motion
    # prior then centers on the right relative pose
    ekf = ekf0
    for _ in range(3):
        ekf, rel, valid = batched.tracking_step(ekf, ref_b, cur_b, dt, cfg)
        assert bool(jnp.all(valid))
    v = np.asarray(ekf.velocity)
    for b in range(B):
        want = xis[b] / (1.0 / 30.0)
        cos = np.dot(v[b], want) / max(np.linalg.norm(v[b]) * np.linalg.norm(want), 1e-9)
        assert cos > 0.9, f"seq {b}: velocity direction cos {cos}"
        mag = np.linalg.norm(v[b]) / np.linalg.norm(want)
        assert 0.5 < mag < 1.5, f"seq {b}: velocity magnitude ratio {mag}"


def test_sharded_tracking_step_cpu_mesh():
    """shard_map path over the virtual CPU mesh (multi-chip stand-in)."""
    devices = jax.devices("cpu")
    n = min(4, len(devices))
    if n < 2:
        pytest.skip("needs >=2 CPU devices (xla_force_host_platform_device_count)")
    mesh = batched.make_mesh(devices[:n])
    B = 2 * n
    ref_b, cur_b, _, _, _ = make_pairs(B, seed=5)
    cfg = AlignmentConfig(
        min_gradient=5.0,
        solver=SolverConfig(max_iterations=5, min_step_size=1e-6),
        include_prior=True,
    )
    ekf0 = jax.vmap(lambda _: ekf_se3.init(dtype=jnp.float32))(jnp.arange(B))
    dt = jnp.full((B,), 1.0 / 30.0, jnp.float32)
    ekf0 = batched.shard_batch(ekf0, mesh)
    ref_b = batched.shard_batch(ref_b, mesh)
    cur_b = batched.shard_batch(cur_b, mesh)
    dt = batched.shard_batch(dt, mesh)
    step = batched.sharded_tracking_step(mesh, cfg)
    ekf1, rel, valid, frac = step(ekf0, ref_b, cur_b, dt)
    assert rel.t.shape == (B, 3)
    assert 0.0 <= float(frac) <= 1.0


def test_multihost_sequence_sharding():
    """Contiguous block partition covers all sequences exactly once."""
    from vslam_tpu.parallel import multihost

    for n_seq, n_proc in [(10, 4), (8, 8), (3, 4), (7, 2)]:
        slices = [multihost.shard_sequences(n_seq, p, n_proc) for p in range(n_proc)]
        flat = [i for s in slices for i in s]
        assert flat == list(range(n_seq)), (n_seq, n_proc, flat)
        sizes = [len(s) for s in slices]
        assert max(sizes) - min(sizes) <= 1  # balanced


def test_multihost_2d_mesh_tracking_step():
    """(host, data) mesh fold on the virtual CPU devices: the 2-axis sharded
    tracking step (two-stage ICI-then-DCN psum) compiles, runs, and matches
    the unsharded step."""
    from vslam_tpu.parallel import multihost

    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs >=4 CPU devices")
    mesh = multihost.dcn_ici_mesh(n_hosts=2, devices=devices[:4])
    assert mesh.devices.shape == (2, 2)
    B = 8
    ref_b, cur_b, _, _, _ = make_pairs(B, seed=7)
    cfg = AlignmentConfig(
        min_gradient=5.0,
        solver=SolverConfig(max_iterations=5, min_step_size=1e-6),
        include_prior=True,
    )
    ekf0 = jax.vmap(lambda _: ekf_se3.init(dtype=jnp.float32))(jnp.arange(B))
    dt = jnp.full((B,), 1.0 / 30.0, jnp.float32)

    ekf1_ref, rel_ref, valid_ref = batched.tracking_step(ekf0, ref_b, cur_b, dt, cfg)

    ekf0_s = multihost.shard_batch_2d(ekf0, mesh)
    ref_s = multihost.host_local_to_global(ref_b, mesh)  # 1-process: same layout
    cur_s = multihost.shard_batch_2d(cur_b, mesh)
    dt_s = multihost.shard_batch_2d(dt, mesh)
    step = multihost.sharded_tracking_step_2d(mesh, cfg)
    ekf1, rel, valid, frac = step(ekf0_s, ref_s, cur_s, dt_s)

    assert rel.t.shape == (B, 3)
    np.testing.assert_allclose(np.asarray(rel.t), np.asarray(rel_ref.t), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
    expected_frac = float(np.mean(np.asarray(valid_ref, np.float32)))
    assert abs(float(frac) - expected_frac) < 1e-6
