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
