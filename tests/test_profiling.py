"""Tracing/profiling subsystem (SURVEY.md §5: reference TIMED_FUNC perf
tracking + valgrind/kcachegrind -> jax.profiler traces + XLA cost model)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.utils import profiling, timer


def test_cost_analysis_reports_flops_and_memory():
    def f(a, b):
        return a @ b + 1.0

    a = jnp.ones((64, 64), jnp.float32)
    out = profiling.cost_analysis(f, a, a)
    # the CPU backend reports at least the memory analysis; flops when the
    # cost model is available
    assert out, "cost_analysis returned nothing"
    assert any(k.endswith("_in_bytes") for k in out) or "flops" in out
    if "flops" in out:
        # 64x64x64 matmul = 2*64^3 = 524288 FLOPs (+ adds); sanity-bound it
        assert out["flops"] >= 2 * 64**3


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        with profiling.annotate("solve"):
            x = jnp.ones((32, 32)) @ jnp.ones((32, 32))
            x.block_until_ready()
    walked = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert walked, "no trace files written"


def test_stage_timer_report():
    timer.reset()
    with timer.scope("align"):
        np.linalg.inv(np.eye(8))
    s = timer.stats("align")
    assert s["count"] == 1 and s["mean_ms"] >= 0.0
