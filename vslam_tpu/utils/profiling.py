"""Device-level tracing & compiled-program cost inspection.

TPU-native replacement for the reference's profiling stack (SURVEY.md §5):
easylogging++ ``TIMED_FUNC`` performance tracking (`GaussNewton.cpp:36,45`,
`SE3Alignment.cpp:69,111`, `NodeMapping.cpp:145`) maps to the host-side
stage timers in `utils/timer.py`; valgrind/kcachegrind (`Dockerfile:5`) maps
to the two tools here:

- ``trace(dir)``: a context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace (per-kernel timeline, HBM traffic) for
  any pipeline section. Enabled in the CLI via ``--profile-dir``.
- ``cost_analysis(fn, *args)``: XLA's static cost model for a jitted
  function — FLOPs, bytes accessed, peak memory estimates — the
  "kcachegrind view" of a compiled program, per config rather than per run.
- ``device_memory_stats()``: live HBM usage of the backing device.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax

__all__ = ["trace", "annotate", "cost_analysis", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (TensorBoard / xprof format).

    Wrap exactly the region of interest; traces of whole replays are huge.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside an active trace (shows up on the timeline the
    way the reference's TIMED_SCOPE names show in its perf logs)."""
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args, static_argnames=(), **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` for ``args`` and return XLA's cost model summary.

    Returns {"flops", "bytes_accessed", "peak_memory_bytes", ...} (keys that
    the backend reports; missing entries are omitted). The function is only
    compiled, never executed — safe to call on huge configs.
    """
    jitted = jax.jit(fn, static_argnames=static_argnames)
    compiled = jitted.lower(*args, **kwargs).compile()
    out: Dict[str, Any] = {}
    try:
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):  # older JAX returns [dict]
            costs = costs[0] if costs else {}
        for key in ("flops", "bytes accessed", "optimal_seconds"):
            if costs and key in costs:
                out[key.replace(" ", "_")] = float(costs[key])
    except Exception:  # backend without a cost model
        pass
    try:
        mem = compiled.memory_analysis()
        for key in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(mem, key, None)
            if v is not None:
                out[key] = int(v)
    except Exception:
        pass
    return out


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Live allocator stats of ``device`` (default: first device). Empty on
    backends without memory_stats (e.g. CPU)."""
    dev = device or jax.devices()[0]
    stats = dev.memory_stats() or {}
    return {k: int(v) for k, v in stats.items() if isinstance(v, (int, float))}
