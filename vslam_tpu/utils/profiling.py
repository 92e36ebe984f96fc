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

__all__ = [
    "trace", "annotate", "cost_analysis", "device_memory_stats",
    "banded_segments_from_data", "fused_align_flops",
]


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


# ---------------------------------------------------------------------------
# Analytic executed-FLOP model of the fused alignment kernel (MFU reporting)
# ---------------------------------------------------------------------------

def banded_segments_from_data(
    pcl, mask, rel_R, rel_t, fx, fy, cx, cy, H, W,
    band: int = 128, chunk: int = 1024, bilinear: bool = True,
):
    """Mean one-hot band segments per point-chunk for ONE frame/level, from
    the level's interest points and a representative warp (numpy, host-side).

    Mirrors the kernel's banding exactly (fused_ne._sample_chunk): chunks of
    ``chunk`` consecutive points; per chunk the warped rows' [vmin, vmax]
    span, a sublane-aligned start, and nb = ceil(span / band) segments. The
    GN iterations' warps differ by sub-pixel steps, so the final relative
    pose is a faithful proxy for every iteration's band count. Returns
    (mean segments per chunk, n_chunks)."""
    import numpy as np

    pcl = np.asarray(pcl, np.float64).reshape(-1, 3)
    mask = np.asarray(mask, bool).reshape(-1)
    N = pcl.shape[0]
    nc = max(1, -(-N // chunk))
    p = pcl @ np.asarray(rel_R, np.float64).T + np.asarray(rel_t, np.float64)
    z_ok = p[:, 2] > 0
    zi = np.where(z_ok, p[:, 2], 1.0)
    u = fx * p[:, 0] / zi + cx
    v = fy * p[:, 1] / zi + cy
    visible = mask & z_ok & (u > 1) & (u < W - 1) & (v > 1) & (v < H - 1)
    v0 = np.floor(np.where(visible, v, 0.0)).astype(np.int64)
    vhi = v0 + (1 if bilinear else 0)
    total = 0
    for c in range(nc):
        s = slice(c * chunk, min((c + 1) * chunk, N))
        vis_c = visible[s]
        if not vis_c.any():
            continue
        vmin = int(v0[s][vis_c].min())
        vmax = int(vhi[s][vis_c].max())
        r0 = (vmin // 8) * 8
        total += max(-(-(vmax + 1 - r0) // band), 0)
    return total / nc, nc


def fused_align_flops(
    iters_by_level, level_shapes, points_by_level,
    seg_by_level=None, chunk: int = 1024, band: int = 128,
):
    """Analytic executed/algorithmic FLOPs of the fused-GN alignment kernel
    over a batch (fused_ne.py): per GN iteration, per ``chunk``-point chunk,

      banded one-hot sampling  nb * 2*C*band*w      (2*C*h*w when h <= band:
                                                     banding compiled out)
      column mix + reduce      ~ 3*C*w
      Gram block               (8,C) x (C,8) = 128*C

    ``iters_by_level``: (B, L) accepted GN iterations, FINEST level first.
    ``level_shapes``: [(h, w)] finest first. ``points_by_level``: interest
    budget per level. ``seg_by_level``: (L,) mean band segments per chunk
    (measured via banded_segments_from_data; ignored where h <= band).
    Returns (executed_flops, algorithmic_flops, per_level list) summed over
    the batch."""
    import numpy as np

    iters = np.asarray(iters_by_level, np.float64)
    L = iters.shape[1]
    C = float(chunk)
    executed = 0.0
    algorithmic = 0.0
    per_level = []
    for lvl in range(L):
        h, w = level_shapes[lvl]
        budget = points_by_level[lvl]
        nc = max(1, -(-budget // chunk))
        it_sum = float(iters[:, lvl].sum())
        if h > band:
            nb = float(seg_by_level[lvl]) if seg_by_level is not None else 1.0
            sampling = nb * 2.0 * C * band * w
        else:
            sampling = 2.0 * C * h * w
        fl = it_sum * nc * (sampling + 3.0 * C * w + 128.0 * C)
        executed += fl
        algorithmic += it_sum * budget * 60.0
        per_level.append(dict(
            level=lvl, hw=f"{h}x{w}", points=budget, chunks=nc,
            iters_mean=round(float(iters[:, lvl].mean()), 2),
            segs_per_chunk=(round(float(seg_by_level[lvl]), 2)
                            if (seg_by_level is not None and h > band) else None),
            gflops=round(fl / 1e9, 2),
        ))
    return executed, algorithmic, per_level


# bf16 peak TFLOP/s per chip (MXU) and HBM GB/s, by device_kind substring.
# Sources: public TPU spec sheets (v4: 275, v5e: 197, v5p: 459, v6e: 918).
_TPU_PEAKS = {
    "v6e": (918.0, 1640.0),
    "v6": (918.0, 1640.0),
    "v5p": (459.0, 2765.0),
    "v5e": (197.0, 819.0),
    "v5 lite": (197.0, 819.0),
    "v5litepod": (197.0, 819.0),
    "v4": (275.0, 1228.0),
}


def tpu_peaks(kind: str):
    """(bf16 peak TFLOP/s, HBM GB/s) for a device_kind string, or (None,
    None) when unknown."""
    k = str(kind).lower()
    for sub, peak in _TPU_PEAKS.items():
        if sub in k:
            return peak
    return None, None
