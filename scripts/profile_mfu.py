"""MFU / bottleneck report for the headline fused-GN alignment kernel.

Computes an MFU-style utilization number for `fused_solve.solve_level_fused`
at the exact bench profile (`bench.py bench_real`): measured pairs/s times an
ANALYTIC per-pair MXU FLOP count, divided by the chip's peak.

Why analytic: XLA's cost model (`utils.profiling.cost_analysis`) cannot see
inside a Pallas kernel — it reports ~0 FLOPs for the fused program — so the
count comes from the shared model `utils.profiling.fused_align_flops`
(mirroring fused_ne.py's banded sampling: nb * 2*C*BAND*w per chunk per GN
iteration plus the column mix and Gram terms; band-segment counts nb are
measured from the actual interest points + converged warp via
`banded_segments_from_data`).

Iteration counts come from the solver's OWN telemetry (SolverResult history,
`ic.align(with_diagnostics=True)`), summed over the B pairs and L levels of
the bench problem; point budgets shrink 4x per level (ic.align).

The FLOPs are REAL work the MXU executes (the kernel deliberately converts a
gather into a structured matmul — SNIPPETS.md one-hot sampling pattern), but
many are still multiplies by zero of a one-hot operand: "algorithmic" FLOPs
(what a CPU gather would do) print alongside. MFU-vs-peak uses the executed
count, which is what bounds further speedup from THIS formulation on the MXU.

Run: PYTHONPATH=. python scripts/profile_mfu.py   (one real chip, ~2 min)
Env: MFU_BATCH (64), MFU_REPS (20), BENCH_POINTS/BENCH_IMG_DTYPE as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

# self-locating: `python scripts/profile_mfu.py` from anywhere. The repo
# root is PREPENDED to sys.path (never touches PYTHONPATH itself, which may
# be carrying the TPU platform plugin).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vslam_tpu.alignment.ic import AlignmentConfig
from vslam_tpu.core import lie_np
from vslam_tpu.core.camera import Camera
from vslam_tpu.core.frame import create_frame
from vslam_tpu.core.se3 import SE3
from vslam_tpu.io import synthetic
from vslam_tpu.solvers import SolverConfig
from vslam_tpu.utils.profiling import (
    banded_segments_from_data, fused_align_flops, tpu_peaks,
)


def main():
    B = int(os.environ.get("MFU_BATCH", "64"))
    REPS = int(os.environ.get("MFU_REPS", "20"))
    H, W, FX = 480, 640, 525.0
    C = 1024  # fused kernel chunk (fused_ne._CHUNK)

    K = synthetic.camera_matrix(FX, FX, (W - 1) / 2, (H - 1) / 2)
    cam = Camera.create(FX, FX, (W - 1) / 2, (H - 1) / 2)
    rng = np.random.default_rng(0)
    refs, curs = [], []
    for b in range(B):
        scene = synthetic.default_scene(seed=b)
        xi = np.concatenate(
            [rng.uniform(-0.01, 0.01, 3), rng.uniform(-0.005, 0.005, 3)]
        )
        i0, d0 = synthetic.render(K, np.eye(4), (H, W), scene)
        i1, d1 = synthetic.render(K, lie_np.exp(xi), (H, W), scene)
        refs.append(create_frame(jnp.asarray(i0), jnp.asarray(d0), cam, n_levels=3))
        curs.append(create_frame(jnp.asarray(i1), jnp.asarray(d1), cam, n_levels=3))
    stack = lambda fs: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fs)
    ref, cur = stack(refs), stack(curs)
    rel0 = SE3(
        jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)),
        jnp.zeros((B, 3), jnp.float32),
    )
    x_pred = jnp.zeros((B, 6), jnp.float32)

    max_points = int(os.environ.get("BENCH_POINTS", "2048"))
    cfg = AlignmentConfig(
        min_gradient=30.0,
        solver=SolverConfig(
            max_iterations=100, min_step_size=1e-11, min_relative_reduction=1e-4
        ),
        include_prior=True,
        interpolation=os.environ.get("BENCH_INTERP", "nearest"),
        sampler=os.environ.get("BENCH_SAMPLER", "fused_gn"),
        image_dtype=os.environ.get("BENCH_IMG_DTYPE", "bfloat16"),
        max_points=max_points,
    )

    # --- iteration telemetry: the solver's own accepted-iteration counters,
    # plus the converged warps + interest points for the band-segment model
    from vslam_tpu.alignment import ic

    @jax.jit
    def diag_pairs(ref, cur, rel0, x_pred):
        def one(ref_i, cur_i, rel_i, xp_i):
            ref_f = jax.tree_util.tree_map(lambda x: x[None], ref_i)
            r, _, _, diag = ic.align(
                ref_f, cur_i, SE3(rel_i.R[None], rel_i.t[None]),
                xp_i[None], cfg, with_diagnostics=True,
            )
            data = ic.precompute_frame(ref_i, cfg)
            return (diag["iterations"], r.R[0], r.t[0],
                    tuple(lv.pcl for lv in data), tuple(lv.mask for lv in data))

        return jax.vmap(one)(ref, cur, rel0, x_pred)

    iters, Rf, tf, pcls, masks = jax.device_get(diag_pairs(ref, cur, rel0, x_pred))
    iters = np.asarray(iters).reshape(B, -1)  # (B, L) coarsest first
    L = iters.shape[1]
    # align() solves coarsest first; level l here = pyramid level (L-1-row)
    iters_by_level = iters[:, ::-1]  # (B, L) finest first

    # --- timing: identical harness to bench_real (one fori_loop dispatch)
    from vslam_tpu.parallel.batched import align_pairs

    import functools

    @functools.partial(jax.jit, static_argnames=("reps",))
    def bench_loop(ref, cur, rel0, x_pred, reps: int):
        def body(i, rel_prev):
            # unfoldable carry — every rep pays the full per-align cost
            # including precompute (bench.py methodology v3)
            rel_in = SE3(
                rel0.R + 1e-30 * rel_prev.R, rel0.t + 1e-30 * rel_prev.t
            )
            r, _, _ = align_pairs(ref, cur, rel_in, x_pred, cfg)
            return r

        return jax.lax.fori_loop(0, reps, body, rel0)

    r = bench_loop(ref, cur, rel0, x_pred, reps=REPS)
    _ = np.asarray(r.t)
    t0 = time.perf_counter()
    r = bench_loop(ref, cur, rel0, x_pred, reps=REPS)
    _ = np.asarray(r.t)
    elapsed = time.perf_counter() - t0
    pairs_per_sec = B * REPS / elapsed

    # --- analytic executed-FLOP count (shared model, see module docstring)
    from vslam_tpu.alignment.fused_ne import _BAND

    level_shapes = [(H >> lvl, W >> lvl) for lvl in range(L)]
    FXf = float(FX)
    segs, points = [], []
    for lvl in range(L):
        h, w = level_shapes[lvl]
        points.append(int(pcls[lvl].shape[1]))
        if h <= _BAND:
            segs.append(1.0)
            continue
        per_pair = [
            banded_segments_from_data(
                pcls[lvl][b], masks[lvl][b], Rf[b], tf[b],
                FXf / (1 << lvl), FXf / (1 << lvl),
                ((W - 1) / 2) / (1 << lvl), ((H - 1) / 2) / (1 << lvl),
                h, w, band=_BAND, chunk=C,
                bilinear=(cfg.interpolation == "bilinear"),
            )[0]
            for b in range(B)
        ]
        segs.append(float(np.mean(per_pair)))

    total_flops, algo_flops, per_level = fused_align_flops(
        iters_by_level, level_shapes, points, seg_by_level=segs,
        chunk=C, band=_BAND,
    )

    flops_per_pair = total_flops / B
    achieved_tflops = pairs_per_sec * flops_per_pair / 1e12

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "") or os.environ.get(
        "PALLAS_AXON_TPU_GEN", "unknown"
    )
    peak_tflops, peak_hbm = tpu_peaks(str(kind))
    mfu = achieved_tflops / peak_tflops if peak_tflops else None

    # cost_analysis for context: documents that XLA's model can't see the
    # Pallas FLOPs (and gives the program's HBM argument traffic)
    from vslam_tpu.utils.profiling import cost_analysis

    try:
        costs = cost_analysis(
            lambda a, b, c, d: align_pairs(a, b, c, d, cfg), ref, cur, rel0, x_pred
        )
    except Exception as exc:  # tunnel hiccup: report without it
        costs = {"error": str(exc)}

    report = {
        "device_kind": str(kind),
        "batch": B,
        "pairs_per_sec": round(pairs_per_sec, 2),
        "iters_mean_per_pair": round(float(iters_by_level.sum(1).mean()), 2),
        "per_level": per_level,
        "executed_gflops_per_pair": round(flops_per_pair / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "peak_tflops_bf16": peak_tflops,
        "mfu_pct": round(100 * mfu, 1) if mfu is not None else None,
        "algorithmic_gflops_per_pair": round(algo_flops / B / 1e9, 3),
        "xla_cost_model": costs,
    }
    print(json.dumps(report, indent=2))
    if mfu is not None:
        print(
            f"\nfused-GN MXU utilization: {achieved_tflops:.1f} TFLOP/s "
            f"executed = {100 * mfu:.1f}% of {kind} bf16 peak "
            f"({peak_tflops:.0f} TFLOP/s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
