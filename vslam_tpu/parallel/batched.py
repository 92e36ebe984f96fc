"""Batched and sharded frame-pair tracking — the TPU throughput mode.

The reference is single-sequence/single-process; its only "distributed" layer
is the ROS node graph (SURVEY.md §2.9). The TPU-native scaling axis is
*batch*: B independent frame-pairs (from one or many sequences) are aligned
in one fused program via `vmap`, and the batch is sharded across a device
mesh via `shard_map` — collectives ride ICI (a psum aggregates global
convergence stats; the per-pair solves are embarrassingly parallel).

This is the benchmark path for BASELINE.json's ">= 500 aligned
frame-pairs/sec/chip" target and the multi-chip entry exercised by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alignment import ic
from ..alignment.ic import AlignmentConfig
from ..core.frame import Frame
from ..core.se3 import SE3
from ..kalman import ekf_se3

__all__ = [
    "align_pairs",
    "tracking_step",
    "make_mesh",
    "shard_batch",
    "sharded_tracking_step",
]


def _align_one(ref: Frame, cur: Frame, rel_init: SE3, x_pred, cfg: AlignmentConfig):
    # add the frame-stack axis F=1 expected by ic.align
    ref_f = jax.tree_util.tree_map(lambda x: x[None], ref)
    return ic.align(ref_f, cur, SE3(rel_init.R[None], rel_init.t[None]),
                    x_pred[None] if x_pred is not None else None, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def align_pairs(
    ref: Frame,  # leaves batched (B, ...)
    cur: Frame,  # leaves batched (B, ...)
    rel_init: SE3,  # (B, 3, 3), (B, 3)
    x_pred: Optional[jax.Array],  # (B, 6) prior means, or None
    cfg: AlignmentConfig,
) -> Tuple[SE3, jax.Array, jax.Array]:
    """vmap of the coarse-to-fine aligner over B independent pairs.
    Returns (rel (B,), cov (B, 6, 6), valid (B,))."""
    def one(ref_i, cur_i, rel_i, xp_i):
        rel, cov, valid = _align_one(ref_i, cur_i, rel_i, xp_i, cfg)
        return SE3(rel.R[0], rel.t[0]), cov, valid

    if x_pred is None:
        x_pred = jnp.zeros((rel_init.t.shape[0], 6), rel_init.t.dtype)
    return jax.vmap(one)(ref, cur, rel_init, x_pred)


@functools.partial(jax.jit, static_argnames=("cfg",))
def tracking_step(
    ekf: ekf_se3.EkfState,  # batched (B, ...) per-sequence filters
    ref: Frame,
    cur: Frame,
    dt: jax.Array,  # (B,) seconds
    cfg: AlignmentConfig,
) -> Tuple[ekf_se3.EkfState, SE3, jax.Array]:
    """One fully on-device tracking step for B sequences: EKF predict ->
    dense alignment (prediction as init + prior) -> EKF velocity update.
    This is the framework's 'training step' analog: everything stays on
    device, the host only feeds frames."""
    from ..core import se3 as se3_mod

    def predict_one(state, dt_i):
        # relative cur<-ref prediction = exp(v dt); covariance propagates
        # through the EKF process model (the filter's pose slot tracks the
        # accumulated relative chain and is re-anchored by the aligner)
        state2, _ = ekf_se3.predict(state, dt_i)
        return state2, se3_mod.exp(state.velocity * dt_i)

    ekf_pred, rel_pred = jax.vmap(predict_one)(ekf, dt)
    x_pred = jax.vmap(se3_mod.log)(rel_pred)
    rel, cov, valid = align_pairs(ref, cur, rel_pred, x_pred, cfg)

    def update_one(state, rel_i, cov_i, dt_i, ok):
        # measurement = speed twist log(rel)/dt. Measurement noise uses the
        # aligner's covariance STRUCTURE (per-axis relative uncertainty from
        # A^-1, SE3Alignment.cpp:101) normalized to a calibrated scale: the
        # absolute scale of a photometric A^-1 is arbitrary (intensity units,
        # 1/255^2 + prior normalizers), and the reference itself feeds plain
        # identity into its EKF (MotionPrediction.cpp:84 covMotion = I) — we
        # keep its calibration but weight axes by the solve's conditioning.
        v_meas = se3_mod.log(rel_i) / jnp.maximum(dt_i, 1e-6)
        R = ekf_se3.measurement_noise_from_cov(cov_i, scale=1e-2)
        new = ekf_se3.update(state, v_meas, R)
        return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), new, state)

    ekf_new = jax.vmap(update_one)(ekf_pred, rel, cov, dt, valid)
    return ekf_new, rel, valid


# ---------------------------------------------------------------------------
# Multi-chip sharding
# ---------------------------------------------------------------------------


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a batched pytree with the leading axis sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def sharded_tracking_step(mesh: Mesh, cfg: AlignmentConfig, axis: str = "data"):
    """Build the pjit-compiled multi-chip tracking step: batch sharded over
    `axis`, per-pair solves local to each chip, one psum aggregating global
    convergence stats over ICI."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    bspec = P(axis)

    def local_step(ekf, ref, cur, dt):
        ekf_new, rel, valid = tracking_step(ekf, ref, cur, dt, cfg)
        # global health metric: fraction of converged pairs (ICI collective)
        n_ok = jnp.sum(valid.astype(jnp.float32))
        n = jnp.asarray(valid.shape[0], jnp.float32)
        frac = jax.lax.psum(n_ok, axis) / jax.lax.psum(n, axis)
        return ekf_new, rel, valid, frac

    kwargs = dict(
        mesh=mesh,
        in_specs=(bspec, bspec, bspec, bspec),
        out_specs=(bspec, bspec, bspec, P()),
    )
    try:
        sharded = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - pre-0.8 jax uses check_rep
        sharded = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(sharded)
