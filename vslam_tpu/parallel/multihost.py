"""Multi-host (DCN) scaling: process bootstrap, 2-D host x device meshes,
per-host dataset sharding.

The reference has no distributed backend at all (SURVEY.md §2.9: its
"distributed" layer is a single-machine ROS graph). The TPU-native scaling
story has two tiers:

- **ICI tier** (`parallel/batched.py`): the batch axis sharded over the
  chips of one host/pod-slice; collectives ride ICI.
- **DCN tier** (this module): multiple hosts, each running the same program
  SPMD over its local chips. DCN is used ONLY for (a) the gRPC control
  plane (`initialize`) and (b) assembling host-local data into global
  arrays; the frame data itself never crosses hosts — each process loads
  its own sequence shard (`shard_sequences`), exactly the
  data-stays-local / collectives-stay-on-ICI recipe.

The mesh is (host, data): the DCN axis is the *outer* mesh axis so XLA's
collectives decompose into fast ICI reductions per host followed by one
small cross-host (DCN) combine — batched tracking only ever crosses DCN for
scalar convergence stats.

Single-process testability: `dcn_ici_mesh(n_hosts=...)` folds a flat device
list into the same (host, data) grid, so the full 2-axis program (shardings
+ both psum axes) compiles and runs on the 8-device virtual CPU mesh; the
only part that needs real multi-host is the gRPC bootstrap, which this
sandbox blocks (local connections disabled) — `initialize` is env-gated.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alignment.ic import AlignmentConfig
from .batched import tracking_step

__all__ = [
    "initialize",
    "dcn_ici_mesh",
    "shard_sequences",
    "shard_batch_2d",
    "host_local_to_global",
    "sharded_tracking_step_2d",
]


def initialize(
    coordinator_address: str,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host cluster (jax.distributed gRPC control plane).

    Call before any jnp op, once per process. On CPU backends selects the
    gloo collectives implementation so cross-process psum works. Arguments
    default from cluster env vars (JAX's auto-detection) when None.
    """
    try:
        if jax.default_backend() == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def dcn_ici_mesh(
    n_hosts: Optional[int] = None,
    devices=None,
    axis_dcn: str = "host",
    axis_ici: str = "data",
) -> Mesh:
    """(host, data) mesh: outer axis = DCN (one row per host), inner = ICI.

    In a real multi-host job leave ``n_hosts=None``: the grid is
    (process_count, local_device_count) with each row holding one process's
    devices (so the inner axis never crosses DCN). With ``n_hosts=k`` a flat
    device list is folded into k rows — the single-process test/dry-run mode.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_hosts is None:
        n_hosts = jax.process_count()
        if n_hosts > 1:
            # order rows by owning process so the ICI axis stays intra-host
            rows = [
                [d for d in devices if d.process_index == p] for p in range(n_hosts)
            ]
            per_host = len(rows[0])
            assert all(len(r) == per_host for r in rows), "uneven hosts"
            grid = np.array(rows, dtype=object)
            return Mesh(grid, (axis_dcn, axis_ici))
    assert len(devices) % n_hosts == 0, (len(devices), n_hosts)
    grid = np.array(devices, dtype=object).reshape(n_hosts, -1)
    return Mesh(grid, (axis_dcn, axis_ici))


def shard_sequences(
    n_sequences: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> range:
    """This host's slice of the sequence list (contiguous block partition;
    remainder spread over the first hosts). Dataset IO is the ONLY thing
    that scales over DCN — each process reads just these sequences."""
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_sequences, n)
    start = p * base + min(p, rem)
    return range(start, start + base + (1 if p < rem else 0))


def shard_batch_2d(tree, mesh: Mesh, axis_dcn: str = "host", axis_ici: str = "data"):
    """Shard a batched pytree's leading axis over BOTH mesh axes (the global
    batch is host-major: rows of the mesh see consecutive batch blocks)."""

    def put(x):
        spec = P((axis_dcn, axis_ici), *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def host_local_to_global(tree, mesh: Mesh, axis_dcn: str = "host", axis_ici: str = "data"):
    """Assemble per-host batches into one global sharded array. Each process
    passes its LOCAL batch (from its `shard_sequences` slice); the result is
    the global array with the same layout `shard_batch_2d` produces.
    Single-process: equivalent to `shard_batch_2d` (no DCN traffic)."""
    if jax.process_count() == 1:
        return shard_batch_2d(tree, mesh, axis_dcn, axis_ici)
    from jax.experimental import multihost_utils

    def put(x):
        spec = P((axis_dcn, axis_ici), *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    return jax.tree_util.tree_map(put, tree)


def sharded_tracking_step_2d(
    mesh: Mesh,
    cfg: AlignmentConfig,
    axis_dcn: str = "host",
    axis_ici: str = "data",
):
    """The batched EKF tracking step over a (host, data) mesh.

    Per-pair solves stay chip-local; the global converged-fraction stat is a
    two-stage reduction — psum over the ICI axis (fast, per host) then over
    the DCN axis (one scalar per host crossing the network).
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    bspec = P((axis_dcn, axis_ici))

    def local_step(ekf, ref, cur, dt):
        ekf_new, rel, valid = tracking_step(ekf, ref, cur, dt, cfg)
        n_ok = jnp.sum(valid.astype(jnp.float32))
        n = jnp.asarray(valid.shape[0], jnp.float32)
        # ICI stage then DCN stage (scalars only cross hosts)
        n_ok = jax.lax.psum(jax.lax.psum(n_ok, axis_ici), axis_dcn)
        n = jax.lax.psum(jax.lax.psum(n, axis_ici), axis_dcn)
        return ekf_new, rel, valid, n_ok / n

    kwargs = dict(
        mesh=mesh,
        in_specs=(bspec, bspec, bspec, bspec),
        out_specs=(bspec, bspec, bspec, P()),
    )
    try:
        sharded = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        sharded = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(sharded)
