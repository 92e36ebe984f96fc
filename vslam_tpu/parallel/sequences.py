"""Batched multi-sequence odometry: S fused scans in ONE device program.

The reference evaluates sequences serially — `script/evaluate.py` launches
one replayer/odometry process per dataset sequence and the experiment runs
are a shell loop (reference script/evaluate.py:1-60). The TPU-native
evaluation axis is *batch*: `vmap` the fused sequential step
(`odometry.sequential._step`, the NodeRgbdAlignment::processFrame program)
over S independent sequences, and shard S across the device mesh
(`shard_map`). One dispatch then advances EVERY sequence by a chunk of K
frames; a pod evaluates an entire benchmark suite (e.g. all 9 TUM fr-
sequences x N parameter configs) in the wall-clock of its longest sequence.

Constraints inherited from the fused scan: all sequences share the static
frame geometry (H, W) and the static `SequentialConfig`; per-sequence
*intrinsics* may differ (Camera is a pytree of scalars and is vmapped).
Ragged sequence lengths are handled with the scan's existing `live` mask —
exhausted sequences pass state through and re-emit their last pose, exactly
like padded chunk slots in the single-sequence driver.
"""

from __future__ import annotations

import functools
from typing import Iterable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import se3
from ..core.camera import Camera
from ..core.se3 import SE3
from ..odometry.sequential import (
    SequentialConfig,
    SequentialState,
    init_state,
    scan_odometry,
)

__all__ = [
    "stack_cameras",
    "init_states",
    "scan_sequences",
    "sharded_scan_sequences",
    "StagedSuiteChunk",
    "MultiSequenceOdometry",
]


class StagedSuiteChunk(NamedTuple):
    """One lock-step (S, K) suite chunk, staged for dispatch: device arrays
    in native sensor dtype (mesh-sharded when the driver has a mesh), plus
    the raw host batch the per-sequence mapping backends read."""

    stamps: List[List[int]]  # per-sequence timestamps (ragged)
    raw_intensity: np.ndarray  # (S, K, H, W) host
    raw_depth: np.ndarray
    intensity: jax.Array  # (S, K, H, W) device
    depth: jax.Array
    dts: jax.Array  # (S, K) f32
    live: jax.Array  # (S, K) bool


@jax.jit
def _fold_corrections(states: SequentialState, dR: jax.Array, dt: jax.Array):
    """RIGHT-compose per-sequence corrections (identity rows for
    uncorrected sequences) onto the batched pose chain: pose' = pose . d
    with d = T_est^-1 . T_corr — chains future poses off the corrected
    keyframe, preserving measured camera-relative motion (see
    SequentialOdometry._apply_correction for why left composition is
    wrong)."""

    def comp(p: SE3) -> SE3:
        return jax.vmap(
            lambda ddR, ddt, pR, pt: se3.orthonormalize(
                se3.compose(SE3(pR, pt), SE3(ddR, ddt))
            )
        )(dR, dt, p.R, p.t)

    return states._replace(
        pose_kf=comp(states.pose_kf), pose_last=comp(states.pose_last)
    )


def stack_cameras(cameras: Sequence[Camera]) -> Camera:
    """Stack S per-sequence cameras into one batched Camera pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cameras)


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_states(
    intensity: jax.Array,  # (S, H, W) native sensor dtype
    depth: jax.Array,  # (S, H, W) depth counts, or right stereo image
    cameras: Camera,  # leaves (S,)
    cfg: SequentialConfig,
) -> SequentialState:
    """Batched first-frame initialization (each sequence's frame 0 is its
    first keyframe, Odometry.cpp:33-35)."""
    return jax.vmap(lambda i, d, c: init_state(i, d, c, cfg))(
        intensity, depth, cameras
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def scan_sequences(
    states: SequentialState,  # leaves (S, ...)
    intensity: jax.Array,  # (S, K, H, W)
    depth: jax.Array,  # (S, K, H, W)
    dt: jax.Array,  # (S, K) seconds
    live: jax.Array,  # (S, K) bool
    cameras: Camera,  # leaves (S,)
    cfg: SequentialConfig,
):
    """Advance all S sequences by a K-frame chunk in one dispatch. Returns
    (states, poses SE3 (S, K), valid (S, K), cov (S, K, 6, 6), is_kf (S, K))."""
    return jax.vmap(
        lambda st, i, d, t, lv, cam: scan_odometry(st, i, d, t, lv, cam, cfg)
    )(states, intensity, depth, dt, live, cameras)


def sharded_scan_sequences(mesh: Mesh, cfg: SequentialConfig, axis: str = "data"):
    """pjit-compiled multi-chip chunk step: sequences sharded over `axis`,
    each chip scans its local sequences, one psum reports the global tracking
    health (fraction of valid frames this chunk) over ICI."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    sspec = P(axis)

    def local_scan(states, intensity, depth, dt, live, cameras):
        states, poses, valid, cov, is_kf = scan_sequences(
            states, intensity, depth, dt, live, cameras, cfg
        )
        n_ok = jnp.sum((valid & live).astype(jnp.float32))
        n = jnp.maximum(jnp.sum(live.astype(jnp.float32)), 1.0)
        frac = jax.lax.psum(n_ok, axis) / jax.lax.psum(n, axis)
        return states, poses, valid, cov, is_kf, frac

    kwargs = dict(
        mesh=mesh,
        in_specs=(sspec,) * 6,
        out_specs=(sspec, sspec, sspec, sspec, sspec, P()),
    )
    try:
        sharded = shard_map(local_scan, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - pre-0.8 jax uses check_rep
        sharded = shard_map(local_scan, check_rep=False, **kwargs)
    return jax.jit(sharded)


class MultiSequenceOdometry:
    """Host driver: feed S frame streams, collect S TUM trajectories.

    Lock-step chunking: every dispatch advances all sequences by up to
    `chunk` frames; sequences that run out are padded with live=False slots
    (their state passes through untouched). One dispatch + one fetch per
    chunk covers the whole suite — the multi-sequence analog of
    `SequentialOdometry.run`.
    """

    def __init__(
        self,
        cameras: Sequence[Camera],
        cfg: SequentialConfig = SequentialConfig(),
        chunk: int = 16,
        mesh: Optional[Mesh] = None,
        mappings: Optional[Sequence] = None,  # per-sequence ChunkMappingBackend
        async_mapping: bool = True,
    ):
        self._cam_list = list(cameras)
        self.cameras = stack_cameras(self._cam_list)
        self.cfg = cfg
        self.chunk = int(chunk)
        self.mesh = mesh
        # Per-sequence SLAM backends (odometry.sequential_mapping). Mapping
        # mode collects each chunk synchronously (its BA/loop correction must
        # fold into the device state before the next chunk), mirroring
        # SequentialOdometry's synchronous mapping mode. Each sequence keeps
        # its OWN map/backend; corrections apply only to that sequence's row
        # of the batched pose chain.
        self.mappings = list(mappings) if mappings is not None else None
        if self.mappings is not None and len(self.mappings) != len(self._cam_list):
            raise ValueError("need one mapping backend per sequence")
        # async_mapping overlaps the host-side backends (track/BA/loop per
        # sequence, mutually independent -> a small thread pool) with the
        # NEXT chunk's device scan; corrections fold in one chunk later than
        # the synchronous mode, deterministically — the same contract as
        # SequentialOdometry(async_mapping=True).
        self.async_mapping = bool(async_mapping) and self.mappings is not None
        self._backend_futures = None
        self._executor = None
        if self.async_mapping:
            import concurrent.futures

            self._executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=min(len(self.mappings), 4),
                thread_name_prefix="suite-mapping",
            )
        self._sharded = (
            sharded_scan_sequences(mesh, cfg) if mesh is not None else None
        )
        if mesh is not None:
            from .batched import shard_batch

            self.cameras = shard_batch(self.cameras, mesh)

    def _read_firsts(self, streams):
        """Pull + validate each stream's first frame (shared geometry)."""
        its = [iter(s) for s in streams]
        firsts = []
        for s, it in enumerate(its):
            try:
                firsts.append(next(it))
            except StopIteration:
                raise ValueError(
                    f"sequence {s} yielded no frames (empty dataset / bad path?)"
                ) from None
        H, W = np.asarray(firsts[0][1]).shape
        for s, f in enumerate(firsts):
            if np.asarray(f[1]).shape != (H, W):
                raise ValueError(
                    f"all sequences must share frame geometry: sequence {s} is "
                    f"{np.asarray(f[1]).shape}, sequence 0 is {(H, W)} (the "
                    "batched scan is one static-shape program)"
                )
        return its, firsts, (H, W)

    def _stage_iter(self, streams):
        """(firsts, lazy iterator of StagedSuiteChunk). The generator stages
        one lock-step (S, K) chunk batch at a time — `run` pulls from it so
        chunk k+1's host staging + transfer overlaps chunk k's device solve;
        `stage_streams` exhausts it up front for device-resident replays."""
        its, firsts, (H, W) = self._read_firsts(streams)
        S = len(its)
        idt = np.asarray(firsts[0][1]).dtype
        ddt = np.asarray(firsts[0][2]).dtype

        def gen():
            t_last = [int(f[0]) for f in firsts]
            done = [False] * S
            while not all(done):
                K = self.chunk
                inten = np.zeros((S, K, H, W), idt)
                depth = np.zeros((S, K, H, W), ddt)
                dts = np.zeros((S, K), np.float32)
                live = np.zeros((S, K), bool)
                stamps: List[List[int]] = [[] for _ in range(S)]
                any_live = False
                for s in range(S):
                    for j in range(K):
                        if done[s]:
                            break
                        try:
                            t_ns, i_, d_ = next(its[s])
                        except StopIteration:
                            done[s] = True
                            break
                        inten[s, j] = i_
                        depth[s, j] = d_
                        dts[s, j] = (int(t_ns) - t_last[s]) / 1e9
                        live[s, j] = True
                        any_live = True
                        t_last[s] = int(t_ns)
                        stamps[s].append(int(t_ns))
                if not any_live:
                    return
                dev = (
                    jnp.asarray(inten),
                    jnp.asarray(depth),
                    jnp.asarray(dts),
                    jnp.asarray(live),
                )
                if self.mesh is not None:
                    from .batched import shard_batch

                    dev = tuple(shard_batch(a, self.mesh) for a in dev)
                yield StagedSuiteChunk(stamps, inten, depth, *dev)

        return firsts, gen()

    def run(
        self, streams: Sequence[Iterable[Tuple[int, np.ndarray, np.ndarray]]]
    ) -> List[List[Tuple[int, np.ndarray, np.ndarray]]]:
        """Returns, per sequence, a list of (t_ns, pose world->cam 4x4 f64,
        cov 6x6 f64) — the same contract as `SequentialOdometry.run`."""
        firsts, chunk_iter = self._stage_iter(streams)
        return self._run_chunks(firsts, chunk_iter)

    def stage_streams(self, streams):
        """Stage every chunk of the suite onto the device up front. Returns
        (firsts, chunks) for `run_staged` — the multi-sequence analog of
        `odometry.sequential.stage_stream` (see its docstring for why:
        device-resident replays measure the chip, not the feed link)."""
        firsts, chunk_iter = self._stage_iter(streams)
        return firsts, list(chunk_iter)

    def run_staged(self, firsts, chunks) -> List[List[Tuple[int, np.ndarray, np.ndarray]]]:
        """Replay pre-staged suite chunks (zero per-frame uploads). Same
        semantics as `run()` on the same streams; replays are independent —
        in mapping mode, supply FRESH per-sequence backends per replay."""
        return self._run_chunks(firsts, iter(chunks))

    def _run_chunks(self, firsts, chunk_iter):
        # join any in-flight backend jobs from a prior ABORTED run: their
        # corrections must not fold into this run's fresh states, and they
        # mutate the per-sequence maps concurrently (errors were already
        # surfaced to that run's caller)
        if self._backend_futures:
            for _s, fut in self._backend_futures:
                try:
                    fut.result()
                except Exception:
                    pass
            self._backend_futures = None
        S = len(firsts)
        i0 = np.stack([np.asarray(f[1]) for f in firsts])
        d0 = np.stack([np.asarray(f[2]) for f in firsts])
        i0_dev, d0_dev = jnp.asarray(i0), jnp.asarray(d0)
        if self.mesh is not None:
            from .batched import shard_batch

            i0_dev = shard_batch(i0_dev, self.mesh)
            d0_dev = shard_batch(d0_dev, self.mesh)
        states = init_states(i0_dev, d0_dev, self.cameras, self.cfg)
        if self.mesh is not None:
            from .batched import shard_batch

            states = shard_batch(states, self.mesh)
        t0s = [int(f[0]) for f in firsts]
        out: List[List[Tuple[int, np.ndarray, np.ndarray]]] = [
            [(t0s[s], np.eye(4), np.eye(6))] for s in range(S)
        ]
        if self.mappings is not None:
            # each sequence's frame 0 seeds its backend map (first keyframe)
            for s, backend in enumerate(self.mappings):
                backend.process_chunk(
                    [(t0s[s], i0[s], d0[s])], [np.eye(4)], [np.eye(6)],
                    [True], self._cam_list[s], self.cfg,
                )
        pending = None

        for sc in chunk_iter:
            stamps, inten, depth = sc.stamps, sc.raw_intensity, sc.raw_depth
            args = (states, sc.intensity, sc.depth, sc.dts, sc.live)
            if self._sharded is not None:
                states, poses, valid, cov, is_kf, _frac = self._sharded(
                    *args, self.cameras
                )
            else:
                states, poses, valid, cov, is_kf = scan_sequences(
                    *args, self.cameras, self.cfg
                )
            if self.mappings is not None:
                if self.async_mapping:
                    # fold chunk k-1's corrections while the device is busy
                    # with chunk k (they shape tracking from chunk k+1 on)
                    states, prev_deltas = self._drain_backends(states)
                rows = self._collect(out, stamps, poses, cov, is_kf)
                if self.async_mapping and prev_deltas:
                    # chunk k was SOLVED before chunk k-1's correction landed:
                    # re-base the poses handed to the backends into the
                    # corrected frame, so BA doesn't re-measure (and the gate
                    # doesn't re-apply) the same drift — see
                    # SequentialOdometry._retire
                    kf_rows, results = rows
                    for s, d in prev_deltas.items():
                        results[s] = [(t, T @ d, c) for (t, T, c) in results[s]]
                    rows = (kf_rows, results)
                work = (rows, stamps, inten, depth, args[1], args[2])
                if self.async_mapping:
                    self._backend_futures = self._submit_backends(*work)
                else:
                    # synchronous: corrections land before the next chunk
                    states = self._run_backends(states, *work)
                continue
            # pipelined: defer the (blocking) fetch of this chunk until the
            # NEXT chunk has been dispatched, so chunk k+1's host staging +
            # transfer overlaps chunk k's device solve (same pattern as
            # SequentialOdometry.run)
            if pending is not None:
                self._collect(out, *pending)
            pending = (stamps, poses, cov)
        if pending is not None:
            self._collect(out, *pending)
        if self.async_mapping:
            states, _ = self._drain_backends(states)  # surface errors, finish maps
        return out

    def _backend_args(self, rows, stamps, inten, depth, inten_dev, depth_dev):
        """Per-sequence (backend, process_chunk args) for one chunk."""
        kf_rows, results = rows
        calls = []
        for s, backend in enumerate(self.mappings):
            n_s = len(stamps[s])
            if n_s == 0:
                continue
            buf_s = [(stamps[s][j], inten[s, j], depth[s, j]) for j in range(n_s)]
            res_s = results[s]
            calls.append(
                (
                    s,
                    backend,
                    (
                        buf_s,
                        [r[1] for r in res_s],
                        [r[2] for r in res_s],
                        [bool(k) for k in kf_rows[s][:n_s]],
                        self._cam_list[s],
                        self.cfg,
                    ),
                    {"device_images": (inten_dev[s], depth_dev[s])},
                )
            )
        return calls

    def _run_backends(self, states, *work):
        """Synchronous mode: feed each sequence's chunk to its backend, fold
        the corrections immediately (the multi-sequence analog of
        SequentialOdometry._apply_correction)."""
        deltas = {}
        for s, backend, a, kw in self._backend_args(*work):
            delta = backend.process_chunk(*a, **kw)
            if delta is not None:
                deltas[s] = np.asarray(delta, np.float64)
        return self._fold(states, deltas)

    def _submit_backends(self, *work):
        return [
            (s, self._executor.submit(backend.process_chunk, *a, **kw))
            for s, backend, a, kw in self._backend_args(*work)
        ]

    def _drain_backends(self, states):
        """Collect the previous chunk's backend futures, fold corrections.
        Returns (states, per-sequence deltas) — callers re-base poses that
        were solved before the fold."""
        if not self._backend_futures:
            return states, {}
        # detach the list FIRST: if a job re-raises, the remaining futures
        # must not survive into a retry run and fold stale corrections there
        futures, self._backend_futures = self._backend_futures, None
        deltas = {}
        for s, fut in futures:
            delta = fut.result()
            if delta is not None:
                deltas[s] = np.asarray(delta, np.float64)
        return self._fold(states, deltas), deltas

    def _fold(self, states, deltas):
        if not deltas:
            return states
        S = len(self.mappings)
        dR = np.broadcast_to(np.eye(3, dtype=np.float32), (S, 3, 3)).copy()
        dt = np.zeros((S, 3), np.float32)
        for s, d in deltas.items():
            dR[s] = d[:3, :3]
            dt[s] = d[:3, 3]
        return _fold_corrections(states, jnp.asarray(dR), jnp.asarray(dt))

    @staticmethod
    def _collect(out, stamps, poses, cov, is_kf=None):
        fetch = (poses.R, poses.t, cov) + (() if is_kf is None else (is_kf,))
        got = jax.device_get(fetch)  # ONE fetch
        R = np.asarray(got[0], np.float64)
        t = np.asarray(got[1], np.float64)
        covs = np.asarray(got[2], np.float64)
        results = [[] for _ in stamps]
        for s, seq_stamps in enumerate(stamps):
            for j, t_ns in enumerate(seq_stamps):
                T = np.eye(4)
                u, _, vt = np.linalg.svd(R[s, j])
                T[:3, :3] = u @ vt
                T[:3, 3] = t[s, j]
                row = (t_ns, T, covs[s, j])
                out[s].append(row)
                results[s].append(row)
        if is_kf is not None:
            return np.asarray(got[3]), results
