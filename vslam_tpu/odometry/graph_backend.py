"""Global keyframe pose-graph backend: odometry edges + loop closures.

Connects the live pipeline to the framework's pose-graph solver: every
keyframe becomes a node with an odometry edge to the previous keyframe; when
the `KeyframeDatabase` verifies a loop closure, the whole graph is optimized
(`optimize_pose_graph`, dense LM on-device) and the corrected keyframe poses
are handed back for write-back. This is the drift-collapse mechanism the
reference lacks (its backend stops at windowed BA; capability extension per
SURVEY §7 M5 / round-1 VERDICT #10).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ba.pose_graph import PoseGraph, optimize_pose_graph_jit, pad_pose_graph
from ..core.se3 import SE3
from ..core import lie_np
from ..features.loop_closure import KeyframeDatabase, LoopClosureConfig
from ..utils.log import get_logger

__all__ = ["PoseGraphBackend"]


class PoseGraphBackend:
    def __init__(
        self,
        cfg: LoopClosureConfig = LoopClosureConfig(),
        odo_info_scale: float = 1e2,
        fold_min_span_frac: float = 0.5,
    ):
        # fold_min_span_frac: online-fold policy (round 5). A fold's benefit
        # scales with the accumulated drift over the closure's SPAN (current
        # keyframe index - matched keyframe index); its cost is the closure
        # noise it injects into the live chain. Short/mid-span closures
        # (local consistency information) therefore update the graph — they
        # sharpen post-run anchoring — but only closures spanning at least
        # this fraction of the keyframe history (true revisits correcting
        # accumulated drift) fold into the live pose chain. Measured on the
        # 480x640 orbit: folding all significant closures 0.0140 -> 0.0202
        # online ATE (15 small mid-span folds of pure noise); span-gated
        # folding is what lets the online estimate win.
        self.fold_min_span_frac = float(fold_min_span_frac)
        self.db = KeyframeDatabase(cfg)
        self.kf_ids: List[int] = []
        self.kf_poses: Dict[int, np.ndarray] = {}  # id -> world->cam 4x4
        self.kf_stamps: Dict[int, int] = {}  # id -> t_ns (trajectory anchoring)
        self.edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = []  # (i, j, rel, info)
        self.n_closures = 0
        self._odo_info = np.eye(6) * odo_info_scale
        self._log = get_logger("mapping")
        # telemetry: wall seconds of the most recent / slowest pose-graph
        # solve (includes compile on first use of a bucket size) — the
        # bench's KITTI-scale gate reports these to evidence solver scaling
        self.last_solve_s = 0.0
        self.max_solve_s = 0.0
        self.last_solve_nodes = 0
        # Online-fold significance of the most recent closure: True when the
        # correction the optimization applied to the CURRENT keyframe
        # exceeds the closure edge's own measured noise (see try_close) —
        # i.e. the closure detected real drift, not its own fit jitter.
        # Consumers (sequential_mapping / pipeline) fold the correction into
        # the live pose chain only when this is set; the graph/anchoring
        # state updates regardless.
        self.last_closure_significant = True

    def add_keyframe(self, frame) -> None:
        """Register a keyframe (HostFrame with extracted features) and the
        odometry edge from the previous keyframe."""
        if self.kf_ids:
            prev = self.kf_ids[-1]
            rel = frame.pose @ lie_np.inv(self.kf_poses[prev])  # T_j . T_i^-1
            self.edges.append((prev, frame.id, rel, self._odo_info.copy()))
        self.kf_ids.append(frame.id)
        self.kf_poses[frame.id] = np.asarray(frame.pose, np.float64).copy()
        self.kf_stamps[frame.id] = int(frame.t_ns)
        self.db.add(frame)

    def keyframe_trajectory(self) -> List[Tuple[int, np.ndarray]]:
        """(t_ns, pose world->cam 4x4) of every registered keyframe, sorted
        by timestamp — the graph's CURRENT belief, i.e. after every pose-
        graph optimization and external write-back so far. This is the
        anchor set for re-writing a full odometry trajectory after loop
        closures (`sequential_mapping.anchor_trajectory`): the reference has
        no global-relaxation equivalent (its backend stops at windowed BA)."""
        return sorted(
            ((self.kf_stamps[fid], self.kf_poses[fid]) for fid in self.kf_ids),
            key=lambda x: x[0],
        )

    def try_close(self, frame) -> Optional[Dict[int, np.ndarray]]:
        """Attempt loop closure at this keyframe. On success, optimizes the
        global graph and returns {kf_id: corrected pose} (also applied to the
        backend's own store)."""
        cand = self.db.query(frame)
        if cand is None:
            return None
        self._log.warning(
            "loop closure: kf %d -> kf %d (%d inliers)", frame.id, cand.kf_id, cand.n_inliers
        )
        self.edges.append((cand.kf_id, frame.id, cand.rel, cand.info))
        self.n_closures += 1
        pose_before = self.kf_poses[frame.id].copy()
        out = self._optimize()
        # Significance gate for the ONLINE fold (round 5): folding a
        # correction whose magnitude is below the closure fit's measured
        # standard error injects measurement noise into a pose chain that
        # may be drifting LESS than that noise (measured: TUM-scale online
        # ATE 0.0043 -> 0.0051 from noise-dominated folds, while KITTI-scale
        # corrections are drift-dominated and folding wins). Gate:
        # |delta_t| > 3 sigma_t of the Horn fit (+ the same absolute floor
        # the BA gate uses). The graph itself keeps every correction —
        # post-run anchoring is unaffected.
        d = lie_np.log(lie_np.inv(pose_before) @ out[frame.id])
        thresh = max(3.0 * float(getattr(cand, "sigma_t", 0.0)), 1e-3)
        try:
            span = len(self.kf_ids) - 1 - self.kf_ids.index(cand.kf_id)
        except ValueError:
            span = 0
        span_frac = span / max(len(self.kf_ids) - 1, 1)
        self.last_closure_significant = bool(
            np.linalg.norm(d[:3]) > thresh
            and span_frac >= self.fold_min_span_frac
        )
        if not self.last_closure_significant:
            self._log.warning(
                "closure correction %.4f m (3*sigma_t %.4f, span %.2f of "
                "history) — not folded online",
                float(np.linalg.norm(d[:3])), thresh, span_frac,
            )
        return out

    def _optimize(self) -> Dict[int, np.ndarray]:
        ids = self.kf_ids
        index = {fid: k for k, fid in enumerate(ids)}
        K = len(ids)
        E = len(self.edges)
        poses = np.stack([self.kf_poses[f] for f in ids])
        g = PoseGraph(
            poses=SE3(
                jnp.asarray(poses[:, :3, :3], jnp.float32),
                jnp.asarray(poses[:, :3, 3], jnp.float32),
            ),
            edge_i=jnp.asarray([index[e[0]] for e in self.edges], jnp.int32),
            edge_j=jnp.asarray([index[e[1]] for e in self.edges], jnp.int32),
            edge_rel=SE3(
                jnp.asarray(np.stack([e[2][:3, :3] for e in self.edges]), jnp.float32),
                jnp.asarray(np.stack([e[2][:3, 3] for e in self.edges]), jnp.float32),
            ),
            edge_info=jnp.asarray(np.stack([e[3] for e in self.edges]), jnp.float32),
            edge_mask=jnp.ones(E, bool),
        )
        # bucket (K, E) to bounded static shapes: a growing graph re-uses a
        # handful of compiled programs instead of recompiling per closure
        from ..utils import pow2_bucket

        bucket = pow2_bucket
        g, node_mask = pad_pose_graph(g, bucket(K), bucket(E))
        import time as _time

        t_solve = _time.perf_counter()
        # solver="auto": matrix-free block-Jacobi PCG above
        # pose_graph._DENSE_MAX_NODES padded nodes, exact dense below
        opt, c0, c1 = optimize_pose_graph_jit(g, node_mask=node_mask)
        R = np.asarray(opt.R, np.float64)
        t = np.asarray(opt.t, np.float64)
        self.last_solve_s = _time.perf_counter() - t_solve
        self.max_solve_s = max(self.max_solve_s, self.last_solve_s)
        self.last_solve_nodes = K
        out: Dict[int, np.ndarray] = {}
        for k, fid in enumerate(ids):
            T = np.eye(4)
            u, _, vt = np.linalg.svd(R[k])
            T[:3, :3] = u @ vt
            T[:3, 3] = t[k]
            self.kf_poses[fid] = T
            out[fid] = T
        self._log.warning("pose graph: chi2 %.4g -> %.4g (%d nodes, %d edges)",
                          float(c0), float(c1), K, E)
        return out

    def update_pose(self, fid: int, pose: np.ndarray) -> None:
        """Keep the backend consistent with external write-backs (BA)."""
        if fid in self.kf_poses:
            self.kf_poses[fid] = np.asarray(pose, np.float64).copy()
