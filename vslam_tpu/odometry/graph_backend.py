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
    def __init__(self, cfg: LoopClosureConfig = LoopClosureConfig(), odo_info_scale: float = 1e2):
        self.db = KeyframeDatabase(cfg)
        self.kf_ids: List[int] = []
        self.kf_poses: Dict[int, np.ndarray] = {}  # id -> world->cam 4x4
        self.kf_stamps: Dict[int, int] = {}  # id -> t_ns (trajectory anchoring)
        self.edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = []  # (i, j, rel, info)
        self.n_closures = 0
        self._odo_info = np.eye(6) * odo_info_scale
        self._log = get_logger("mapping")

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
        return self._optimize()

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
        opt, c0, c1 = optimize_pose_graph_jit(g, node_mask=node_mask)
        R = np.asarray(opt.R, np.float64)
        t = np.asarray(opt.t, np.float64)
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
