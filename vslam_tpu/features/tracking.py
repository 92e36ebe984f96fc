"""Keyframe feature pipeline: detect -> describe -> match -> triangulate.

Rebuild of reference `FeatureTracking` (FeatureTracking.cpp:71-203): on each
new keyframe, extract depth-masked FAST corners with per-cell NMS + BRIEF
descriptors (device, static shapes), select candidate features from the
keyframe window (dedup by landmark, visibility check), brute-force match
with combined descriptor + reprojection distance (the custom matcher of
NodeMapping.cpp:103-113), then extend matched landmarks or triangulate new
ones from the current frame's depth (FeatureTracking.cpp:144-176).

Candidate sets are padded to power-of-two buckets so the device matcher
compiles once per bucket, not per call.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie_np
from ..odometry.map import HostFrame, Landmark, Map
from . import descriptor as desc_mod
from . import detector as det_mod
from . import matcher as match_mod

__all__ = ["FeatureTracking"]


@functools.partial(jax.jit, static_argnames=("threshold", "cell"))
def _detect_describe(intensity, depth, threshold: float = 10.0, cell: int = 30):
    # detect at least PATCH pixels from the edge so every BRIEF test sample
    # stays in-bounds (unclamped)
    det = det_mod.fast_grid_detect(
        intensity, depth, threshold=threshold, cell=cell, border=desc_mod.PATCH
    )
    desc = desc_mod.extract_descriptors(intensity, det.uv)
    H, W = depth.shape
    u = det.uv[:, 0].astype(jnp.int32)
    v = det.uv[:, 1].astype(jnp.int32)
    z = depth.reshape(-1)[v * W + u]
    return det.uv, det.response, det.valid, desc, z


@jax.jit
def _match_combined(desc_q, uv_q, mask_q, desc_c, p3d_c, mask_c, fx, fy, cx, cy):
    d = match_mod.descriptor_l1_matrix(desc_q, desc_c)
    r = match_mod.reprojection_error_matrix(p3d_c, uv_q, fx, fy, cx, cy)
    return match_mod.ratio_match(d + r, mask_q=mask_q, mask_c=mask_c, unique=True)


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class FeatureTracking:
    def __init__(self, fast_threshold: float = 10.0, grid_cell: int = 30, border: float = 5.0):
        self.fast_threshold = fast_threshold
        self.grid_cell = grid_cell
        self.border = border

    def extract(self, frame: HostFrame) -> None:
        """Populate frame.keypoints/descriptors/kp_depth/kp_landmark
        (FeatureTracking::extractFeatures equivalent)."""
        uv, resp, valid, desc, z = _detect_describe(
            frame.frame.intensity[0],
            frame.frame.depth[0],
            threshold=self.fast_threshold,
            cell=self.grid_cell,
        )
        keep = np.asarray(valid)
        frame.keypoints = np.asarray(uv)[keep]
        frame.descriptors = np.asarray(desc)[keep]
        frame.kp_depth = np.asarray(z)[keep]
        frame.kp_landmark = np.full(len(frame.keypoints), -1, np.int64)

    def select_candidates(self, cur: HostFrame, refs: List[HostFrame], slam_map: Map):
        """Candidate features from reference keyframes: unassociated features
        always; landmark-associated ones once per landmark and only if the
        landmark projects inside the current view (FeatureTracking.cpp:178-203).

        Fully vectorized per reference frame (batched position fetch + one
        projection) — no per-landmark Python loop."""
        cand = []  # (ref_frame, idx)
        W, H = cur.frame.width(0), cur.frame.height(0)
        cam = cur.frame.cameras[0]
        fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
        R, t = cur.pose[:3, :3], cur.pose[:3, 3]
        seen = np.empty(0, np.int64)
        for f in refs:
            if f.keypoints is None:
                continue
            pids = np.asarray(f.kp_landmark, np.int64)
            order = np.arange(len(pids))
            un = order[pids < 0]

            assoc = order[pids >= 0]
            accepted = np.empty(0, np.int64)
            if len(assoc):
                # dedup by landmark: first occurrence in this frame, and not
                # selected from an earlier (more recent) reference frame
                uniq, first = np.unique(pids[assoc], return_index=True)
                fresh = ~np.isin(uniq, seen)
                uniq, first = uniq[fresh], first[fresh]
                pos, ok = slam_map.positions_lookup(uniq)
                p_c = pos @ R.T + t
                z = p_c[:, 2]
                front = ok & (z > 0)
                zs = np.where(front, z, 1.0)
                u = fx * p_c[:, 0] / zs + cx
                v = fy * p_c[:, 1] / zs + cy
                b = self.border
                vis = front & (b < u) & (u < W - b) & (b < v) & (v < H - b)
                accepted = assoc[first[vis]]
                seen = np.concatenate([seen, uniq[vis]])

            for i in np.sort(np.concatenate([un, accepted])):
                cand.append((f, int(i)))
        return cand

    def track(self, cur: HostFrame, slam_map: Map) -> List[Landmark]:
        """Full per-keyframe tracking; returns newly created landmarks."""
        self.extract(cur)
        refs = [f for f in slam_map.keyframes() if f is not cur]
        if not refs or cur.keypoints is None or len(cur.keypoints) == 0:
            return []
        cand = self.select_candidates(cur, refs, slam_map)
        if not cand:
            return []

        # build padded candidate arrays; p3d in the CURRENT camera frame for
        # the reprojection distance (Matcher.cpp:73-90 via world)
        M = _bucket(len(cand))
        D = desc_mod.N_BITS
        desc_c = np.zeros((M, D), np.float32)
        p3d_c = np.zeros((M, 3), np.float32)
        mask_c = np.zeros(M, bool)
        for j, (f, i) in enumerate(cand):
            desc_c[j] = f.descriptors[i]
            mask_c[j] = True
            pid = int(f.kp_landmark[i])
            if pid >= 0 and slam_map.point(pid) is not None:
                p_w = slam_map.point(pid).position
            elif f.kp_depth[i] > 0:
                uvz = f.keypoints[i]
                cam = f.frame.cameras[0]
                x = (uvz[0] - float(cam.cx)) / float(cam.fx) * f.kp_depth[i]
                y = (uvz[1] - float(cam.cy)) / float(cam.fy) * f.kp_depth[i]
                p_w = lie_np.transform(lie_np.inv(f.pose), np.array([[x, y, f.kp_depth[i]]]))[0]
            else:
                p3d_c[j] = [0, 0, -1]  # no geometry -> reprojection skipped
                continue
            p3d_c[j] = lie_np.transform(cur.pose, p_w[None, :])[0]

        cam = cur.frame.cameras[0]
        res = _match_combined(
            jnp.asarray(cur.descriptors),
            jnp.asarray(cur.keypoints, jnp.float32),
            jnp.ones(len(cur.keypoints), bool),
            jnp.asarray(desc_c),
            jnp.asarray(p3d_c),
            jnp.asarray(mask_c),
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        idx = np.asarray(res.idx)
        ok = np.asarray(res.valid)

        new_points: List[Landmark] = []
        for qi in range(len(cur.keypoints)):
            if not ok[qi]:
                continue
            f_ref, ri = cand[int(idx[qi])]
            ref_pid = int(f_ref.kp_landmark[ri])
            if ref_pid >= 0 and slam_map.point(ref_pid) is not None:
                cur.kp_landmark[qi] = ref_pid
                slam_map.point(ref_pid).observations[cur.id] = qi
            elif cur.kp_depth[qi] > 0:
                z = float(cur.kp_depth[qi])
                u, v = cur.keypoints[qi]
                c = cur.frame.cameras[0]
                x = (u - float(c.cx)) / float(c.fx) * z
                y = (v - float(c.cy)) / float(c.fy) * z
                p_w = lie_np.transform(lie_np.inv(cur.pose), np.array([[x, y, z]]))[0]
                lm = Landmark(position=p_w, observations={cur.id: qi, f_ref.id: ri})
                cur.kp_landmark[qi] = lm.id
                f_ref.kp_landmark[ri] = lm.id
                new_points.append(lm)
        return new_points
