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

import contextlib
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie_np
from ..odometry.map import HostFrame, Landmark, Map
from ..utils import timer
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
    # descriptors leave the device bit-PACKED (32 bytes/feature, not 1 KB):
    # the host->device link is the backend's bottleneck on remote chips
    return det.uv, det.response, det.valid, desc_mod.pack_bits(desc), z


@jax.jit
def _match_combined(desc_q, uv_q, mask_q, desc_c, p3d_c, mask_c, fx, fy, cx, cy, max_dist):
    # packed u8 descriptors cross the link; unpack on device for the MXU L1
    d = match_mod.descriptor_l1_matrix(
        desc_mod.unpack_bits(desc_q), desc_mod.unpack_bits(desc_c)
    )
    r = match_mod.reprojection_error_matrix(p3d_c, uv_q, fx, fy, cx, cy)
    return match_mod.ratio_match(
        d + r, max_distance=max_dist, mask_q=mask_q, mask_c=mask_c, unique=True
    )


@jax.jit
def _match_pool_batch(desc_q, uv_q, mask_q, desc_pool, p3d, mask_c, fx, fy, cx, cy, max_dist):
    """One chunk-wide match program over a SHARED candidate pool: (B, Q, .)
    queries against one (P, 32) packed descriptor pool — the pool's bytes
    cross the link ONCE, per-query candidate subsets are boolean masks
    (B, P), and the pool's points arrive pre-transformed into each query's
    camera frame ((B, P, 3)). One tunnel round trip for the whole chunk
    instead of one per keyframe."""
    dc = desc_mod.unpack_bits(desc_pool)  # (P, 256) shared across queries

    def one(dq, uq, mq, pc, mc):
        d = match_mod.descriptor_l1_matrix(desc_mod.unpack_bits(dq), dc)
        r = match_mod.reprojection_error_matrix(pc, uq, fx, fy, cx, cy)
        res = match_mod.ratio_match(
            d + r, max_distance=max_dist, mask_q=mq, mask_c=mc, unique=True
        )
        return res.idx, res.valid

    return jax.vmap(one)(desc_q, uv_q, mask_q, p3d, mask_c)


def _cam_floats(cam) -> tuple:
    """(fx, fy, cx, cy) as host floats in ONE device fetch. Camera leaves are
    device scalars; four separate float() calls would each pay a round trip
    — ruinous inside per-keyframe host loops on a remote-attached chip."""
    fx, fy, cx, cy = jax.device_get((cam.fx, cam.fy, cam.cx, cam.cy))
    return float(fx), float(fy), float(cx), float(cy)


def _bucket(n: int, minimum: int = 64) -> int:
    from ..utils import pow2_bucket

    return pow2_bucket(n, minimum)


class FeatureTracking:
    def __init__(
        self,
        fast_threshold: float = 10.0,
        grid_cell: int = 30,
        border: float = 5.0,
        max_match_distance: float = 300.0,
    ):
        self.fast_threshold = fast_threshold
        self.grid_cell = grid_cell
        self.border = border
        # context-manager FACTORY wrapped around the MATCH programs only
        # (their inputs are host numpy; the mapping backend points this at
        # jax.default_device(cpu) so matching runs concurrently with the
        # front end's scan instead of queueing behind it on the one
        # accelerator — sequential_mapping.ChunkMappingBackend.compute_
        # device). Extraction is dense image work and always stays on the
        # default device.
        self.compute_ctx = contextlib.nullcontext
        # absolute gate on the combined descriptor + reprojection distance.
        # The reference's custom matcher gates at 1000 (NodeMapping.cpp:112)
        # in ORB uchar-L1 units (0..8160 possible); our steered-BRIEF bit-L1
        # is 0..256, so the equivalent budget is ~80 descriptor bits + a
        # couple hundred px of reprojection slack. Without a meaningful gate
        # a query with NO true counterpart can still "win" the ratio test in
        # low-texture scenes and feed a wrong landmark association into BA.
        self.max_match_distance = float(max_match_distance)

    def extract(self, frame: HostFrame) -> None:
        """Populate frame.keypoints/descriptors/kp_depth/kp_landmark
        (FeatureTracking::extractFeatures equivalent)."""
        with timer.scope("track.extract_dispatch"):
            out = _detect_describe(
                frame.frame.intensity[0],
                frame.frame.depth[0],
                threshold=self.fast_threshold,
                cell=self.grid_cell,
            )
        # ONE fetch for all five arrays (five np.asarray calls would each pay
        # a device round trip); descriptors arrive bit-packed (N, 32) u8
        with timer.scope("track.extract_fetch"):
            uv, _resp, keep, desc, z = jax.device_get(out)
        frame.keypoints = uv[keep]
        frame.descriptors = desc[keep]
        frame.kp_depth = z[keep]
        frame.kp_landmark = np.full(len(frame.keypoints), -1, np.int64)

    def select_candidates(
        self, cur: HostFrame, refs: List[HostFrame], slam_map: Map, cam_f=None
    ):
        """Candidate features from reference keyframes: unassociated features
        always; landmark-associated ones once per landmark and only if the
        landmark projects inside the current view (FeatureTracking.cpp:178-203).

        Fully vectorized per reference frame (batched position fetch + one
        projection) — no per-landmark Python loop. Returns per-frame groups
        [(ref_frame, idx_array)] so the caller can build the padded candidate
        arrays with per-frame slices instead of a per-candidate loop."""
        groups = []  # (ref_frame, np.ndarray of feature indices)
        W, H = cur.frame.width(0), cur.frame.height(0)
        # cam_f: host-scalar intrinsics passed through by track() so the
        # per-keyframe path pays ONE device fetch, not two
        fx, fy, cx, cy = cam_f if cam_f is not None else _cam_floats(cur.frame.cameras[0])
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

            idxs = np.sort(np.concatenate([un, accepted]))
            if len(idxs):
                groups.append((f, idxs))
        return groups

    def _candidate_arrays(self, cur, groups, slam_map: Map, cam_f, M: int):
        """Padded candidate arrays for the device matcher: descriptors
        (M, 32) u8, points-in-current-camera (M, 3) f32, mask (M,), plus the
        flat (frame, idx) mapping for the association write-back. Built with
        one vectorized block per reference frame (no per-candidate Python
        loop); p3d in the CURRENT camera frame for the reprojection distance
        (Matcher.cpp:73-90 via world)."""
        n_cand = sum(len(idxs) for _, idxs in groups)
        desc_c = np.zeros((M, desc_mod.N_BYTES), np.uint8)
        p3d_c = np.zeros((M, 3), np.float32)
        mask_c = np.zeros(M, bool)
        mask_c[:n_cand] = True
        cand: List = []
        R_cur, t_cur = cur.pose[:3, :3], cur.pose[:3, 3]
        fx, fy, cx, cy = cam_f
        j0 = 0
        for f, idxs in groups:
            n = len(idxs)
            desc_c[j0 : j0 + n] = f.descriptors[idxs]
            pids = np.asarray(f.kp_landmark, np.int64)[idxs]
            pos_lm, ok_lm = slam_map.positions_lookup(pids)
            # depth-backed back-projection into the ref camera, then world
            z = np.asarray(f.kp_depth, np.float64)[idxs]
            uv = np.asarray(f.keypoints, np.float64)[idxs]
            x = (uv[:, 0] - cx) / fx * z
            y = (uv[:, 1] - cy) / fy * z
            Tinv = lie_np.inv(f.pose)
            p_w_depth = np.stack([x, y, z], 1) @ Tinv[:3, :3].T + Tinv[:3, 3]
            p_w = np.where(ok_lm[:, None], pos_lm, p_w_depth)
            usable = ok_lm | (z > 0)
            p_c = p_w @ R_cur.T + t_cur
            # no geometry -> z = -1 marks "reprojection skipped"
            p3d_c[j0 : j0 + n] = np.where(
                usable[:, None], p_c, np.array([0.0, 0.0, -1.0])
            )
            j0 += n
            cand.extend((f, int(i)) for i in idxs)
        return desc_c, p3d_c, mask_c, cand

    def _query_arrays(self, cur, Q: int):
        """Query-side arrays padded to a power-of-two bucket: the raw
        keypoint count differs almost every keyframe, and an unpadded query
        shape would recompile the matcher per keyframe (ruinous with remote
        compiles)."""
        nq = len(cur.keypoints)
        desc_q = np.zeros((Q, desc_mod.N_BYTES), np.uint8)
        desc_q[:nq] = cur.descriptors
        uv_q = np.zeros((Q, 2), np.float32)
        uv_q[:nq] = cur.keypoints
        mask_q = np.zeros(Q, bool)
        mask_q[:nq] = True
        return desc_q, uv_q, mask_q

    def _bookkeep(
        self, cur, idx, ok, cand, cam_f, slam_map: Map
    ) -> List[Landmark]:
        """Association write-back after a match: extend matched landmarks or
        triangulate new ones from the current frame's depth
        (FeatureTracking.cpp:144-176). `idx`/`ok` are trimmed to the real
        query count by the caller."""
        fx, fy, cx, cy = cam_f
        # vectorized triangulation of ALL current keypoints with depth (the
        # per-landmark world point); the loop below only does the dict
        # bookkeeping for matched ones
        z_all = np.asarray(cur.kp_depth, np.float64)
        uv_all = np.asarray(cur.keypoints, np.float64)
        Tinv_cur = lie_np.inv(cur.pose)
        xyz = np.stack(
            [
                (uv_all[:, 0] - cx) / fx * z_all,
                (uv_all[:, 1] - cy) / fy * z_all,
                z_all,
            ],
            1,
        )
        p_w_all = xyz @ Tinv_cur[:3, :3].T + Tinv_cur[:3, 3]

        new_points: List[Landmark] = []
        for qi in np.nonzero(ok)[0]:
            f_ref, ri = cand[int(idx[qi])]
            ref_pid = int(f_ref.kp_landmark[ri])
            if ref_pid >= 0 and slam_map.point(ref_pid) is not None:
                cur.kp_landmark[qi] = ref_pid
                slam_map.point(ref_pid).observations[cur.id] = int(qi)
            elif z_all[qi] > 0:
                lm = Landmark(
                    position=p_w_all[qi],
                    observations={cur.id: int(qi), f_ref.id: ri},
                )
                cur.kp_landmark[qi] = lm.id
                f_ref.kp_landmark[ri] = lm.id
                new_points.append(lm)
        return new_points

    def track(self, cur: HostFrame, slam_map: Map) -> List[Landmark]:
        """Full per-keyframe tracking; returns newly created landmarks.

        Extraction is skipped when the caller already populated the feature
        fields (the chunk backend extracts ALL of a chunk's keyframes in one
        batched device program, `sequential_mapping._light_detect_batch`)."""
        if cur.keypoints is None:
            with timer.scope("track.extract"):
                self.extract(cur)
        refs = [f for f in slam_map.keyframes() if f is not cur]
        if not refs or cur.keypoints is None or len(cur.keypoints) == 0:
            return []
        cam_f = _cam_floats(cur.frame.cameras[0])
        groups = self.select_candidates(cur, refs, slam_map, cam_f)
        n_cand = sum(len(idxs) for _, idxs in groups)
        if n_cand == 0:
            return []

        desc_c, p3d_c, mask_c, cand = self._candidate_arrays(
            cur, groups, slam_map, cam_f, _bucket(n_cand)
        )
        nq = len(cur.keypoints)
        desc_q, uv_q, mask_q = self._query_arrays(cur, _bucket(nq))
        cam = cur.frame.cameras[0]
        with timer.scope("track.match"), self.compute_ctx():
            res = _match_combined(
                jnp.asarray(desc_q),
                jnp.asarray(uv_q),
                jnp.asarray(mask_q),
                jnp.asarray(desc_c),
                jnp.asarray(p3d_c),
                jnp.asarray(mask_c),
                cam.fx, cam.fy, cam.cx, cam.cy,
                jnp.float32(self.max_match_distance),
            )
            idx, ok = jax.device_get((res.idx, res.valid))
        return self._bookkeep(cur, idx[:nq], ok[:nq], cand, cam_f, slam_map)

    def track_batch(
        self, curs: List[HostFrame], slam_map: Map
    ) -> List[Landmark]:
        """Track a CHUNK of new keyframes with ONE device round trip.

        The per-keyframe `track()` pays one dispatch + one blocking fetch per
        keyframe; over a remote-attached chip those round trips are the
        mapping backend's scaling cost (they grow with keyframes, not
        chunks). This batches every keyframe's match into one vmapped device
        program over a SHARED candidate pool (`_match_pool_batch`): the
        world-space geometry of every possible candidate feature is
        query-independent (the map does not change until bookkeeping), so it
        is resolved ONCE per chunk; per-query work is one (P, 3) pose
        transform plus boolean dedup/visibility masks — the per-(query, ref)
        rebuild the sequential path pays m x refs times per chunk collapses
        to one pool pass. That host-side saving matters as much as the round
        trips: the backend worker shares one host core with the scan
        driver's staging thread.

        Semantics vs the sequential path: candidate selection for keyframe i
        uses the map state at CHUNK START plus the raw (still unassociated)
        features of the chunk's earlier keyframes; associations made during
        the chunk resolve TRANSITIVELY at bookkeeping time — a match to an
        earlier in-chunk feature adopts whatever landmark that feature ended
        up with, exactly like the sequential write-back (`_bookkeep` reads
        `kp_landmark` at resolution time). The one divergence: a window
        landmark re-observed by keyframe i-1 is deduped by the sequential
        path from keyframe i's candidates (first-occurrence rule), while
        here keyframe i still sees keyframe i-1's raw feature alongside the
        window landmark — the ratio test sees both copies of the same
        physical point. Parity on the SLAM gates is pinned by
        tests/test_sequential.py.

        Call BEFORE inserting `curs` into the map: the per-keyframe
        reference set is reconstructed as (earlier in-chunk keyframes,
        newest first) + (pre-chunk window), trimmed to the map's sliding
        window — exactly the refs each keyframe would have seen had it been
        inserted and tracked in sequence."""
        all_curs = list(curs)
        # queries keep their CHUNK position j: a featureless keyframe still
        # occupies a window slot for everyone after it (the sequential
        # cadence inserts it and lets the deque evict accordingly), it just
        # asks no queries and contributes no candidates
        queries = [
            (j, c)
            for j, c in enumerate(all_curs)
            if c.keypoints is not None and len(c.keypoints) > 0
        ]
        if not queries:
            return []
        cam_f = _cam_floats(queries[0][1].frame.cameras[0])
        fx, fy, cx, cy = cam_f
        in_chunk = {id(c) for c in all_curs}
        refs_w = [f for f in slam_map.keyframes() if id(f) not in in_chunk]
        window = slam_map.max_keyframes

        # ---- shared candidate pool (one pass over every possible ref) ----
        # segments in "most recent first" order: in-chunk refs (newest
        # first; the last keyframe is never a reference) then the pre-chunk
        # window — so a segment's rank equals its position in any query's
        # reference list. Featureless refs stay in the list as EMPTY
        # segments: they consume a rank (window slot) exactly like the
        # sequential cadence's deque.
        pool_refs = list(reversed(all_curs[:-1])) + refs_w
        if not pool_refs:
            return []
        _t_pool = timer.time.perf_counter()
        seg_rank: List[np.ndarray] = []  # per-entry rank (= ref recency)
        desc_pool_l, pw_l, pid_l, usable_l = [], [], [], []
        cand: List = []
        for r, f in enumerate(pool_refs):
            if f.keypoints is None or len(f.keypoints) == 0:
                continue  # empty segment: rank r consumed, no entries
            pids = np.asarray(f.kp_landmark, np.int64)
            pos_lm, ok_lm = slam_map.positions_lookup(pids)
            z = np.asarray(f.kp_depth, np.float64)
            uv = np.asarray(f.keypoints, np.float64)
            x = (uv[:, 0] - cx) / fx * z
            y = (uv[:, 1] - cy) / fy * z
            Tinv = lie_np.inv(f.pose)
            p_w_depth = np.stack([x, y, z], 1) @ Tinv[:3, :3].T + Tinv[:3, 3]
            # associated features sit AT their landmark; the rest at their
            # depth back-projection (z <= 0 -> no geometry, matcher skips
            # the reprojection term via the z = -1 marker downstream)
            pw_l.append(np.where(ok_lm[:, None], pos_lm, p_w_depth))
            usable_l.append(ok_lm | (z > 0))
            pid_l.append(np.where(ok_lm, pids, -1))
            desc_pool_l.append(f.descriptors)
            n = len(pids)
            seg_rank.append(np.full(n, r))
            cand.extend((f, int(i)) for i in range(n))
        if not pw_l:
            return []
        pw = np.concatenate(pw_l)  # (n_pool, 3) world
        pids_pool = np.concatenate(pid_l)
        usable = np.concatenate(usable_l)
        rank = np.concatenate(seg_rank)
        n_pool = len(pw)
        P = _bucket(n_pool)
        Q = _bucket(max(len(c.keypoints) for _, c in queries))
        # batch axis padded to a power of two as well (keyframe count varies
        # chunk to chunk); dead rows carry all-false masks
        B = _bucket(len(queries), minimum=2)
        desc_pool = np.zeros((P, desc_mod.N_BYTES), np.uint8)
        desc_pool[:n_pool] = np.concatenate(desc_pool_l)

        # ---- per-query masks + camera-frame points ----
        # one batched pose transform for ALL queries x pool entries
        R_all = np.stack([c.pose[:3, :3] for _, c in queries])  # (m, 3, 3)
        t_all = np.stack([c.pose[:3, 3] for _, c in queries])  # (m, 3)
        p_c = np.einsum("mij,pj->mpi", R_all, pw) + t_all[:, None, :]
        p3d = np.full((B, P, 3), -1.0, np.float32)
        p3d[: len(queries), :n_pool] = np.where(
            usable[None, :, None], p_c, np.array([0.0, 0.0, -1.0])
        )
        # visibility of landmark-backed candidates in each query view
        # (FeatureTracking.cpp:178-203 select semantics)
        W_img, H_img = queries[0][1].frame.width(0), queries[0][1].frame.height(0)
        b = self.border
        zq = p_c[:, :, 2]
        zs = np.where(zq > 0, zq, 1.0)
        u = fx * p_c[:, :, 0] / zs + cx
        v = fy * p_c[:, :, 1] / zs + cy
        vis = (zq > 0) & (b < u) & (u < W_img - b) & (b < v) & (v < H_img - b)

        assoc = pids_pool >= 0
        # first occurrence of each landmark in recency order: sort pool
        # entries by (rank, index) once; unique() then picks the most recent
        # ref's copy (the sequential path's `seen` rule)
        order = np.arange(n_pool)  # already rank-major, index-minor
        mask_c = np.zeros((B, P), bool)
        desc_q = np.zeros((B, Q, desc_mod.N_BYTES), np.uint8)
        uv_q = np.zeros((B, Q, 2), np.float32)
        mask_q = np.zeros((B, Q), bool)
        m_chunk = len(all_curs)
        max_refs = max(window - 1, 1)
        for bi, (j, cur) in enumerate(queries):
            # chunk-position j's references in recency order are pool ranks
            # [m-1-j, m-j, ...]: in-chunk refs all_curs[j-1]..all_curs[0]
            # sit at ranks m-1-j..m-2 (pool_refs lists in-chunk newest
            # first, excluding the final keyframe), the pre-chunk window
            # follows at m-1... — a CONTIGUOUS rank range, trimmed to the
            # sliding window exactly like the sequential cadence's ref list
            # (empty segments consume ranks, so trimming counts FRAMES)
            lo = m_chunk - 1 - j
            in_refs = (rank >= lo) & (rank < lo + max_refs)
            m_un = in_refs & ~assoc
            sel = in_refs & assoc & usable & vis[bi]
            m_assoc = np.zeros(n_pool, bool)
            if sel.any():
                cand_idx = order[sel]
                _, first = np.unique(pids_pool[cand_idx], return_index=True)
                m_assoc[cand_idx[first]] = True
            mask_c[bi, :n_pool] = m_un | m_assoc
            dq, uq, mq = self._query_arrays(cur, Q)
            desc_q[bi], uv_q[bi], mask_q[bi] = dq, uq, mq

        if not mask_c.any():
            return []
        timer.record("track.pool", timer.time.perf_counter() - _t_pool)
        cam = queries[0][1].frame.cameras[0]
        with timer.scope("track.match"), self.compute_ctx():
            idx, ok = jax.device_get(
                _match_pool_batch(
                    jnp.asarray(desc_q),
                    jnp.asarray(uv_q),
                    jnp.asarray(mask_q),
                    jnp.asarray(desc_pool),
                    jnp.asarray(p3d),
                    jnp.asarray(mask_c),
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    jnp.float32(self.max_match_distance),
                )
            )
        new_points: List[Landmark] = []
        _t_book = timer.time.perf_counter()
        try:
            for bi, (_j, cur) in enumerate(queries):
                nq = len(cur.keypoints)
                pts = self._bookkeep(
                    cur, idx[bi][:nq], ok[bi][:nq], cand, cam_f, slam_map
                )
                # in-chunk landmarks become resolvable for LATER keyframes'
                # transitive association (position lookups in _bookkeep)
                slam_map.insert_points(pts)
                new_points.extend(pts)
        except Exception as exc:
            # the association write-back has begun — kp_landmark arrays and
            # the landmark dict are partially mutated, so a sequential
            # re-track of the same frames would corrupt the observation
            # graph. Mark the exception so callers degrade by SKIPPING
            # tracking for this chunk instead of falling back.
            exc.mutated_map = True
            raise
        timer.record("track.bookkeep", timer.time.perf_counter() - _t_book)
        return new_points
