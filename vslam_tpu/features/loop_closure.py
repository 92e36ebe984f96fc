"""Loop closure: keyframe place recognition + geometric verification.

Capability extension over the reference (its backend stops at windowed BA;
SURVEY §7 M5) that feeds the framework's pose-graph solver
(`ba/pose_graph.py`) from the live pipeline:

- place recognition: every keyframe's BRIEF-256 descriptor set is held in a
  host-side database; a query scores past keyframes by ratio-test match
  count, where each descriptor-set comparison is ONE (N, M) MXU distance
  matrix (`matcher.descriptor_l1_matrix`).
- geometric verification: matched keypoints with valid depth give 3D-3D
  correspondences in the two camera frames; a Kabsch/Horn RANSAC estimates
  the relative transform and counts inliers — a loop is accepted only with
  enough geometric inliers, which kills perceptual aliasing.

The accepted output is a pose-graph edge (i_old, j_new, rel = T_new .
T_old^-1, information) for `optimize_pose_graph`.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import align_horn
from . import descriptor as desc_mod
from . import matcher as match_mod

__all__ = ["LoopClosureConfig", "LoopCandidate", "KeyframeDatabase", "estimate_rel_3d3d"]


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    min_gap: int = 5  # skip this many most-recent keyframes (temporal neighbors)
    min_matches: int = 12  # descriptor matches to attempt verification
    min_inliers: int = 10  # 3D-3D RANSAC inliers to accept the loop
    ransac_iterations: int = 100
    inlier_threshold: float = 0.05  # [m]
    max_descriptor_distance: float = 80.0  # L1 bits (of 256)
    # place-recognition shortlist: the expensive (N, M) descriptor matrix +
    # geometric verification run only for the `max_candidates` database
    # entries closest in the cheap global-descriptor space (mean-BRIEF
    # pooling). 0 disables the shortlist (score every entry, the pre-scaling
    # behavior).
    max_candidates: int = 5


class LoopCandidate(NamedTuple):
    kf_id: int  # matched (older) keyframe id
    rel: np.ndarray  # 4x4, T_new . T_old^-1 (world->cam convention)
    n_inliers: int
    info: np.ndarray  # (6, 6) edge information
    # MEASURED translation standard error of the Horn fit: rms inlier 3-D
    # residual / sqrt(n_inliers). Unlike `info` (a scale-free heuristic
    # weight for the pose graph), this carries the scene's real metric noise
    # — the online-fold significance gate compares the claimed drift
    # against it (graph_backend.try_close).
    sigma_t: float = 0.0


def estimate_rel_3d3d(
    p_old: np.ndarray,  # (N, 3) points in the OLD camera frame
    p_new: np.ndarray,  # (N, 3) same landmarks in the NEW camera frame
    iterations: int = 100,
    threshold: float = 0.05,
    seed: int = 0,
):
    """RANSAC Kabsch: rigid T with p_new ~= R p_old + t. Returns
    (T 4x4, inlier mask)."""
    N = len(p_old)
    rng = np.random.default_rng(seed)
    best_inl = np.zeros(N, bool)
    if N < 3:
        return np.eye(4), best_inl
    # all hypotheses at once: (K, 3) index triples -> batched Horn (one
    # np.linalg.svd over a (K, 3, 3) stack) -> (K, N) residual matrix. One
    # BLAS-shaped pass instead of K python-loop SVD calls.
    idx = np.stack([rng.choice(N, 3, replace=False) for _ in range(iterations)])
    po = p_old[idx]  # (K, 3, 3)
    pn = p_new[idx]
    mu_o = po.mean(axis=1, keepdims=True)
    mu_n = pn.mean(axis=1, keepdims=True)
    W = np.einsum("kij,kil->kjl", po - mu_o, pn - mu_n)  # (K, 3, 3)
    # robustness: one NaN-contaminated or degenerate triple must not abort
    # the whole hypothesis stack (np.linalg.svd raises for the full batch).
    # Non-finite W rows are replaced by identity and their inliers zeroed;
    # if the batched SVD still fails to converge, fall back to scoring
    # hypotheses one by one, skipping the offenders.
    bad = ~np.isfinite(W).all(axis=(1, 2))
    if bad.any():
        W = np.where(bad[:, None, None], np.eye(3), W)
    try:
        U, _, Vt = np.linalg.svd(W)
    except np.linalg.LinAlgError:
        U = np.repeat(np.eye(3)[None], iterations, axis=0)
        Vt = np.repeat(np.eye(3)[None], iterations, axis=0)
        for k in range(iterations):
            try:
                U[k], _, Vt[k] = np.linalg.svd(W[k])
            except np.linalg.LinAlgError:
                bad[k] = True
    det = np.linalg.det(np.einsum("kij,kjl->kil", U, Vt))
    S = np.repeat(np.eye(3)[None], iterations, axis=0)
    S[:, 2, 2] = np.sign(det) + (det == 0)
    R_all = np.einsum("kji,kjl,kml->kim", Vt, S, U)  # V S U^T per hypothesis
    t_all = mu_n[:, 0, :] - np.einsum("kij,kj->ki", R_all, mu_o[:, 0, :])
    pred = np.einsum("kij,nj->kni", R_all, p_old) + t_all[:, None, :]
    err = np.linalg.norm(pred - p_new[None], axis=2)  # (K, N)
    inl_all = err < threshold
    inl_all[bad] = False
    best_inl = inl_all[np.argmax(inl_all.sum(axis=1))]
    R, t = np.eye(3), np.zeros(3)  # no-consensus fallback (caller checks inliers)
    if best_inl.sum() >= 3:
        R, t = align_horn(p_old[best_inl], p_new[best_inl])
        refined = np.linalg.norm(p_old @ R.T + t - p_new, axis=1) < threshold
        if refined.sum() >= 3:
            R, t = align_horn(p_old[refined], p_new[refined])
        # the returned mask must be evaluated against the RETURNED transform
        # (the caller's n_inliers gates acceptance and scales the edge
        # information; a mask from an intermediate fit misreports both)
        best_inl = np.linalg.norm(p_old @ R.T + t - p_new, axis=1) < threshold
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T, best_inl


@dataclasses.dataclass
class _Entry:
    kf_id: int
    descriptors: np.ndarray  # (N, 32) bit-packed u8 (or legacy (N, 256) f32)
    p_cam: np.ndarray  # (N, 3) camera-frame 3D points (z<=0 where no depth)
    gdesc: np.ndarray  # (256,) global descriptor: mean BRIEF bit vector


def _as_packed(desc: np.ndarray) -> np.ndarray:
    """(N, 32) u8 bit-packed descriptors from either representation — the
    form that crosses the host->device link at query time (32x fewer bytes
    than f32 bit vectors; unpacked on device for the MXU L1 matmul)."""
    desc = np.asarray(desc)
    if desc.dtype == np.uint8 and desc.shape[-1] == desc_mod.N_BYTES:
        return desc
    return np.packbits(desc.astype(np.float32) > 0.5, axis=-1)


def _global_descriptor(descriptors: np.ndarray) -> np.ndarray:
    """Mean-pooled BRIEF bit vector: each of the 256 binary tests becomes the
    fraction of keypoints for which it fired. Viewpoint- and count-invariant
    enough to rank places; two sets from the same scene share test statistics
    while different scenes decorrelate (a bag-of-bits image signature)."""
    return np.asarray(descriptors, np.float32).mean(axis=0)


class KeyframeDatabase:
    """Host-side place-recognition database over keyframe descriptor sets."""

    def __init__(self, cfg: LoopClosureConfig = LoopClosureConfig()):
        self.cfg = cfg
        self._entries: List[_Entry] = []

    def __len__(self) -> int:
        return len(self._entries)

    @staticmethod
    def _points_cam(frame) -> np.ndarray:
        """(N, 3) camera-frame points from keypoints + depth (z=-1 invalid)."""
        from .tracking import _cam_floats

        fx, fy, cx, cy = _cam_floats(frame.frame.cameras[0])
        uv = np.asarray(frame.keypoints, np.float64)
        z = np.asarray(frame.kp_depth, np.float64)
        ok = z > 0
        zs = np.where(ok, z, 1.0)
        x = (uv[:, 0] - cx) / fx * zs
        y = (uv[:, 1] - cy) / fy * zs
        p = np.stack([x, y, zs], axis=1)
        p[~ok] = [0.0, 0.0, -1.0]
        return p

    def add(self, frame) -> None:
        """Register a keyframe (HostFrame with extracted features)."""
        if frame.keypoints is None or len(frame.keypoints) == 0:
            return
        self._entries.append(
            _Entry(
                kf_id=frame.id,
                descriptors=_as_packed(frame.descriptors),
                p_cam=self._points_cam(frame),
                gdesc=_global_descriptor(desc_mod.as_float_bits(frame.descriptors)),
            )
        )

    def query(self, frame) -> Optional[LoopCandidate]:
        """Find a verified loop closure for the given keyframe (which should
        already have been `add`ed or is about to be)."""
        cfg = self.cfg
        if frame.keypoints is None or len(frame.keypoints) == 0:
            return None
        # reuse the query frame's own entry if it was just add()ed — its
        # packed descriptors / global descriptor / back-projected points are
        # exactly what we'd recompute here
        own = next((e for e in self._entries if e.kf_id == frame.id), None)
        candidates = [e for e in self._entries if e.kf_id != frame.id]
        candidates = candidates[: len(candidates) - cfg.min_gap] if len(candidates) > cfg.min_gap else []
        if not candidates:
            return None
        if cfg.max_candidates > 0 and len(candidates) > cfg.max_candidates:
            # shortlist by global descriptor: one (C, 256) L1 scan replaces C
            # full (N, M) descriptor matrices + RANSAC passes — query cost
            # becomes O(C·256) + O(k) verifications, k fixed, so the per-query
            # work is flat in database size (sub-linear in total matching work)
            gq = (
                own.gdesc
                if own is not None
                else _global_descriptor(desc_mod.as_float_bits(frame.descriptors))
            )
            G = np.stack([e.gdesc for e in candidates])
            score = np.abs(G - gq[None]).sum(axis=1)
            keep = np.argsort(score)[: cfg.max_candidates]
            candidates = [candidates[i] for i in keep]
        packed_q = own.descriptors if own is not None else _as_packed(frame.descriptors)
        desc_q = desc_mod.unpack_bits(jnp.asarray(packed_q))
        p_new_all = own.p_cam if own is not None else self._points_cam(frame)

        best: Optional[LoopCandidate] = None
        for e in candidates:
            d = match_mod.descriptor_l1_matrix(
                desc_q,
                desc_mod.unpack_bits(jnp.asarray(_as_packed(e.descriptors))),
            )
            res = match_mod.ratio_match(
                d, max_distance=cfg.max_descriptor_distance, unique=True
            )
            ok, idx = jax.device_get((res.valid, res.idx))  # one fetch
            if int(ok.sum()) < cfg.min_matches:
                continue
            qi = np.nonzero(ok)[0]
            ci = idx[qi]
            p_new = p_new_all[qi]
            p_old = e.p_cam[ci]
            geom = (p_new[:, 2] > 0) & (p_old[:, 2] > 0)
            if geom.sum() < 3:
                continue
            T, inl = estimate_rel_3d3d(
                p_old[geom],
                p_new[geom],
                iterations=cfg.ransac_iterations,
                threshold=cfg.inlier_threshold,
                seed=e.kf_id,
            )
            n_inl = int(inl.sum())
            if n_inl >= cfg.min_inliers and (best is None or n_inl > best.n_inliers):
                # information scales with inlier support; rotation block
                # stiffer than translation (point noise couples into t first)
                info = np.eye(6) * (n_inl * 10.0)
                info[3:, 3:] *= 4.0
                # measured standard error of the fitted translation: rms
                # inlier residual of T applied to the matched 3-D points,
                # shrunk by sqrt(n) (the Horn estimate averages n points)
                po, pn = p_old[geom][inl], p_new[geom][inl]
                r3 = pn - (po @ T[:3, :3].T + T[:3, 3])
                sigma_t = float(
                    np.sqrt(np.mean(np.sum(r3 * r3, axis=1)) / max(n_inl, 1))
                )
                best = LoopCandidate(
                    kf_id=e.kf_id, rel=T, n_inliers=n_inl, info=info,
                    sigma_t=sigma_t,
                )
        return best
