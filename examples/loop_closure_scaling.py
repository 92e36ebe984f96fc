"""Loop-closure backend latency vs. database size.

Times `KeyframeDatabase.query` at growing database sizes with and without the
global-descriptor shortlist (`LoopClosureConfig.max_candidates`). With the
shortlist the per-query cost is one O(C*256) host scan plus a FIXED number of
full descriptor-matrix + RANSAC verifications, so latency stays flat as the
database grows — the property needed for KITTI-00-scale maps (~1.3k
keyframes), where the unfiltered scan is C full (N, M) MXU matrices per query.

Usage: python examples/loop_closure_scaling.py [sizes...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vslam_tpu.features import loop_closure as lc


def build_db(n: int, cfg: lc.LoopClosureConfig, rng) -> lc.KeyframeDatabase:
    db = lc.KeyframeDatabase(cfg)
    for k in range(n):
        desc = (rng.random((200, 256)) < rng.uniform(0.3, 0.7, 256)).astype(np.float32)
        pts = rng.uniform(-1, 1, (200, 3)) + [0, 0, 2.0]
        db._entries.append(
            lc._Entry(kf_id=k, descriptors=desc, p_cam=pts, gdesc=lc._global_descriptor(desc))
        )
    return db


class _Query:
    """Minimal stand-in for a HostFrame keyframe with extracted features."""

    def __init__(self, rng):
        self.id = 10**9
        self.descriptors = (rng.random((200, 256)) < 0.5).astype(np.float32)
        self.keypoints = rng.uniform(0, 100, (200, 2))
        self.kp_depth = rng.uniform(0.5, 3.0, 200)

        class _Cam:
            fx = fy = 100.0
            cx = cy = 50.0

        class _Frame:
            cameras = [_Cam()]

        self.frame = _Frame()


def main(sizes):
    rng = np.random.default_rng(0)
    q = _Query(rng)
    print(f"{'keyframes':>10} {'shortlist ms':>14} {'full-scan ms':>14}")
    for n in sizes:
        row = [n]
        for k in (5, 0):  # shortlisted vs unfiltered
            cfg = lc.LoopClosureConfig(min_gap=2, max_candidates=k)
            db = build_db(n, cfg, np.random.default_rng(1))
            db.query(q)  # warm the matcher jit
            t0 = time.perf_counter()
            reps = 3 if k else 1
            for _ in range(reps):
                db.query(q)
            row.append(1e3 * (time.perf_counter() - t0) / reps)
        print(f"{row[0]:>10} {row[1]:>14.1f} {row[2]:>14.1f}")


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [100, 300, 1000]
    main(sizes)
