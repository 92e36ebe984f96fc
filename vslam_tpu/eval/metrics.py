"""TUM RGB-D benchmark metrics: timestamp association, ATE, RPE.

Fresh implementations with the same protocol as the reference's vendored TUM
scripts (`script/vslam_evaluation/tum/{associate,evaluate_ate,evaluate_rpe}.py`):
- associate: greedy closest-timestamp matching within max_difference
  (associate.py:49-128)
- ATE: Horn/SVD rigid alignment of matched translations, RMSE of residuals
  (evaluate_ate.py:47-79)
- RPE: relative-pose error over fixed-delta pairs; the reference driver runs
  it with --fixed_delta --delta_unit s (script/evaluate.py:65-75)
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core import lie_np

__all__ = ["associate", "align_horn", "ate_rmse", "rpe", "summarize"]


def associate(
    ts_a: Sequence[float],
    ts_b: Sequence[float],
    offset: float = 0.0,
    max_difference: float = 0.02,
) -> List[Tuple[int, int]]:
    """Greedy best-first matching of two timestamp lists. Returns index pairs
    (ia, ib), each timestamp used at most once.

    Candidate generation is vectorized with searchsorted (the naive
    all-pairs double loop is O(N*M) interpreted Python — tens of millions of
    iterations on fr2_desk-sized trajectories); only the (a, b) pairs within
    max_difference are enumerated, which preserves the reference protocol
    (associate.py:49-128) exactly.
    """
    a = np.asarray(ts_a, np.float64)
    b = np.asarray(ts_b, np.float64) + offset
    if a.size == 0 or b.size == 0:
        return []
    order_b = np.argsort(b, kind="stable")
    b_sorted = b[order_b]
    lo = np.searchsorted(b_sorted, a - max_difference, side="left")
    hi = np.searchsorted(b_sorted, a + max_difference, side="right")
    counts = hi - lo
    ia_all = np.repeat(np.arange(a.size), counts)
    # per-a candidate offsets into b_sorted
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ib_sorted = lo[ia_all] + (np.arange(ia_all.size) - starts[ia_all])
    ib_all = order_b[ib_sorted]
    d_all = np.abs(a[ia_all] - b[ib_all])
    keep = d_all < max_difference  # strict, matching the reference
    ia_all, ib_all, d_all = ia_all[keep], ib_all[keep], d_all[keep]

    order = np.lexsort((ib_all, ia_all, d_all))
    used_a = np.zeros(a.size, bool)
    used_b = np.zeros(b.size, bool)
    matches = []
    for k in order:  # O(#candidates) with small windows, not O(N*M)
        ia, ib = int(ia_all[k]), int(ib_all[k])
        if not used_a[ia] and not used_b[ib]:
            used_a[ia] = True
            used_b[ib] = True
            matches.append((ia, ib))
    matches.sort()
    return matches


def align_horn(model: np.ndarray, data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Least-squares rigid transform (R, t) minimizing ||R model + t - data||
    via SVD (Horn's method). model/data: (N, 3)."""
    mu_m = model.mean(axis=0)
    mu_d = data.mean(axis=0)
    Mc = model - mu_m
    Dc = data - mu_d
    W = Mc.T @ Dc
    U, _, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = Vt.T @ S @ U.T
    t = mu_d - R @ mu_m
    return R, t


def ate_rmse(
    gt: Dict[float, np.ndarray],
    est: Dict[float, np.ndarray],
    max_difference: float = 0.02,
) -> Tuple[float, int]:
    """Absolute trajectory error. Poses are cam->world 4x4 (TUM convention:
    the file rows are the camera pose in the world). Returns (rmse, n)."""
    ts_g = sorted(gt.keys())
    ts_e = sorted(est.keys())
    matches = associate(ts_g, ts_e, max_difference=max_difference)
    if len(matches) < 2:
        raise ValueError(f"Couldn't associate trajectories ({len(matches)} matches)")
    P_g = np.stack([gt[ts_g[ia]][:3, 3] for ia, _ in matches])
    P_e = np.stack([est[ts_e[ib]][:3, 3] for _, ib in matches])
    R, t = align_horn(P_e, P_g)
    aligned = P_e @ R.T + t
    err = aligned - P_g
    return float(np.sqrt(np.mean(np.sum(err * err, axis=1)))), len(matches)


def rpe(
    gt: Dict[float, np.ndarray],
    est: Dict[float, np.ndarray],
    fixed_delta: float = 1.0,
    max_difference: float = 0.02,
) -> Tuple[float, float, int]:
    """Relative pose error over pairs (t, t+delta) of the estimated
    trajectory, compared against ground truth over the same interval.
    Returns (trans_rmse [m], rot_rmse [rad], n_pairs)."""
    ts_g = sorted(gt.keys())
    ts_e = sorted(est.keys())
    matches = associate(ts_g, ts_e, max_difference=max_difference)
    if len(matches) < 2:
        raise ValueError("Couldn't associate trajectories")
    pairs_g = [ts_g[ia] for ia, _ in matches]
    pairs_e = [ts_e[ib] for _, ib in matches]

    t_errs, r_errs = [], []
    te = np.asarray(pairs_e)
    for i in range(len(matches)):
        target = pairs_e[i] + fixed_delta
        j = int(np.searchsorted(te, target))
        if j >= len(matches):
            continue
        # accept the closest index to the requested delta within 20% slack
        if j > 0 and abs(te[j - 1] - target) < abs(te[j] - target):
            j = j - 1
        if abs(te[j] - target) > 0.2 * fixed_delta:
            continue
        # TUM convention: poses are cam->world; relative motion over the
        # interval is inv(p_i) . p_j (evaluate_rpe.py ominus)
        rel_e = lie_np.inv(est[pairs_e[i]]) @ est[pairs_e[j]]
        rel_g = lie_np.inv(gt[pairs_g[i]]) @ gt[pairs_g[j]]
        E = lie_np.inv(rel_g) @ rel_e
        t_errs.append(np.linalg.norm(E[:3, 3]))
        r_errs.append(np.linalg.norm(lie_np.matrix_to_rotvec(E[:3, :3])))
    if not t_errs:
        raise ValueError("No RPE pairs found")
    t_errs = np.asarray(t_errs)
    r_errs = np.asarray(r_errs)
    return (
        float(np.sqrt(np.mean(t_errs**2))),
        float(np.sqrt(np.mean(r_errs**2))),
        len(t_errs),
    )


def summarize(
    gt: Dict[float, np.ndarray], est: Dict[float, np.ndarray]
) -> Dict[str, float]:
    ate, n_ate = ate_rmse(gt, est)
    rpe_t, rpe_r, n_rpe = rpe(gt, est)
    return {
        "ate_rmse_m": ate,
        "rpe_trans_rmse_m": rpe_t,
        "rpe_rot_rmse_rad": rpe_r,
        "n_ate_pairs": n_ate,
        "n_rpe_pairs": n_rpe,
    }
