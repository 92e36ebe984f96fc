"""Checkpoint / resume for mid-sequence tracking state.

The reference persists only the output trajectory (+ per-experiment
meta.yaml, SURVEY.md §5 "checkpoint/resume: none in the algorithmic
sense"); this module adds the TPU-native extension the survey recommends:
snapshot the live state as arrays so a long replay can stop and resume
without reprocessing.

What is saved (one .npz, no external deps):
- the fused scan's `SequentialState` (cached keyframe/last-frame level data,
  pose chain, speed, keyframe counter — every leaf is a device array),
- the last emitted timestamp (for dt continuity),
- optionally the landmark map (positions + observation bookkeeping) from
  the chunk mapping backend.

Everything device-resident is pulled to host numpy at save and re-placed
lazily at load (JAX re-commits leaves on first use).
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_sequential", "load_sequential", "save_landmarks", "load_landmarks"]


def save_sequential(path: str, state, t_last_ns: int) -> None:
    """Snapshot a `SequentialState` (+ stream clock) to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["t_last_ns"] = np.asarray(int(t_last_ns), np.int64)
    np.savez_compressed(path, **arrays)


def load_sequential(path: str, state_like) -> Tuple[object, int]:
    """Restore a `SequentialState` saved by :func:`save_sequential`.

    ``state_like`` provides the pytree structure (e.g. a fresh
    `init_state(...)` with the same geometry); shapes are validated.
    Returns (state, t_last_ns).
    """
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(state_like)
    leaves = []
    for i, like in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(like)):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {np.shape(like)}"
            )
        leaves.append(jnp.asarray(arr, dtype=like.dtype if hasattr(like, "dtype") else None))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, int(data["t_last_ns"])


def save_landmarks(path: str, landmarks) -> None:
    """Persist a landmark list (`odometry.map.Landmark`) to ``path`` (.npz):
    positions as one (N, 3) array, ids and observation maps as JSON."""
    positions = np.stack([np.asarray(lm.position, np.float64) for lm in landmarks]) if landmarks else np.zeros((0, 3))
    meta = [
        {"id": int(lm.id), "observations": {str(k): int(v) for k, v in lm.observations.items()}}
        for lm in landmarks
    ]
    np.savez_compressed(path, positions=positions, meta=json.dumps(meta))


def load_landmarks(path: str):
    """Rebuild the landmark list saved by :func:`save_landmarks`."""
    from ..odometry.map import Landmark

    data = np.load(path, allow_pickle=False)
    positions = data["positions"]
    meta = json.loads(str(data["meta"]))
    out = []
    for pos, m in zip(positions, meta):
        lm = Landmark(position=pos.copy(), observations={int(k): int(v) for k, v in m["observations"].items()}, id=int(m["id"]))
        out.append(lm)
    return out
