"""Offline EKF motion-model analysis (role of the reference's
`src/vslam/src/kalman/scripts/vehicle_motion.py` prototype).

Simulates a smooth SE(3) trajectory, feeds noisy velocity-twist measurements
to the constant-velocity EKF, and plots filtered vs raw velocity estimates
plus the prediction error against ground truth.

Usage: python examples/ekf_motion_analysis.py [out.png]
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vslam_tpu.core import lie_np
from vslam_tpu.kalman import ekf_se3


def main(out_path: str = "ekf_motion_analysis.png"):
    rng = np.random.default_rng(0)
    dt = 1.0 / 30.0
    n = 300

    # ground truth: smoothly varying twist
    t = np.arange(n) * dt
    v_true = np.stack(
        [
            0.3 * np.sin(0.8 * t),
            0.1 * np.cos(1.1 * t),
            0.2 * np.sin(0.5 * t + 1.0),
            0.05 * np.sin(0.9 * t),
            0.04 * np.cos(0.7 * t),
            0.06 * np.sin(1.3 * t),
        ],
        axis=1,
    )
    noise = rng.normal(0, 0.05, v_true.shape)
    v_meas = v_true + noise

    state = ekf_se3.init(process_noise=5e-3)
    R = jnp.eye(6, dtype=jnp.float32) * (0.05**2)
    v_filt = np.zeros_like(v_true)
    pred_err = np.zeros(n)
    pose_gt = np.eye(4)
    for i in range(n):
        state, pose_pred = ekf_se3.predict(state, dt)
        state = ekf_se3.update(state, jnp.asarray(v_meas[i], jnp.float32), R)
        v_filt[i] = np.asarray(state.velocity)
        pose_gt = pose_gt @ lie_np.exp(v_true[i] * dt)

    raw_rmse = np.sqrt(np.mean((v_meas - v_true) ** 2))
    filt_rmse = np.sqrt(np.mean((v_filt - v_true) ** 2))
    print(f"velocity RMSE raw {raw_rmse:.4f} -> filtered {filt_rmse:.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 2, figsize=(12, 8), sharex=True)
    names = ["vx", "vy", "vz", "wx", "wy", "wz"]
    for k, ax in enumerate(axes.ravel()):
        ax.plot(t, v_meas[:, k], ".", ms=1.5, alpha=0.4, label="measured")
        ax.plot(t, v_true[:, k], "k-", lw=1, label="truth")
        ax.plot(t, v_filt[:, k], "-", lw=1.2, label="EKF")
        ax.set_ylabel(names[k])
    axes[0, 0].legend(fontsize=8)
    fig.suptitle("Constant-velocity SE(3) EKF: velocity filtering")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:2])
