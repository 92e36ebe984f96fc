"""Robust line fitting with the framework's loss/scaler stack.

Role of the reference prototype
`src/vslam/src/least_squares/scripts/robust_line_fit.py` (IRLS with a Huber
weighting on a contaminated line dataset), rebuilt on `vslam_tpu.solvers`:
the same Gauss-Newton engine, losses and scalers the dense aligner uses —
a 2-parameter problem makes the robust machinery easy to inspect.

Run: python examples/robust_line_fit.py [--plot out.png]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.solvers import LossConfig, SolverConfig, solve_gauss_newton
from vslam_tpu.solvers import loss as loss_mod
from vslam_tpu.solvers.normal_equations import NormalEquations


def make_data(n=100, outlier_frac=0.05, seed=7):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-100, 100, n)
    ys = 1.0 * xs + 0.0 + rng.normal(0, 2.0, n)
    out = rng.uniform(size=n) < outlier_frac
    ys = np.where(out, ys + rng.normal(0, 200.0, n), ys)
    return xs.astype(np.float32), ys.astype(np.float32), out


def fit(xs, ys, loss_name: str):
    """GN over (m, c) with the framework's robust weighting."""
    X = jnp.stack([jnp.asarray(xs), jnp.ones_like(jnp.asarray(xs))], axis=1)  # (N, 2)
    y = jnp.asarray(ys)
    cfg_loss = LossConfig(loss_name)
    mask = jnp.ones(y.shape, bool)

    def compute_ne(mc):
        r = X @ mc - y
        if cfg_loss.function != "None":
            scale = loss_mod.compute_scale(cfg_loss, r, mask)
            r_std = (r - scale.offset) / scale.scale
            w = loss_mod.compute_weights(cfg_loss, r_std)
        else:
            w = jnp.ones_like(r)
        Xw = X * w[:, None]
        return NormalEquations(Xw.T @ X, Xw.T @ r, jnp.sum(w * r * r), jnp.sum(mask))

    def update(mc, dx):
        return mc - dx[: mc.shape[0]]

    res = solve_gauss_newton(
        compute_ne,
        update,
        jnp.zeros(2, jnp.float32),
        2,
        SolverConfig(max_iterations=30, min_step_size=1e-8),
    )
    return np.asarray(res.x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None, help="write a comparison PNG")
    args = ap.parse_args()

    xs, ys, outliers = make_data()
    results = {name: fit(xs, ys, name) for name in ["None", "Huber", "Tukey"]}
    print(f"ground truth: m=1.000 c=0.000 ({outliers.sum()} outliers / {len(xs)} pts)")
    for name, (m, c) in results.items():
        print(f"loss={name:6s}: m={m:+.4f} c={c:+.4f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        ax.scatter(xs[~outliers], ys[~outliers], s=8, label="inliers")
        ax.scatter(xs[outliers], ys[outliers], s=12, color="tab:red", label="outliers")
        grid = np.linspace(xs.min(), xs.max(), 2)
        for name, (m, c) in results.items():
            ax.plot(grid, m * grid + c, label=f"{name} fit")
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
