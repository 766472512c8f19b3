"""TUM ATE evaluation CLI — the evaluate_ate_scale.py twin.

The reference's BA scripts score trajectories with an external
evaluate_ate_scale.py before and after bundle adjustment
(scripts/cvo_irls_tum.bash, last lines: "before BA ate:" /
"after BA ate:"). This is that tool, built on the devkit twins in
utils/metrics: Umeyama-aligned absolute trajectory error, optionally
with scale correction (the monocular convention).

Usage:
    python -m unified_cvo_tpu.apps.evaluate_ate GT.txt EST.txt [--scale]
        [--rpe] [--delta N]

GT/EST: TUM-format (timestamp tx ty tz qx qy qz qw) or KITTI 12-column
rows. Prints one line per metric.
"""

from __future__ import annotations

import argparse

import numpy as np

from unified_cvo_tpu.utils.metrics import ate_rmse, rpe_rmse


def load_trajectory(path: str) -> np.ndarray:
    """[N,4,4] poses from a TUM (8-col) or KITTI (12-col) file."""
    with open(path) as f:
        first = f.readline().split()
    if len(first) >= 12:
        rows = np.atleast_2d(np.loadtxt(path))
        out = np.tile(np.eye(4), (len(rows), 1, 1))
        out[:, :3, :] = rows[:, -12:].reshape(-1, 3, 4)
        return out
    from unified_cvo_tpu.datasets.tum import read_tum_trajectory

    _, poses = read_tum_trajectory(path)
    return poses


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gt")
    ap.add_argument("est")
    ap.add_argument("--scale", action="store_true",
                    help="scale-corrected alignment (evaluate_ate_scale)")
    ap.add_argument("--rpe", action="store_true",
                    help="also print relative pose error")
    ap.add_argument("--delta", type=int, default=1,
                    help="RPE frame gap")
    args = ap.parse_args(argv)
    gt = load_trajectory(args.gt)
    est = load_trajectory(args.est)
    n = min(len(gt), len(est))
    if n < 2:
        print("need at least 2 poses")
        return 1
    ate = ate_rmse(gt[:n], est[:n], with_scale=args.scale)
    print(f"ate rmse: {ate:.6f} m"
          + (" (scale-aligned)" if args.scale else ""))
    if args.rpe:
        rpe = rpe_rmse(gt[:n], est[:n], delta=args.delta)
        print(f"rpe rmse (delta={args.delta}): {rpe:.6f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
