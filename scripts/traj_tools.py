"""Trajectory-file utilities — the reference's small pose-wrangling
scripts, consolidated (reference scripts/: gen_relative_pose.py,
print_relative_between_two.py, xyzq2kitti.py, xyz2plot.py,
init_vs_end_scatter_plot.py + velocity_length_error_plot.py — the last
two ship with empty function bodies upstream; `scatter` here is the
completed version of what they sketch).

Subcommands:
    rel ACCUM.txt START N [fmt]      relative poses from an accumulated
                                     trajectory (fmt: kitti|tum|tartan)
    between A.txt B.txt IDX [fmt]    relative pose A^-1 B at row IDX
    xyzq2kitti IN.txt OUT.txt        x y z qx qy qz qw rows (optionally
                                     led by a timestamp) -> KITTI rows
    plot TRAJ.txt [TRAJ2.txt ...] OUT.png    top-down (x-z) plot
    scatter EST_DIR GT_DIR OUT.png   per-sequence devkit trans%% / rot
                                     scatter over <seq>.txt pairs
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _load_kitti(path):
    rows = np.atleast_2d(np.loadtxt(path))
    T = np.tile(np.eye(4), (len(rows), 1, 1))
    T[:, :3, :4] = rows[:, :12].reshape(-1, 3, 4)
    return T


def _load_xyzq(path):
    from scipy.spatial.transform import Rotation

    rows = np.atleast_2d(np.loadtxt(path))
    if rows.shape[1] == 8:          # timestamped TUM rows
        rows = rows[:, 1:]
    T = np.tile(np.eye(4), (len(rows), 1, 1))
    T[:, :3, 3] = rows[:, :3]
    T[:, :3, :3] = Rotation.from_quat(rows[:, 3:7]).as_matrix()
    return T


def _load(path, fmt):
    return _load_kitti(path) if fmt == "kitti" else _load_xyzq(path)


def _print_kitti(T):
    print(" ".join(f"{v:.9g}" for v in T[:3, :4].reshape(-1)))


def cmd_rel(argv):
    path, start, n = argv[0], int(argv[1]), int(argv[2])
    fmt = argv[3] if len(argv) > 3 else "kitti"
    T = _load(path, fmt)
    for k in range(start, min(start + n, len(T) - 1)):
        _print_kitti(np.linalg.inv(T[k]) @ T[k + 1])
    return 0


def cmd_between(argv):
    a, b, idx = argv[0], argv[1], int(argv[2])
    fmt = argv[3] if len(argv) > 3 else "kitti"
    Ta, Tb = _load(a, fmt), _load(b, fmt)
    _print_kitti(np.linalg.inv(Ta[idx]) @ Tb[idx])
    return 0


def cmd_xyzq2kitti(argv):
    T = _load_xyzq(argv[0])
    with open(argv[1], "w") as f:
        for Tk in T:
            f.write(" ".join(f"{v:.9g}" for v in Tk[:3, :4].reshape(-1))
                    + "\n")
    print(f"wrote {len(T)} rows to {argv[1]}")
    return 0


def cmd_plot(argv):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = argv[-1]
    fig, ax = plt.subplots(figsize=(7, 7))
    for path in argv[:-1]:
        T = _load_kitti(path)
        ax.plot(T[:, 0, 3], T[:, 2, 3], label=os.path.basename(path))
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")
    return 0


def cmd_scatter(argv):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from unified_cvo_tpu.utils.metrics import kitti_seq_error

    est_dir, gt_dir, out = argv[:3]
    pts = []
    for name in sorted(os.listdir(est_dir)):
        if not name.endswith(".txt"):
            continue
        gt_path = os.path.join(gt_dir, name)
        if not os.path.exists(gt_path):
            gt_path = os.path.join(gt_dir, name.split(".")[0], name)
            if not os.path.exists(gt_path):
                continue
        est = _load_kitti(os.path.join(est_dir, name))
        gt = _load_kitti(gt_path)
        t_err, r_err = kitti_seq_error(gt, est)
        if not np.isfinite(t_err):
            # short (synthetic) sequences never reach the devkit's 100 m
            # segments — fall back to quarter/half-length segments
            d = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
            t_err, r_err = kitti_seq_error(
                gt, est, step=1, lengths=(max(d / 4, 1e-3), max(d / 2, 2e-3)))
        if np.isfinite(t_err):
            pts.append((name.split(".")[0], 100 * t_err, r_err))
    if not pts:
        sys.exit("no scoreable <seq>.txt pairs found")
    fig, ax = plt.subplots(figsize=(7, 5))
    for name, te, re_ in pts:
        ax.scatter(te, re_, s=30)
        ax.annotate(name, (te, re_), fontsize=8,
                    textcoords="offset points", xytext=(4, 4))
    ax.set_xlabel("translational error [%]")
    ax.set_ylabel("rotational error [rad/m]")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    for name, te, re_ in pts:
        print(f"{name}: trans {te:.2f} %  rot {re_:.5f} rad/m")
    print(f"wrote {out}")
    return 0


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cmds = {"rel": cmd_rel, "between": cmd_between,
            "xyzq2kitti": cmd_xyzq2kitti, "plot": cmd_plot,
            "scatter": cmd_scatter}
    if not argv or argv[0] not in cmds:
        print(__doc__)
        return 1
    return cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
