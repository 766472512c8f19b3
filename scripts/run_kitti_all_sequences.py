"""Run KITTI stereo odometry over sequences and evaluate against ground truth
— the twin of the reference's scripts/kitti_geometric_stereo.bash +
devkit/cpp/evaluate_odometry pipeline.

Usage:
    python scripts/run_kitti_all_sequences.py DATA_ROOT PARAMS.yaml OUT_DIR \
        [--sequences 00,01,...] [--gt GROUND_TRUTH_DIR] [--max-frames N]

DATA_ROOT holds KITTI odometry sequences (DATA_ROOT/<seq>/image_2 etc. with a
cvo_calib.txt per sequence, as the reference's KittiHandler expects);
GROUND_TRUTH_DIR holds <seq>.txt pose files (reference ground_truth/ layout).
Writes OUT_DIR/<seq>.txt trajectories and prints the devkit segment errors
(avg translational %% / rotational deg/m over lengths 100..800 m).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("params")
    ap.add_argument("out_dir")
    ap.add_argument("--sequences", default="00,01,02,03,04,05,06,07,08,09,10")
    ap.add_argument("--gt", default=None, help="ground-truth pose dir")
    ap.add_argument("--max-frames", type=int, default=100000)
    ap.add_argument("--semantic", action="store_true")
    args = ap.parse_args(argv)

    from unified_cvo_tpu.apps.kitti_odometry import run_sequence
    from unified_cvo_tpu.datasets.kitti import read_kitti_poses
    from unified_cvo_tpu.utils.metrics import kitti_seq_error

    os.makedirs(args.out_dir, exist_ok=True)
    summary = []
    for seq in args.sequences.split(","):
        seq = seq.strip()
        seq_dir = os.path.join(args.data_root, seq)
        if not os.path.isdir(seq_dir):
            print(f"[skip] {seq_dir} not found")
            continue
        out_path = os.path.join(args.out_dir, f"{seq}.txt")
        print(f"=== sequence {seq} -> {out_path}")
        run_sequence(seq_dir, args.params, out_path,
                     max_frames=args.max_frames, semantic=args.semantic,
                     metrics_path=os.path.join(args.out_dir, f"{seq}.metrics.jsonl"))
        if args.gt:
            gt_path = os.path.join(args.gt, seq, f"{seq}.txt")
            if not os.path.exists(gt_path):
                gt_path = os.path.join(args.gt, f"{seq}.txt")
            if os.path.exists(gt_path):
                t_err, r_err = kitti_seq_error(
                    read_kitti_poses(gt_path), read_kitti_poses(out_path))
                summary.append((seq, t_err, r_err))
                print(f"seq {seq}: translational {t_err*100:.2f}% "
                      f"rotational {r_err*57.2958*100:.2f} deg/100m")
    if summary:
        import numpy as np

        t = np.mean([s[1] for s in summary])
        r = np.mean([s[2] for s in summary])
        print(f"=== average over {len(summary)} sequences: "
              f"translational {t*100:.2f}% rotational {r*57.2958*100:.2f} deg/100m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
