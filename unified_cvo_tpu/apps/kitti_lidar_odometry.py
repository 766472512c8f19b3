"""KITTI lidar frame-to-frame odometry — the cvo_align_gpu_lidar_raw twin.

Usage:
    python -m unified_cvo_tpu.apps.kitti_lidar_odometry SEQ_DIR PARAMS.yaml OUT.txt \
        [START_FRAME] [MAX_FRAMES] [--semantic]

Mirrors src/experiments/main_cvo_gpu_align_raw_lidar.cpp: per frame, build
an intensity-feature lidar cloud (edge detection + LOAM-lite surfaces),
align frame-to-frame with constant-velocity init, accumulate KITTI rows.
With --semantic, per-point SemanticKITTI labels (<seq>/labels/*.label) are
attached as one-hot 19-class distributions — the semantic-lidar twin
(main_cvo_gpu_align_raw_lidar with semantics; KittiHandler.cpp:154-193;
CvoPointCloud.cpp:1040-1136).
"""

from __future__ import annotations

import sys

import numpy as np


from unified_cvo_tpu.apps._odometry_common import run_pipelined
from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.datasets.kitti import KittiHandler, write_kitti_pose_row
from unified_cvo_tpu.frontend.lidar import pointcloud_from_lidar

CAPACITY = 16384


def run_sequence(seq_dir, param_file, out_path, start_frame=0, max_frames=100000,
                 chunk=4096, max_iter=None, log=print, semantic=False,
                 num_classes=19, capacity=CAPACITY):
    """With semantic=True, per-point SemanticKITTI labels are read from
    <seq>/labels/*.label and attached as one-hot distributions — the
    semantic-lidar pipeline (KittiHandler.cpp read_next_lidar semantic
    overload; semantic CvoPointCloud ctor, CvoPointCloud.cpp:1040-1136)."""
    kitti = KittiHandler(seq_dir, "lidar")
    params = read_cvo_params_yaml(param_file)
    first_params = params.first_frame()
    kitti.set_start_index(start_frame)

    def read_frame():
        if semantic:
            fr = kitti.read_next_lidar_semantic(num_classes)
            if fr is None:
                return None
            pts, labels = fr
            return pointcloud_from_lidar(
                pts, semantics=labels, num_classes=num_classes,
                capacity=capacity)
        pts = kitti.read_next_lidar()
        if pts is None:
            return None
        return pointcloud_from_lidar(pts, capacity=capacity)

    out = open(out_path, "w")
    out.write("1 0 0 0 0 1 0 0 0 0 1 0\n")
    source = read_frame()
    if source is None:
        raise RuntimeError("empty sequence")

    accum = np.eye(4, dtype=np.float64)
    poses = [accum.copy()]
    n_frames = min(len(kitti), start_frame + max_frames)

    def read_target(i):
        kitti.next()
        cloud = read_frame()
        return None if cloud is None else (cloud, None)

    def on_result(i, result, ret, info, aux, t_frontend, t_block):
        nonlocal accum
        accum = accum @ result
        poses.append(accum.copy())
        write_kitti_pose_row(out, accum)
        log(f"frame {i}->{i+1}: iters={int(info.iterations)} ret={int(ret)} "
            f"ell={float(info.final_ell):.3f}")

    n_aligned, total_block = run_pipelined(
        source, range(start_frame, n_frames - 1), read_target, params,
        first_params, on_result, chunk=chunk, max_iter=max_iter, log=log,
    )
    out.close()
    log(f"Average registration time is {total_block / max(n_aligned, 1):.3f}")
    return np.asarray(poses)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    semantic = "--semantic" in argv
    argv = [a for a in argv if a != "--semantic"]
    if len(argv) < 3:
        print(__doc__)
        return 1
    run_sequence(argv[0], argv[1], argv[2],
                 int(argv[3]) if len(argv) > 3 else 0,
                 int(argv[4]) if len(argv) > 4 else 100000,
                 semantic=semantic)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
