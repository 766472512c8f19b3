"""Lyft L5 lidar frame-to-frame odometry — the cvo_align_gpu_lidar_lyft twin.

Usage:
    python -m unified_cvo_tpu.apps.lyft_lidar_odometry DATA_DIR PARAMS.yaml \
        OUT.txt [START_FRAME] [MAX_FRAMES]

Mirrors src/experiments/main_cvo_gpu_lidar_lyft.cpp:20-144: per frame, build
an intensity-feature lidar cloud, align frame-to-frame, accumulate KITTI
rows starting with the identity row. The reference hardcodes a wide
lengthscale for the sparse Lyft sweeps (ell_init=1.0, ell_max=2.2,
main:41-45); the same override is applied here.
"""

from __future__ import annotations

import sys

import numpy as np


from unified_cvo_tpu.apps._odometry_common import run_pipelined
from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.datasets.kitti import write_kitti_pose_row
from unified_cvo_tpu.datasets.lyft import LyftHandler
from unified_cvo_tpu.frontend.lidar import pointcloud_from_lidar

CAPACITY = 16384


def run_sequence(data_dir, param_file, out_path, start_frame=0, max_frames=100000,
                 chunk=4096, max_iter=None, capacity=CAPACITY, log=print):
    lyft = LyftHandler(data_dir)
    params = read_cvo_params_yaml(param_file).replace(ell_init=1.0, ell_max=2.2)
    lyft.set_start_index(start_frame)

    out = open(out_path, "w")
    out.write("1 0 0 0 0 1 0 0 0 0 1 0\n")
    pts = lyft.read_next_lidar()
    if pts is None:
        raise RuntimeError("empty sequence")
    source = pointcloud_from_lidar(pts, capacity=capacity)

    accum = np.eye(4, dtype=np.float64)
    poses = [accum.copy()]
    n_frames = min(len(lyft), start_frame + max_frames)

    def read_target(i):
        lyft.next()
        pts = lyft.read_next_lidar()
        if pts is None:
            return None
        return pointcloud_from_lidar(pts, capacity=capacity), None

    def on_result(i, result, ret, info, aux, t_frontend, t_block):
        nonlocal accum
        accum = accum @ result
        poses.append(accum.copy())
        write_kitti_pose_row(out, accum)
        log(f"frame {i}->{i+1}: iters={int(info.iterations)} ret={int(ret)} "
            f"ell={float(info.final_ell):.3f}")

    n_aligned, total_block = run_pipelined(
        source, range(start_frame, n_frames - 1), read_target, params,
        params, on_result, chunk=chunk, max_iter=max_iter, log=log,
    )
    out.close()
    log(f"Average registration time is {total_block / max(n_aligned, 1):.3f}")
    return np.asarray(poses)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 3:
        print(__doc__)
        return 1
    data_dir, param_file, out_path = argv[:3]
    start = int(argv[3]) if len(argv) > 3 else 0
    max_frames = int(argv[4]) if len(argv) > 4 else 100000
    run_sequence(data_dir, param_file, out_path, start, max_frames)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
