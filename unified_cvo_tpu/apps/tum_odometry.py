"""TUM RGB-D frame-to-frame odometry — the cvo_align_gpu_rgbd twin.

Usage:
    python -m unified_cvo_tpu.apps.tum_odometry SEQ_DIR PARAMS.yaml OUT.txt \
        [START_FRAME] [MAX_FRAMES]

Writes a TUM-format trajectory (timestamp tx ty tz qx qy qz qw) of
accumulated camera poses. Mirrors src/experiments/main_cvo_gpu_align_rgbd_raw_image.cpp.
"""

from __future__ import annotations

import sys

import numpy as np


from unified_cvo_tpu.apps._odometry_common import run_pipelined
from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.datasets.tum import TumHandler, write_tum_pose_row
from unified_cvo_tpu.frontend.pipeline import pointcloud_from_rgbd

CAPACITY = 16384


def run_sequence(
    seq_dir: str,
    param_file: str,
    out_path: str,
    start_frame: int = 0,
    max_frames: int = 100000,
    denoise: bool = True,
    chunk: int = 4096,
    max_iter: int | None = None,
    device_frontend: bool = False,
    log=print,
    capacity: int = CAPACITY,
):
    tum = TumHandler(seq_dir)
    calib = tum.calibration()
    params = read_cvo_params_yaml(param_file)
    first_params = params.first_frame()
    tum.set_start_index(start_frame)

    if device_frontend:
        # whole measurement chain on the accelerator (frontend/device.py):
        # denoise + gradients + DSO grid selection + backprojection in one
        # jit, no host round-trips
        from unified_cvo_tpu.frontend.device import device_pointcloud_from_rgbd

        def build_cloud(rgb, depth):
            return device_pointcloud_from_rgbd(
                rgb, depth, calib, capacity=capacity, denoise=denoise)
    else:
        def build_cloud(rgb, depth):
            return pointcloud_from_rgbd(
                rgb, depth, calib, denoise=denoise, capacity=capacity)

    out = open(out_path, "w")
    pair = tum.read_next_rgbd()
    if pair is None:
        raise RuntimeError("empty sequence")
    source = build_cloud(pair[0], pair[1])
    accum = np.eye(4, dtype=np.float64)
    write_tum_pose_row(out, tum.timestamp(), accum)

    n_frames = min(len(tum), start_frame + max_frames)
    poses = [accum.copy()]
    timestamps = [tum.timestamp()]

    def read_target(i):
        tum.next()
        pair = tum.read_next_rgbd()
        if pair is None:
            return None
        cloud = build_cloud(pair[0], pair[1])
        return cloud, tum.timestamp()

    def on_result(i, result, ret, info, ts, t_frontend, t_block):
        nonlocal accum
        accum = accum @ result
        poses.append(accum.copy())
        timestamps.append(ts)
        write_tum_pose_row(out, ts, accum)
        log(
            f"frame {i}->{i+1}: iters={int(info.iterations)} "
            f"ell={float(info.final_ell):.3f} wait={t_block:.2f}s"
        )

    n_aligned, total_block = run_pipelined(
        source, range(start_frame, n_frames - 1), read_target, params,
        first_params, on_result, chunk=chunk, max_iter=max_iter, log=log,
    )
    out.close()
    log(f"Average registration time is {total_block / max(n_aligned, 1):.3f}")
    return np.asarray(poses), timestamps


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    device_frontend = "--device-frontend" in argv
    argv = [a for a in argv if a != "--device-frontend"]
    if len(argv) < 3:
        print(__doc__)
        return 1
    run_sequence(
        argv[0], argv[1], argv[2],
        int(argv[3]) if len(argv) > 3 else 0,
        int(argv[4]) if len(argv) > 4 else 100000,
        device_frontend=device_frontend,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
