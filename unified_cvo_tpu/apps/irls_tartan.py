"""TartanAir multiframe IRLS BA — the cvo_irls_tartan twin.

Usage:
    python -m unified_cvo_tpu.apps.irls_tartan TRAJ_DIR PARAMS.yaml GRAPH_FILE \
        OUT_PREFIX [--translation-only]

Mirrors src/experiments/main_multi_frame_irls_tartan.cpp (and, with
--translation-only, main_multi_frame_irls_translation_only_tartan.cpp,
which freezes the rotation tangent dims): load the graph file's RGB-D
frames, build voxel-downsampled edge (leaf/5) + surface (leaf) clouds, run
multiframe IRLS, and write `x y z qx qy qz qw` trajectories
<OUT_PREFIX>_before.txt / _after.txt (the TartanAir drivers' row format,
main_cvo_gpu_align_tartan.cpp:55-58).
"""

from __future__ import annotations

import sys

import numpy as np

from unified_cvo_tpu.apps._ba_common import (
    downsample_edge_surface,
    write_xyzq_traj,
)
from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.datasets.graph import read_graph_file
from unified_cvo_tpu.datasets.tartanair import TartanAirHandler
from unified_cvo_tpu.frontend import selector as sel
from unified_cvo_tpu.frontend.pipeline import pointcloud_from_rgbd
from unified_cvo_tpu.models import irls


def build_frame_cloud(rgb, depth, calib, voxel_edge, voxel_surface, bucket=1024):
    pc_edge = pointcloud_from_rgbd(
        rgb, depth, calib, method=sel.DSO_EDGES, denoise=False, bucket=64
    )
    pc_full = pointcloud_from_rgbd(
        rgb, depth, calib, method=sel.FULL, denoise=False, bucket=64
    )
    return downsample_edge_surface(pc_edge, pc_full, voxel_edge, voxel_surface, bucket)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    translation_only = "--translation-only" in argv
    argv = [a for a in argv if a != "--translation-only"]
    if len(argv) < 4:
        print(__doc__)
        return 1
    traj_dir, param_file, graph_file, out_prefix = argv[:4]

    frame_inds, edges, init_poses = read_graph_file(graph_file)
    params = read_cvo_params_yaml(param_file)
    tartan = TartanAirHandler(traj_dir)
    calib = tartan.calibration()

    voxel = params.multiframe_downsample_voxel_size
    clouds = []
    for fid in frame_inds:
        tartan.set_start_index(fid)
        pair = tartan.read_next_rgbd()
        if pair is None:
            raise RuntimeError(f"frame {fid} unreadable")
        clouds.append(
            build_frame_cloud(pair[0], pair[1], calib, voxel / 5.0, voxel)
        )
        print(f"frame {fid}: {int(np.asarray(clouds[-1].num_valid))} points")

    F = len(frame_inds)
    init = (
        init_poses.astype(np.float32)
        if init_poses is not None
        else np.tile(np.eye(3, 4, dtype=np.float32), (F, 1, 1))
    )

    write_xyzq_traj(out_prefix + "_before.txt", init)
    stacked = irls.stack_clouds(clouds)
    poses, hist = irls.irls_solve(
        stacked, init, edges, [True] + [False] * (F - 1), params,
        chunk=min(1024, stacked.xyz.shape[1]), log=print,
        translation_only=translation_only,
    )
    write_xyzq_traj(out_prefix + "_after.txt", poses)
    print(f"wrote {out_prefix}_before.txt / _after.txt ({len(hist)} solve rounds)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
