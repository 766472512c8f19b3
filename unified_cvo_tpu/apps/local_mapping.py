"""Local semantic BKI mapping over an RGB-D sequence — the L6/L7 driver.

Twin of src/experiments/main_local_mapping.cpp (read poses + clouds, fuse
every frame into a SemanticBKIOctoMap, export the occupied map), extended
with the online mode the reference's graph_optimizer layer supports but
never wired into a built main (PoseGraph.cpp / Frame.hpp are commented out
of the reference CMakeLists:160,761): frame-to-frame CVO odometry,
function-angle keyframing, windowed pose-graph smoothing with a marginal
prior, and per-keyframe local maps fused from their tracked frames
(Frame::construct_map / add_points_to_map_from / export_points_from_map).

Usage:
    python -m unified_cvo_tpu.apps.local_mapping SEQ_DIR PARAMS.yaml OUT_PREFIX
        [--trajectory TRAJ.txt]   # offline: fuse along a given trajectory
        [--max-frames N] [--resolution R] [--map-ell L] [--capacity C]

Writes OUT_PREFIX_traj.txt (TUM format) and OUT_PREFIX_map.npz
(centers [V,3], semantics [V], alpha [V,C+1]).
"""

from __future__ import annotations

import argparse

import numpy as np

from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.datasets.tum import TumHandler, write_tum_pose_row
from unified_cvo_tpu.frontend.pipeline import pointcloud_from_rgbd
from unified_cvo_tpu.models.bki import SemanticBKIMap
from unified_cvo_tpu.models.keyframe import Keyframe
from unified_cvo_tpu.models.posegraph import PoseGraph, PoseGraphConfig
from unified_cvo_tpu.utils.pointcloud import to_numpy_valid

CAPACITY = 8192


def _load_trajectory(path: str):
    """TUM (8 cols) or KITTI (12 cols) trajectory -> list of [4, 4] poses
    (shared sniffing lives in utils.trajectory.load_trajectory)."""
    from unified_cvo_tpu.utils.trajectory import load_trajectory

    _, poses = load_trajectory(path)
    return list(poses)


def run_sequence(
    seq_dir: str,
    param_file: str,
    out_prefix: str,
    trajectory: str | None = None,
    max_frames: int = 100000,
    resolution: float = 0.1,
    map_ell: float = 0.3,
    num_classes: int = 19,
    capacity: int = CAPACITY,
    keyframe_function_angle: float = 0.6,
    window_size: int = 8,
    incremental: bool = False,   # window_size=0 + incremental=True = the
    #   iSAM2-analogue full-graph mode (flat per-keyframe cost; see
    #   PoseGraphConfig.incremental)
    denoise: bool = True,
    log=print,
):
    tum = TumHandler(seq_dir)
    calib = tum.calibration()
    params = read_cvo_params_yaml(param_file)

    poses_given = _load_trajectory(trajectory) if trajectory else None

    # one global map (the reference main's SemanticBKIOctoMap) plus, in
    # online mode, per-keyframe local maps via the Frame machinery
    global_map = SemanticBKIMap(resolution=resolution, num_classes=num_classes,
                                ell=map_ell)
    pg = PoseGraph(PoseGraphConfig(
        keyframe_function_angle_threshold=keyframe_function_angle,
        window_size=window_size, incremental=incremental))
    keyframes: list[Keyframe] = []

    if poses_given is None:
        import jax.numpy as jnp

        from unified_cvo_tpu.models.align import align, function_angle
        from unified_cvo_tpu.ops import lie

    traj_rows = []
    prev_cloud = None
    prev_rel = np.eye(4)
    kf_T = np.eye(4)           # accumulated last-keyframe -> current frame
    world_T = np.eye(4)
    k = 0
    while k < max_frames:
        pair = tum.read_next_rgbd()
        if pair is None:
            break
        rgb, depth = pair
        ts = tum.timestamp()
        tum.next()
        cloud = pointcloud_from_rgbd(rgb, depth, calib, capacity=capacity,
                                     denoise=denoise)

        if poses_given is not None:
            if k >= len(poses_given):
                break
            world_T = poses_given[k]
            data = to_numpy_valid(cloud)
            xyz_w = data["xyz"] @ world_T[:3, :3].T + world_T[:3, 3]
            global_map.insert_pointcloud(xyz_w, data.get("labels"),
                                         origin=world_T[:3, 3])
        else:
            if prev_cloud is None:
                pg.add_first_frame(k)
                kf = Keyframe(k, cloud, pose=world_T.copy())
                kf.construct_map(resolution=resolution,
                                 num_classes=num_classes, ell=map_ell)
                keyframes.append(kf)
            else:
                ig = np.linalg.inv(prev_rel)
                T_rel, ret, info = align(
                    prev_cloud, cloud, jnp.asarray(ig, jnp.float32), params)
                T_rel = np.asarray(T_rel, np.float64)
                # align returns the map taking target-frame points into the
                # source frame == the new camera's pose in the previous
                # camera frame; poses accumulate by RIGHT-multiplication
                # (reference accum_mat *= result,
                # main_cvo_gpu_align_raw_image.cpp:126; same convention as
                # apps/kitti_odometry.py and apps/tum_odometry.py)
                rel = T_rel
                prev_rel = rel
                kf_T = kf_T @ rel
                world_T = world_T @ rel
                fa = float(function_angle(
                    prev_cloud, cloud, jnp.asarray(T_rel, jnp.float32),
                    jnp.float32(max(params.ell_init * 0.5, params.ell_min)),
                    params))
                is_kf = pg.add_frame(k, kf_T, function_angle=fa)
                if is_kf:
                    kf_T = np.eye(4)
                    kf = Keyframe(k, cloud, pose=world_T.copy())
                    kf.construct_map(resolution=resolution,
                                     num_classes=num_classes, ell=map_ell)
                    keyframes.append(kf)
                    # refresh keyframe poses from the smoothed graph
                    for kf_i, s in zip(keyframes, range(pg.num_keyframes)):
                        kf_i.pose = pg.keyframe_poses[s].copy()
                    world_T = keyframes[-1].pose.copy()
                else:
                    # fuse the tracked frame into the current keyframe's
                    # local map (Frame::add_points_to_map_from)
                    keyframes[-1].add_points_from(
                        Keyframe(k, cloud, pose=world_T.copy()))
            prev_cloud = cloud

        traj_rows.append((ts, world_T.copy()))
        if k % 10 == 0:
            nvox = (len(global_map) if poses_given is not None
                    else sum(len(kf.local_map) for kf in keyframes
                             if kf.local_map is not None))
            log(f"frame {k}: map voxels={nvox} keyframes={len(keyframes)}")
        k += 1

    with open(f"{out_prefix}_traj.txt", "w") as f:
        for ts, T in traj_rows:
            write_tum_pose_row(f, ts, T)

    if poses_given is None:
        # merge the keyframe-local maps into the export (world frame)
        centers_all, sems_all, alpha_all = [], [], []
        for kf in keyframes:
            if kf.local_map is None or len(kf.local_map) == 0:
                continue
            c, s, a = kf.local_map.export_occupied()
            if len(c) == 0:
                continue
            cw = c @ kf.pose[:3, :3].T + kf.pose[:3, 3]
            centers_all.append(cw)
            sems_all.append(s)
            alpha_all.append(a)
        centers = (np.concatenate(centers_all) if centers_all
                   else np.zeros((0, 3)))
        sems = (np.concatenate(sems_all) if sems_all
                else np.zeros((0,), np.int32))
        alpha = (np.concatenate(alpha_all) if alpha_all
                 else np.zeros((0, num_classes + 1)))
    else:
        centers, sems, alpha = global_map.export_occupied()

    np.savez(f"{out_prefix}_map.npz", centers=centers, semantics=sems,
             alpha=alpha)
    log(f"done: {k} frames, {len(keyframes)} keyframes, "
        f"{len(centers)} occupied voxels -> {out_prefix}_map.npz")
    return k, len(keyframes), len(centers)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("seq_dir")
    ap.add_argument("param_file")
    ap.add_argument("out_prefix")
    ap.add_argument("--trajectory", default=None)
    ap.add_argument("--max-frames", type=int, default=100000)
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--map-ell", type=float, default=0.3)
    ap.add_argument("--capacity", type=int, default=CAPACITY)
    ap.add_argument("--no-denoise", action="store_true")
    args = ap.parse_args(argv)
    run_sequence(args.seq_dir, args.param_file, args.out_prefix,
                 trajectory=args.trajectory, max_frames=args.max_frames,
                 resolution=args.resolution, map_ell=args.map_ell,
                 capacity=args.capacity, denoise=not args.no_denoise)


if __name__ == "__main__":
    main()
