"""End-to-end accuracy: full front-end -> registration -> evaluation chain
on ray-cast synthetic scenes with known trajectories (utils/synth.py).

This is the hermetic twin of the reference's offline KITTI-devkit /
evaluate_ate_scale.py evaluation (SURVEY.md §4, §6): the odometry and BA
drivers run UNMODIFIED on rendered stereo / RGB-D sequences written in the
exact on-disk layouts, and their trajectories are scored with the devkit
twins in utils/metrics. If any stage (disparity, selection, backprojection,
alignment, accumulation, evaluation) silently degrades, these bounds fail.

Measured errors (2026-08, CPU backend; bounds are ~3x the measurement):

| pipeline                          | metric                | measured | bound |
|-----------------------------------|-----------------------|----------|-------|
| KITTI stereo odometry (intensity) | ATE RMSE [m]          | 0.015    | 0.05  |
| KITTI stereo odometry (intensity) | RPE RMSE [m/frame]    | 0.025    | 0.06  |
| KITTI stereo odometry (intensity) | devkit trans err [%]  | see test | 5.0   |
| TUM RGB-D odometry (rgbd preset)  | ATE RMSE [m]          | 0.006    | 0.025 |
| KITTI lidar odometry (ray-cast velodyne) | ATE / RPE [m]  | 0.022/0.062 | 0.08/0.12 |
| TartanAir RGB-D odometry          | ATE RMSE [m]          | 0.002    | 0.05  |
| Lyft lidar odometry               | ATE RMSE [m]          | 0.036    | 0.1   |
| Online SLAM loop closure (72-frame loop) | ATE [m]        | 0.016    | 0.05  |
| IRLS BA over 5 TUM frames         | ATE after/before      | 0.26     | 0.6   |
| SGBM disparity vs rendered GT     | mean EPE [px]         | 0.21     | 0.5   |
"""

import os

import numpy as np
import pytest

from unified_cvo_tpu.utils import synth
from unified_cvo_tpu.utils.metrics import ate_rmse, kitti_seq_error, rpe_rmse

REF_PARAMS = "/root/reference/cvo_params"


# ----------------------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def kitti_seq(tmp_path_factory):
    """9 rendered stereo frames along a yaw-curved corridor trajectory."""
    d = str(tmp_path_factory.mktemp("synth_kitti"))
    calib = synth.kitti_calibration()
    scene = synth.corridor_scene(3)
    traj = synth.corridor_trajectory(9)
    depths = []
    synth.write_kitti_sequence(d, scene, traj, calib, depths_out=depths)
    return d, calib, traj, depths


@pytest.fixture(scope="module")
def tum_seq(tmp_path_factory):
    """9 rendered RGB-D frames in a narrower indoor-scale corridor."""
    d = str(tmp_path_factory.mktemp("synth_tum"))
    calib = synth.tum_calibration()
    scene = synth.corridor_scene(5, half_width=2.5, floor_y=1.2,
                                 ceil_y=-1.2, length=30.0)
    traj = synth.corridor_trajectory(9, step=0.08, yaw_rate=0.015, bob=0.005)
    synth.write_tum_sequence(d, scene, traj, calib)
    return d, calib, traj


# ------------------------------------------------------------ stereo depth


def test_sgbm_disparity_epe_vs_ground_truth(kitti_seq):
    """Stereo front-end depth quality, measured (VERDICT task 6): SGBM
    disparity against the renderer's exact disparity."""
    from unified_cvo_tpu.frontend.stereo import compute_disparity

    d, calib, traj, depths = kitti_seq
    import cv2

    left = cv2.imread(os.path.join(d, "image_2", "000001.png"))
    right = cv2.imread(os.path.join(d, "image_3", "000001.png"))
    disp = compute_disparity(left, right)
    gt = synth.gt_disparity(depths[1], calib)
    valid = (disp > 0) & (gt > 0)
    assert valid.mean() > 0.5, "SGBM validity collapsed"
    epe = np.abs(disp - gt)[valid]
    assert epe.mean() < 0.5, f"mean EPE {epe.mean():.3f} px"
    assert (epe > 3.0).mean() < 0.01, f"gross outliers {(epe > 3).mean():.4f}"


def test_native_sgm_disparity_epe_vs_ground_truth(kitti_seq, native_built):
    """The from-scratch census/SGM in native/ (the libelas replacement)
    measured against exact ground truth (VERDICT task 6): with its median +
    speckle post-filters it matches cv2 SGBM quality (mean EPE ~0.25 px vs
    ~0.21, better median, 90% vs 75% validity) and its downstream E2E ATE
    (0.0139 m) is equivalent to SGBM's (0.015 m) — depth parity settled;
    see BASELINE.md."""
    from unified_cvo_tpu.frontend.stereo import compute_disparity

    d, calib, traj, depths = kitti_seq
    import cv2

    left = cv2.imread(os.path.join(d, "image_2", "000001.png"))
    right = cv2.imread(os.path.join(d, "image_3", "000001.png"))
    disp = compute_disparity(left, right, backend="native")
    gt = synth.gt_disparity(depths[1], calib)
    valid = (disp > 0) & (gt > 0)
    assert valid.mean() > 0.6, "native SGM validity collapsed"
    epe = np.abs(disp - gt)[valid]
    assert epe.mean() < 0.6, f"mean EPE {epe.mean():.3f} px"
    assert np.median(epe) < 0.3, f"median EPE {np.median(epe):.3f} px"
    assert (epe > 3.0).mean() < 0.01, f"gross outliers {(epe > 3).mean():.4f}"


# -------------------------------------------------------------- KITTI e2e


def test_kitti_stereo_odometry_e2e(kitti_seq, tmp_path):
    from unified_cvo_tpu.apps.kitti_odometry import run_sequence
    from unified_cvo_tpu.datasets.kitti import read_kitti_poses

    d, calib, traj, _ = kitti_seq
    out = str(tmp_path / "traj.txt")
    run_sequence(
        d, os.path.join(REF_PARAMS, "cvo_intensity_params_img_gpu0.yaml"),
        out, denoise=False, capacity=4096, chunk=2048, max_iter=200,
        log=lambda *a: None,
    )
    est = read_kitti_poses(out)
    assert est.shape[0] == len(traj)
    ate = ate_rmse(traj, est)
    rpe = rpe_rmse(traj, est)
    # devkit metric over short segments (same code path as {100..800} m)
    t_err, r_err = kitti_seq_error(traj, est, step=1, lengths=(1.0, 2.0))
    assert ate < 0.05, f"ATE {ate:.4f} m"
    assert rpe < 0.06, f"RPE {rpe:.4f} m/frame"
    assert t_err < 0.05, f"devkit translational error {100 * t_err:.2f} %"
    assert r_err < 0.02, f"devkit rotational error {r_err:.4f} rad/m"
    # scale sanity: estimated path length within 10% of ground truth
    lg = np.linalg.norm(np.diff(traj[:, :3, 3], axis=0), axis=1).sum()
    le = np.linalg.norm(np.diff(est[:, :3, 3], axis=0), axis=1).sum()
    assert abs(le - lg) / lg < 0.1, (le, lg)


# ---------------------------------------------------------------- TUM e2e


def test_tum_rgbd_odometry_e2e(tum_seq, tmp_path):
    from unified_cvo_tpu.apps.tum_odometry import run_sequence

    d, calib, traj = tum_seq
    out = str(tmp_path / "traj.txt")
    poses, stamps = run_sequence(
        d, os.path.join(REF_PARAMS, "cvo_rgbd_params.yaml"), out,
        denoise=False, chunk=2048, max_iter=200, capacity=4096,
        log=lambda *a: None,
    )
    assert len(poses) == len(traj)
    ate = ate_rmse(traj, poses)
    assert ate < 0.025, f"ATE {ate:.4f} m"
    # the written trajectory round-trips through quaternions losslessly
    from unified_cvo_tpu.datasets.tum import read_tum_trajectory

    _, reread = read_tum_trajectory(out)
    np.testing.assert_allclose(reread[:, :3, 3], poses[:, :3, 3], atol=1e-5)


# -------------------------------------------------------------- lidar e2e


def test_kitti_lidar_odometry_e2e(tmp_path):
    """Full lidar chain (ray-cast velodyne scans -> KittiHandler ->
    LOAM-lite selection -> intensity-lidar alignment -> KITTI rows) with
    an accuracy bound — the lidar twin of the stereo e2e above."""
    from unified_cvo_tpu.apps.kitti_lidar_odometry import run_sequence
    from unified_cvo_tpu.datasets.kitti import read_kitti_poses

    d = str(tmp_path / "lidar_seq")
    scene = synth.room_scene(11, half=8.0, floor_y=1.8, ceil_y=-3.0,
                             n_pillars=4)
    traj = synth.corridor_trajectory(7, step=0.15, yaw_rate=0.02, bob=0.0)
    synth.write_kitti_lidar_sequence(d, scene, traj, n_beams=32, n_az=720,
                                     noise=0.005)
    yaml = tmp_path / "lidar.yaml"
    yaml.write_text(
        "ell_init: 0.5\nell_init_first_frame: 0.8\nell_min: 0.05\n"
        "ell_max: 1.2\nis_using_intensity: 1\n")
    out = str(tmp_path / "traj.txt")
    poses = run_sequence(d, str(yaml), out, capacity=8192, chunk=2048,
                         max_iter=300, log=lambda *a: None)
    assert poses.shape[0] == len(traj)
    est = read_kitti_poses(out)
    ate = ate_rmse(traj, est)
    rpe = rpe_rmse(traj, est)
    # measured 2026-08: ATE 0.022 m, RPE 0.062 m/frame (bounds ~2-3x)
    assert ate < 0.08, f"lidar ATE {ate:.4f} m"
    assert rpe < 0.12, f"lidar RPE {rpe:.4f} m/frame"


# ---------------------------------------------------- TartanAir / Lyft e2e


def test_tartan_rgbd_odometry_e2e(tmp_path):
    """TartanAir RGB-D chain at accuracy grade: rendered image_left/*.png +
    depth npys through the UNMODIFIED tartan_odometry driver."""
    from unified_cvo_tpu.apps.tartan_odometry import run_sequence

    d = str(tmp_path / "tartan_seq")
    scene = synth.corridor_scene(9, half_width=3.0, floor_y=1.4,
                                 ceil_y=-1.6, length=30.0)
    traj = synth.corridor_trajectory(7, step=0.1, yaw_rate=0.015, bob=0.004)
    synth.write_tartan_sequence(d, scene, traj)
    out = str(tmp_path / "traj.txt")
    run_sequence(d, os.path.join(REF_PARAMS, "cvo_rgbd_params.yaml"), out,
                 capacity=4096, chunk=2048, max_iter=250,
                 log=lambda *a: None)
    # tartan trajectories are 7-column (x y z qx qy qz qw, no timestamp)
    from scipy.spatial.transform import Rotation

    rows = np.atleast_2d(np.loadtxt(out))
    est = np.tile(np.eye(4), (len(rows), 1, 1))
    est[:, :3, 3] = rows[:, :3]
    est[:, :3, :3] = Rotation.from_quat(rows[:, 3:7]).as_matrix()
    assert len(est) == len(traj)
    ate = ate_rmse(traj, est)
    # measured 2026-08: see below (bounds ~3x)
    assert ate < 0.05, f"TartanAir ATE {ate:.4f} m"


def test_lyft_lidar_odometry_e2e(tmp_path):
    """Lyft lidar chain at accuracy grade: rendered 5-float sweeps through
    the UNMODIFIED lyft_lidar_odometry driver."""
    from unified_cvo_tpu.apps.lyft_lidar_odometry import run_sequence
    from unified_cvo_tpu.datasets.kitti import read_kitti_poses

    d = str(tmp_path / "lyft_seq")
    scene = synth.room_scene(13, half=9.0, floor_y=1.8, ceil_y=-3.0,
                             n_pillars=4)
    traj = synth.corridor_trajectory(6, step=0.2, yaw_rate=0.02, bob=0.0)
    synth.write_lyft_lidar_sequence(d, scene, traj, n_beams=40, n_az=720,
                                    noise=0.005)
    yaml = tmp_path / "lyft.yaml"
    yaml.write_text(
        "ell_init: 0.5\nell_init_first_frame: 0.8\nell_min: 0.05\n"
        "ell_max: 1.2\nis_using_intensity: 1\n")
    out = str(tmp_path / "traj.txt")
    run_sequence(d, str(yaml), out, capacity=8192, chunk=2048, max_iter=300,
                 log=lambda *a: None)
    est = read_kitti_poses(out)
    assert est.shape[0] == len(traj)
    ate = ate_rmse(traj, est)
    assert ate < 0.1, f"Lyft lidar ATE {ate:.4f} m"


# ---------------------------------------------------------------- IRLS BA


IRLS_YAML = """ell_init: 0.1
ell_min: 0.05
sigma: 0.1
sp_thres: 0.003
c: 7.0
d: 7.0
c_ell: 0.025
c_sigma: 1.0
is_using_intensity: 1
is_using_geometric_type: 1
multiframe_max_iters: 60
multiframe_ell_init: 0.4
multiframe_ell_min: 0.1
multiframe_ell_decay_rate: 0.85
multiframe_iterations_per_ell: 10
multiframe_downsample_voxel_size: 0.25
multiframe_iterations_per_solve: 20
multiframe_min_nonzeros: 100
"""


def _perturbed(gt, rng, t_sigma=0.03, r_sigma=0.015):
    init = gt.copy()
    for k in range(1, len(init)):
        init[k, :3, 3] += rng.normal(0, t_sigma, 3)
        w = rng.normal(0, r_sigma, 3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        dR = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * (K @ K)
        init[k, :3, :3] = init[k, :3, :3] @ dR
    return init


def test_online_slam_loop_closure_e2e(tmp_path):
    """VERDICT r3 task 7: the FULL online SLAM pipeline (odometry ->
    function-angle keyframing -> pose graph -> loop closure -> BKI map) on
    a 48-frame loop through a pillar-occluded room with sensor depth
    noise. Asserts the loop closure improves on raw odometry and the map
    is geometrically consistent (surface occupied, open space not)."""
    import jax.numpy as jnp

    from unified_cvo_tpu.datasets.tum import TumHandler
    from unified_cvo_tpu.frontend.pipeline import pointcloud_from_rgbd
    from unified_cvo_tpu.models.align import align, function_angle
    from unified_cvo_tpu.models.bki import SemanticBKIMap
    from unified_cvo_tpu.models.posegraph import (PoseGraph, PoseGraphConfig,
                                                  RelativePose)
    from unified_cvo_tpu.config import read_cvo_params_yaml
    from unified_cvo_tpu.utils.pointcloud import to_numpy_valid

    d = str(tmp_path / "loop_seq")
    calib = synth.tum_calibration()
    scene = synth.room_scene(7, half=6.0, n_pillars=3)
    traj = synth.loop_trajectory(72, radius=2.5)
    synth.write_tum_sequence(d, scene, traj, calib, depth_noise=0.005)

    params = read_cvo_params_yaml(
        os.path.join(REF_PARAMS, "cvo_rgbd_params.yaml"))
    tum = TumHandler(d)
    clouds = []
    while True:
        pair = tum.read_next_rgbd()
        if pair is None:
            break
        rgb, depth = pair
        tum.next()
        clouds.append(pointcloud_from_rgbd(rgb, depth, calib, capacity=4096))

    assert len(clouds) == len(traj)
    # robust Huber reweighting: real odometry error is heavy-tailed (a few
    # bad edges carry most of the drift); pure least squares would bend
    # the whole loop to absorb the closure discrepancy
    pg = PoseGraph(PoseGraphConfig(window_size=0, optimize_iters=8,
                                   robust_delta=0.05))
    pg.add_first_frame(0)
    kf_clouds = [clouds[0]]
    kf_frames = [0]
    odo_poses = [np.eye(4)]
    world_T = np.eye(4)
    kf_T = np.eye(4)
    prev_rel = np.eye(4)
    fa_track = []
    # the reference's first-frame parameter swap (ell_init_first_frame,
    # main_cvo_gpu_align_raw_image.cpp:40-46): the first pair has no
    # constant-velocity prior, so it aligns with a coarse lengthscale
    first = params.replace(ell_init=0.5, ell_max=1.0)
    for k in range(1, len(clouds)):
        ig = np.linalg.inv(prev_rel)
        T_rel, ret, info = align(clouds[k - 1], clouds[k],
                                 jnp.asarray(ig, jnp.float32),
                                 first if k == 1 else params,
                                 max_iter=300, chunk=2048)
        rel = np.asarray(T_rel, np.float64)
        prev_rel = rel
        kf_T = kf_T @ rel
        world_T = world_T @ rel
        odo_poses.append(world_T.copy())
        # exact normalization: cos(theta) in [0,1] regardless of sigma
        # scale (the approximate sqrt(N*M) mode is only a relative signal)
        fa = float(function_angle(
            clouds[k - 1], clouds[k], jnp.asarray(T_rel, jnp.float32),
            jnp.float32(max(params.ell_init * 0.5, params.ell_min)), params,
            approximate=False))
        fa_track.append(fa)
        if pg.add_frame(k, kf_T, function_angle=fa):
            kf_T = np.eye(4)
            kf_clouds.append(clouds[k])
            kf_frames.append(k)
            world_T = pg.keyframe_poses[-1].copy()
    assert len(kf_frames) >= 5, f"keyframing collapsed: {len(kf_frames)}"

    gt_kf = traj[kf_frames]
    # anchor both estimates at the first keyframe (gauge)
    ate_odo = ate_rmse(gt_kf, np.stack([odo_poses[k] for k in kf_frames]))

    # loop closure: re-register the LAST keyframe against the FIRST from an
    # identity prior with a coarse first-frame-style lengthscale (the
    # drifted odometry estimate is exactly what a loop closure must NOT
    # trust — a closure hypothesis asserts the frames are nearby), then
    # gate on exact-normalized function_angle co-visibility as
    # PoseGraph::decide_new_keyframe would
    coarse = params.replace(ell_init=0.5, ell_max=1.0)
    T_lc, ret_lc, _ = align(
        kf_clouds[0], kf_clouds[-1], jnp.asarray(np.eye(4), jnp.float32),
        coarse, max_iter=500, chunk=2048)
    fa_lc = float(function_angle(
        kf_clouds[0], kf_clouds[-1], jnp.asarray(T_lc),
        jnp.float32(max(params.ell_init * 0.5, params.ell_min)), params,
        approximate=False))
    # co-visibility gate RELATIVE to this workload's own tracking signal:
    # absolute function_angle scales are channel/params-dependent (the
    # color kernel suppresses all cross-frame products uniformly), so the
    # closure must score within an order of magnitude of a healthy
    # consecutive-frame registration
    fa_ref = float(np.median(fa_track))
    assert fa_lc > 0.1 * fa_ref, (
        f"loop-closure co-visibility too low: {fa_lc} vs tracking {fa_ref}")
    rel_lc = np.asarray(T_lc, np.float64)   # ref_T_curr directly
    pg.factors.append(RelativePose(
        curr_id=len(pg.keyframe_poses) - 1, ref_id=0, transform=rel_lc,
        inner_product=fa_lc))
    pg.optimize()
    ate_opt = ate_rmse(gt_kf, np.stack(pg.keyframe_poses))
    # the closed loop must improve on raw odometry and be tight
    assert ate_opt < ate_odo, (ate_odo, ate_opt)
    assert ate_opt < 0.05, f"loop-closed ATE {ate_opt:.4f} m"

    # map quality: fuse keyframe clouds at OPTIMIZED poses; the rendered
    # surfaces must come back occupied and the loop interior must not
    m = SemanticBKIMap(resolution=0.1, num_classes=4, ell=0.2,
                       free_resolution=100.0)
    # align the estimated keyframe frame to GT for querying: both are
    # anchored at keyframe 0 (identity)
    for kf_c, T in zip(kf_clouds, pg.keyframe_poses):
        data = to_numpy_valid(kf_c)
        xyz_w = data["xyz"] @ T[:3, :3].T + T[:3, 3]
        m.insert_pointcloud(xyz_w, None, origin=T[:3, 3])
    # the map lives in the keyframe-0-anchored frame (pose graph gauge);
    # express the queries there: keyframe 0's own points are simply its
    # camera-frame coordinates, and world points map via inv(traj[0])
    data0 = to_numpy_valid(kf_clouds[0])
    surf = data0["xyz"][::7]
    states, _ = m.query(surf)
    occ_frac = float((states == 1).mean())
    assert occ_frac > 0.5, f"surface occupancy {occ_frac:.2f}"
    # open space at the loop center (camera orbit interior, between
    # pillars): never observed as a surface
    T0_inv = np.linalg.inv(traj[0])
    ctr_world = np.array([[0.0, -0.3, 0.0], [0.3, 0.0, 0.3],
                          [-0.3, 0.1, -0.3]])
    free_pts = ctr_world @ T0_inv[:3, :3].T + T0_inv[:3, 3]
    states_f, _ = m.query(free_pts)
    assert (states_f != 1).all(), f"phantom surface in open space {states_f}"


def test_irls_tum_ba_improves_ate(tum_seq, tmp_path):
    """The cvo_irls_tum.bash contract: ATE after BA must improve on ATE
    before BA (reference scripts/cvo_irls_tum.bash evaluation block)."""
    from unified_cvo_tpu.apps.irls_tum import main
    from unified_cvo_tpu.datasets.graph import write_graph_file
    from unified_cvo_tpu.datasets.tum import read_tum_trajectory

    d, calib, traj = tum_seq
    yaml = str(tmp_path / "irls.yaml")
    with open(yaml, "w") as f:
        f.write(IRLS_YAML)
    frame_inds = [0, 2, 4, 6, 8]
    gt = traj[frame_inds]
    init = _perturbed(gt, np.random.default_rng(1))
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (1, 3), (2, 4)]
    graph = str(tmp_path / "graph.txt")
    write_graph_file(graph, frame_inds, edges, init)
    prefix = str(tmp_path / "ba")
    rc = main([d, graph, yaml, prefix])
    assert rc == 0
    _, before = read_tum_trajectory(prefix + "_before.txt")
    _, after = read_tum_trajectory(prefix + "_after.txt")
    ate_before = ate_rmse(gt, before)
    ate_after = ate_rmse(gt, after)
    assert ate_after < 0.6 * ate_before, (ate_before, ate_after)
    assert ate_after < 0.008, f"ATE after BA {ate_after:.4f} m"
