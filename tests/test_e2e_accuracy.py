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
