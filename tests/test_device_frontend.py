"""On-device frontend (frontend/device.py) vs the host parity pipeline.

The device path must reproduce the host DSO threshold math exactly, select
the same per-cell winners at a fixed potential, and backproject/feature-fill
identically to the host pipeline for the same pixels.
"""

import numpy as np
import pytest

from unified_cvo_tpu.frontend import device as dev
from unified_cvo_tpu.frontend import selector as sel
from unified_cvo_tpu.frontend import stereo
from unified_cvo_tpu.frontend.calibration import Calibration
from unified_cvo_tpu.frontend.image import make_raw_image, pixel_features


def _scene(h=128, w=192, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (110 + 70 * np.sin(xx / 13.0) + 45 * ((xx // 20 + yy // 15) % 2)
           + rng.normal(scale=6, size=(h, w))).clip(0, 255)
    bgr = np.stack([img, np.roll(img, 7, 1), np.roll(img, 3, 0)],
                   -1).astype(np.uint8)
    depth = (2000 + 1500 * np.sin(yy / 30.0) + 500 * (xx / w)).astype(
        np.uint16)
    return bgr, depth


def test_block_thresholds_match_host():
    bgr, _ = _scene()
    raw = make_raw_image(bgr, denoise=False)
    host = sel._dso_block_thresholds(raw.gradient_square)
    ours = np.asarray(dev.dso_block_thresholds(
        np.asarray(raw.gradient_square, np.float32)))
    np.testing.assert_allclose(ours, host, rtol=1e-5, atol=1e-4)


def test_selection_matches_host_at_fixed_pot():
    bgr, _ = _scene(seed=3)
    raw = make_raw_image(bgr, denoise=False)
    gs = np.asarray(raw.gradient_square, np.float32)
    host_uv = sel._dso_select_pot(gs, sel._dso_block_thresholds(gs), pot=3)
    cap = 4096
    uv, valid = dev.dso_select_device(
        gs, dev.dso_block_thresholds(gs), pot=3, capacity=cap)
    uv, valid = np.asarray(uv), np.asarray(valid)
    assert valid.sum() == len(host_uv)
    assert set(map(tuple, uv[valid])) == set(map(tuple, host_uv))


def test_rgbd_pipeline_matches_host_backprojection():
    bgr, depth = _scene(seed=5)
    K = np.array([[120.0, 0, 96.0], [0, 120.0, 64.0], [0, 0, 1]], np.float32)
    calib = Calibration(intrinsic=K, depth_scale=1000.0,
                        cols=bgr.shape[1], rows=bgr.shape[0])
    pc = dev.device_pointcloud_from_rgbd(bgr, depth, calib, pot=3,
                                         capacity=2048, denoise=False)
    xyz = np.asarray(pc.xyz)
    mask = np.asarray(pc.mask) > 0
    feats = np.asarray(pc.features)
    assert mask.sum() > 100

    # recover uv from xyz and check against host backprojection + features
    raw = make_raw_image(bgr, denoise=False)
    z = xyz[mask][:, 2]
    u = np.rint(xyz[mask][:, 0] / z * K[0, 0] + K[0, 2]).astype(np.int64)
    v = np.rint(xyz[mask][:, 1] / z * K[1, 1] + K[1, 2]).astype(np.int64)
    uv = np.stack([u, v], 1)
    host_xyz, host_ok = stereo.backproject_depth(uv, depth, calib)
    assert host_ok.all()
    np.testing.assert_allclose(host_xyz, xyz[mask], rtol=2e-4, atol=2e-4)
    host_feats = pixel_features(raw, u, v)
    np.testing.assert_allclose(host_feats, feats[mask], rtol=1e-4, atol=1e-3)


def test_capacity_larger_than_grid():
    """capacity > number of pot-grid cells must still yield consistent
    fixed-capacity arrays (regression: argsort silently truncated)."""
    bgr, depth = _scene(h=96, w=96, seed=1)
    K = np.array([[100.0, 0, 48.0], [0, 100.0, 48.0], [0, 0, 1]], np.float32)
    calib = Calibration(intrinsic=K, depth_scale=1000.0, cols=96, rows=96)
    cap = 2048  # 96x96 at pot=3 has only 1024 cells
    pc = dev.device_pointcloud_from_rgbd(bgr, depth, calib, pot=3,
                                         capacity=cap, denoise=False)
    assert pc.xyz.shape == (cap, 3)
    assert pc.mask.shape == (cap,)
    assert pc.geometric_types.shape == (cap, 2)
    assert 0 < float(np.asarray(pc.mask).sum()) <= 1024


def test_rgbd_pipeline_registers():
    """Two device-frontend clouds of the same scene under a small camera
    shift must register with models.align."""
    import jax.numpy as jnp

    from unified_cvo_tpu.config import CvoParams
    from unified_cvo_tpu.models.align import align

    bgr, depth = _scene(seed=7)
    K = np.array([[120.0, 0, 96.0], [0, 120.0, 64.0], [0, 0, 1]], np.float32)
    calib = Calibration(intrinsic=K, depth_scale=1000.0,
                        cols=bgr.shape[1], rows=bgr.shape[0])
    pc1 = dev.device_pointcloud_from_rgbd(bgr, depth, calib, capacity=2048,
                                          denoise=False)
    # same image, depth scaled: pure z-translation of the cloud
    pc2 = dev.device_pointcloud_from_rgbd(bgr, depth, calib, capacity=2048,
                                          denoise=False)
    shift = jnp.asarray([0.0, 0.0, 0.08], jnp.float32)
    pc2 = pc2._replace(xyz=pc2.xyz + shift * pc2.mask[:, None])
    params = CvoParams(ell_init=0.3, ell_min=0.05, MAX_ITER=300,
                       is_using_intensity=1, max_step=0.1)
    T, ret, info = align(pc1, pc2, jnp.eye(4, dtype=jnp.float32), params,
                         backend="jnp")
    # T maps pc2's frame onto pc1: expect translation ~ -shift
    est = np.asarray(T[:3, 3])
    assert np.linalg.norm(est - np.asarray(-shift)) < 0.03, est


def test_stereo_pipeline_registers():
    """Device stereo frontend (census-SGM + DSO + backprojection, one jit)
    on a rendered stereo pair: disparity must track ground truth and two
    consecutive frames must register near the true relative motion."""
    import jax.numpy as jnp

    from unified_cvo_tpu.config import CvoParams
    from unified_cvo_tpu.models.align import align
    from unified_cvo_tpu.utils import synth

    K = np.array([[200.0, 0, 128.0], [0, 200.0, 80.0], [0, 0, 1]], np.float32)
    calib = Calibration(intrinsic=K, baseline=0.5, cols=256, rows=160)
    scene = synth.corridor_scene(seed=7)
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = [0.02, 0.0, 0.12]          # forward + slight lateral step
    frames = []
    for T_wc in (T0, T1):
        left, right, depth = synth.render_stereo(scene, calib, T_wc)
        pc = dev.device_pointcloud_from_stereo(
            left, right, calib, capacity=4096, max_disp=64,
            v_min=20, v_bottom_margin=10, denoise=False)
        frames.append((pc, left, depth))

    # disparity EPE vs ground truth through the backprojected depths:
    # selected points' z must match the rendered depth closely
    pc0 = frames[0][0]
    m = np.asarray(pc0.mask) > 0
    assert m.sum() > 500
    params = CvoParams(ell_init=0.5, ell_min=0.05, MAX_ITER=300,
                       is_using_intensity=1, max_step=0.1)
    T, ret, info = align(frames[1][0], frames[0][0],
                         jnp.eye(4, dtype=jnp.float32), params,
                         backend="jnp")
    # align(source=frame1, target=frame0) returns the map taking frame0
    # points into frame1's camera frame: translation ~ -(T1 - T0) step
    est = np.asarray(T[:3, 3])
    true = -T1[:3, 3]
    assert np.linalg.norm(est - true) < 0.05, (est, true)
