"""Front-end tests: calibration, gradients, selection, stereo, pipeline."""

import numpy as np
import pytest

from unified_cvo_tpu.frontend.calibration import read_calibration
from unified_cvo_tpu.frontend.image import make_raw_image, pixel_features
from unified_cvo_tpu.frontend import selector as sel
from unified_cvo_tpu.frontend.stereo import (
    backproject_depth,
    backproject_disparity,
    compute_disparity,
    is_good_point,
)
from unified_cvo_tpu.frontend.pipeline import pointcloud_from_rgbd, pointcloud_from_stereo
from unified_cvo_tpu.utils.pointcloud import to_numpy_valid
from unified_cvo_tpu.utils.voxel import voxel_downsample_indices


def _calib_file(tmp_path, text):
    p = tmp_path / "cvo_calib.txt"
    p.write_text(text)
    return str(p)


def test_calibration_stereo(tmp_path):
    c = read_calibration(
        _calib_file(tmp_path, "718.856 718.856 607.1928 185.2157 0.54 1241 376"),
        "stereo",
    )
    assert c.fx == pytest.approx(718.856)
    assert c.baseline == pytest.approx(0.54)
    assert (c.cols, c.rows) == (1241, 376)


def test_calibration_rgbd(tmp_path):
    c = read_calibration(
        _calib_file(tmp_path, "517.3 516.5 318.6 255.3 5000.0 640 480"), "rgbd"
    )
    assert c.depth_scale == pytest.approx(5000.0)


def _textured_scene(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 8, w // 8), np.uint8)
    img = np.kron(base, np.ones((8, 8), np.uint8))
    return np.stack([img] * 3, axis=-1)


def test_gradients_central_difference():
    img = np.zeros((50, 60), np.uint8)
    img[:, 30:] = 200
    raw = make_raw_image(img, denoise=False)
    # dx at the step edge: 0.5*(200-0) = 100
    assert raw.gradient[25, 29, 0] == pytest.approx(100.0)
    assert raw.gradient[25, 30, 0] == pytest.approx(100.0)
    assert raw.gradient[25, 10, 0] == 0
    assert np.all(raw.gradient[:, 0] == 0) and np.all(raw.gradient[:, -1] == 0)


def test_pixel_features_layout():
    img = _textured_scene()
    raw = make_raw_image(img, denoise=False)
    f = pixel_features(raw, np.array([10, 20]), np.array([15, 25]))
    assert f.shape == (2, 5)
    assert np.all(f[:, :3] >= 0) and np.all(f[:, :3] <= 1)


@pytest.mark.parametrize("method", [sel.CV_FAST, sel.CANNY_EDGES, sel.DSO_EDGES, sel.FULL])
def test_selector_methods(method):
    raw = make_raw_image(_textured_scene(), denoise=False)
    uv, gtype = sel.select_points(raw, "stereo", method)
    assert uv.shape[0] == gtype.shape[0] > 50
    assert uv[:, 0].max() < raw.cols and uv[:, 1].max() < raw.rows
    assert np.allclose(gtype.sum(1), 1.0)


def test_stereo_disparity_constant_shift():
    """Right image = left shifted by 8 px -> SGM should recover ~8."""
    left = _textured_scene(h=120, w=256, seed=3)
    shift = 8
    right = np.roll(left, -shift, axis=1)
    disp = compute_disparity(left, right, max_disparity=32)
    core = disp[20:-20, 48 : -16]
    valid = core[core > 0]
    assert len(valid) > core.size * 0.5
    assert abs(np.median(valid) - shift) < 1.0, np.median(valid)


def test_backproject_disparity_geometry(tmp_path):
    calib = read_calibration(
        _calib_file(tmp_path, "100.0 100.0 160.0 120.0 0.5 320 240"), "stereo"
    )
    disp = np.full((240, 320), 10.0, np.float32)
    uv = np.array([[160, 120], [200, 120]], np.int32)
    xyz, valid = backproject_disparity(uv, disp, calib)
    assert valid.all()
    # depth = b*fx/d = 0.5*100/10 = 5; principal point -> (0, 0, 5)
    np.testing.assert_allclose(xyz[0], [0, 0, 5], atol=1e-5)
    np.testing.assert_allclose(xyz[1], [(200 - 160) / 100 * 5, 0, 5], atol=1e-5)


def test_is_good_point_filters():
    xyz = np.array([[0, 0, 10], [0, 0, 60], [0, 0, 10]], np.float32)
    uv = np.array([[50, 150], [50, 150], [50, 50]], np.int32)
    ok = is_good_point(xyz, uv, h=376, w=1241)
    assert list(ok) == [True, False, False]  # far point and sky row rejected


def test_backproject_depth(tmp_path):
    calib = read_calibration(
        _calib_file(tmp_path, "100.0 100.0 160.0 120.0 5000.0 320 240"), "rgbd"
    )
    depth = np.full((240, 320), 10000, np.uint16)  # 2 m
    uv = np.array([[160, 120]], np.int32)
    xyz, valid = backproject_depth(uv, depth, calib)
    assert valid.all()
    np.testing.assert_allclose(xyz[0], [0, 0, 2.0], atol=1e-6)


def test_stereo_pipeline_end_to_end(tmp_path):
    calib = read_calibration(
        _calib_file(tmp_path, "100.0 100.0 128.0 110.0 0.5 256 220"), "stereo"
    )
    left = _textured_scene(h=220, w=256, seed=5)
    right = np.roll(left, -8, axis=1)
    pc = pointcloud_from_stereo(left, right, calib, denoise=False, bucket=256)
    data = to_numpy_valid(pc)
    assert len(data["xyz"]) > 100
    # all selected points pass the v>=100 sky filter and depth = 0.5*100/8
    z = data["xyz"][:, 2]
    assert np.median(np.abs(z - 6.25)) < 1.0
    assert data["features"].shape[1] == 5


def test_rgbd_pipeline_end_to_end(tmp_path):
    calib = read_calibration(
        _calib_file(tmp_path, "100.0 100.0 160.0 120.0 5000.0 320 240"), "rgbd"
    )
    rgb = _textured_scene(h=240, w=320, seed=6)
    depth = np.full((240, 320), 15000, np.uint16)
    pc = pointcloud_from_rgbd(rgb, depth, calib, denoise=False, bucket=256)
    data = to_numpy_valid(pc)
    assert len(data["xyz"]) > 100
    np.testing.assert_allclose(data["xyz"][:, 2], 3.0, atol=1e-3)


def test_voxel_downsample():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 1, (1000, 3))
    idx = voxel_downsample_indices(xyz, 0.5)
    assert 1 < len(idx) <= 8
    q = np.floor(xyz[idx] / 0.5).astype(int)
    assert len(np.unique(q, axis=0)) == len(idx)


def test_dso_selector_histogram_thresholds_and_budget():
    """The DSO selector (dso_select_pixels, CvoPixelSelector.cpp:430-463)
    gates on per-32x32-block histogram thresholds and retunes its grid
    potential toward the budget."""
    raw = make_raw_image(_textured_scene(h=376, w=624, seed=5), denoise=False)
    uv_lo, _ = sel.dso_select_pixels(raw, 2000)
    uv_hi, _ = sel.dso_select_pixels(raw, 30000)
    assert len(uv_hi) >= len(uv_lo)
    # border exclusion: xf in [4, w-5], yf in [4, h-4)
    for uv in (uv_lo, uv_hi):
        assert uv[:, 0].min() >= 4 and uv[:, 0].max() < raw.cols - 4
        assert uv[:, 1].min() >= 4 and uv[:, 1].max() < raw.rows - 4
    # selected pixels clear their block threshold
    from unified_cvo_tpu.frontend.selector import _dso_block_thresholds
    ths = _dso_block_thresholds(raw.gradient_square)
    g = raw.gradient_square[uv_hi[:, 1], uv_hi[:, 0]]
    t = ths[np.minimum(uv_hi[:, 1] // 32, ths.shape[0] - 1),
            np.minimum(uv_hi[:, 0] // 32, ths.shape[1] - 1)]
    assert np.all(g > t)
    # at most one pick per pot-cell: all uv unique
    assert len(np.unique(uv_hi[:, 0] * 10000 + uv_hi[:, 1])) == len(uv_hi)


def test_dso_selector_flat_image_yields_few_points():
    flat = np.full((128, 256, 3), 127, np.uint8)
    raw = make_raw_image(flat, denoise=False)
    uv, _ = sel.dso_select_pixels(raw, 5000)
    assert len(uv) < 50
