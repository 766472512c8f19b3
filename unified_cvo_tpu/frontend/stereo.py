"""Stereo disparity + backprojection (the libelas/StaticStereo replacement).

The reference computes left disparity with vendored libelas at image load
(src/utils/ImageStereo.cpp, src/utils/StaticStereo.cpp:22-63). Here we use
census-based semi-global matching (cv2.StereoSGBM, MODE_SGBM_3WAY) which is
the same algorithmic family at comparable quality, and keep the exact
backprojection / gating semantics of pt_depth_from_disparity
(StaticStereo.cpp:66-113): u in [1,w-2], v in [1,h-2], disparity > 0.05,
depth = |baseline| * fx / disp, xyz = K^{-1} [u,v,1] * depth.
"""

from __future__ import annotations

try:
    import cv2
except ImportError:  # the native SGM path covers cv2-less environments
    cv2 = None

import numpy as np

from unified_cvo_tpu.frontend.calibration import Calibration


def compute_disparity(left: np.ndarray, right: np.ndarray,
                      max_disparity: int = 128,
                      backend: str = "auto") -> np.ndarray:
    """Left-image disparity map [H,W] float32; invalid pixels <= 0.

    backend: 'opencv' (StereoSGBM, SIMD, fastest), 'native' (the C++
    AVX2 census/SGM library in native/, the libelas replacement —
    depth-quality equivalent, ~9x slower than cv2 on a 2-core host;
    BASELINE.md settlement table), or 'auto' (OpenCV if importable,
    else native)."""

    def gray(im):
        return im if im.ndim == 2 else cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)

    lg, rg = gray(left), gray(right)

    if backend == "native" or (backend == "auto" and cv2 is None):
        from unified_cvo_tpu import native

        if native.available():
            return native.sgm_disparity(lg, rg, max_disp=max_disparity)
        raise RuntimeError("native backend requested but libcvo_native.so not built")
    block = 7
    sgbm = cv2.StereoSGBM_create(
        minDisparity=0,
        numDisparities=max_disparity,
        blockSize=block,
        P1=8 * block * block,
        P2=32 * block * block,
        disp12MaxDiff=1,
        uniquenessRatio=10,
        speckleWindowSize=100,
        speckleRange=2,
        preFilterCap=31,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
    )
    disp = sgbm.compute(lg, rg).astype(np.float32) / 16.0
    return disp


def backproject_disparity(
    uv: np.ndarray, disparity: np.ndarray, calib: Calibration
):
    """Vectorized pt_depth_from_disparity over selected pixels.

    Returns (xyz [N,3] float32, good [N] bool)."""
    h, w = disparity.shape
    u = uv[:, 0].astype(np.int64)
    v = uv[:, 1].astype(np.int64)
    in_bounds = (u >= 1) & (u <= w - 2) & (v >= 1) & (v <= h - 2)
    d = np.where(in_bounds, disparity[np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)], 0.0)
    valid = in_bounds & (d > 0.05)
    depth = np.abs(calib.baseline) * calib.fx / np.where(valid, d, 1.0)
    Kinv = np.linalg.inv(calib.intrinsic)
    homo = np.stack([u.astype(np.float32), v.astype(np.float32), np.ones_like(u, np.float32)], 1)
    xyz = (homo @ Kinv.T) * depth[:, None]
    return xyz.astype(np.float32), valid


def is_good_point(xyz: np.ndarray, uv: np.ndarray, h: int, w: int) -> np.ndarray:
    """Sky/far-point filter (CvoPointCloud.cpp:39-57): u in [2, w-2],
    v in [100, h-30], range < 55 m."""
    u, v = uv[:, 0], uv[:, 1]
    ok = (u >= 2) & (u <= w - 2) & (v >= 100) & (v <= h - 30)
    ok &= np.linalg.norm(xyz, axis=1) < 55.0
    return ok


def backproject_depth(
    uv: np.ndarray, depth_image: np.ndarray, calib: Calibration
):
    """RGB-D backprojection (reference CvoPointCloud RGBD ctor semantics,
    CvoPointCloud.cpp:459-564): depth/depth_scale, valid if > 0."""
    h, w = depth_image.shape[:2]
    u = uv[:, 0].astype(np.int64)
    v = uv[:, 1].astype(np.int64)
    in_bounds = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    d = np.where(
        in_bounds,
        depth_image[np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)].astype(np.float64),
        0.0,
    )
    depth = d / calib.depth_scale
    valid = in_bounds & (depth > 1e-6)
    Kinv = np.linalg.inv(calib.intrinsic)
    homo = np.stack([u.astype(np.float64), v.astype(np.float64), np.ones_like(u, np.float64)], 1)
    xyz = (homo @ Kinv.T) * depth[:, None]
    return xyz.astype(np.float32), valid
