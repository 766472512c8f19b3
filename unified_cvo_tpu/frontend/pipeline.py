"""Measurement -> feature point cloud construction (CvoPointCloud ctors).

Composes RawImage, point selection, stereo/RGB-D depth, and the good-point
filters into padded PointClouds, mirroring the reference constructors:
  * stereo: CvoPointCloud(ImageStereo, Calibration) (CvoPointCloud.cpp:680-773)
  * rgbd:   CvoPointCloud(RawImage, depth, Calibration) (CvoPointCloud.cpp:459-564)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from unified_cvo_tpu.frontend import selector as sel
from unified_cvo_tpu.frontend.calibration import Calibration
from unified_cvo_tpu.frontend.image import RawImage, make_raw_image, pixel_features
from unified_cvo_tpu.frontend.stereo import (
    backproject_depth,
    backproject_disparity,
    compute_disparity,
    is_good_point,
)
from unified_cvo_tpu.utils.pointcloud import PointCloud, make_pointcloud

UNLABELED_CLASS = 10  # reference excludes argmax==10 points (CvoPointCloud.cpp:716-722)


def _finalize(raw: RawImage, uv, gtype, xyz, good, bucket, capacity=None):
    uv, gtype, xyz = uv[good], gtype[good], xyz[good]
    feats = pixel_features(raw, uv[:, 0], uv[:, 1])
    # 5-dim layout regardless of channels (reference pads grayscale to 3+2
    # via FEATURE_DIMENSIONS; we keep actual dims: 5 for color, 3 for gray)
    labels = None
    if raw.num_classes > 0:
        labels = raw.semantics[uv[:, 1], uv[:, 0]].astype(np.float32)
        keep = labels.argmax(1) != UNLABELED_CLASS
        uv, gtype, xyz, feats, labels = (
            uv[keep], gtype[keep], xyz[keep], feats[keep], labels[keep]
        )
    if capacity is not None and len(xyz) > capacity:
        # uniform point-budget cap — the analogue of the reference's adaptive
        # FAST-threshold retuning toward its 15-28k target
        # (CvoPointCloud.cpp:283-323)
        sub = np.linspace(0, len(xyz) - 1, capacity).astype(np.int64)
        xyz, gtype, feats = xyz[sub], gtype[sub], feats[sub]
        labels = labels[sub] if labels is not None else None
    return make_pointcloud(
        xyz, features=feats, labels=labels, geometric_types=gtype,
        bucket=bucket, capacity=capacity,
    )


def pointcloud_from_stereo(
    left: np.ndarray,
    right: np.ndarray,
    calib: Calibration,
    method: str = sel.CV_FAST,
    semantics: Optional[np.ndarray] = None,
    denoise: bool = True,
    bucket: int = 1024,
    capacity: Optional[int] = None,
    disparity: Optional[np.ndarray] = None,
    stereo_backend: str = "auto",
) -> PointCloud:
    raw = make_raw_image(left, semantics=semantics, denoise=denoise)
    uv, gtype = sel.select_points(raw, "stereo", method)
    if disparity is None:
        disparity = compute_disparity(left, right, backend=stereo_backend)
    xyz, valid = backproject_disparity(uv, disparity, calib)
    good = valid & is_good_point(xyz, uv, raw.rows, raw.cols)
    return _finalize(raw, uv, gtype, xyz, good, bucket, capacity)


def pointcloud_from_rgbd(
    rgb: np.ndarray,
    depth: np.ndarray,
    calib: Calibration,
    method: str = sel.CV_FAST,
    semantics: Optional[np.ndarray] = None,
    denoise: bool = True,
    bucket: int = 1024,
    capacity: Optional[int] = None,
    max_range: float = 55.0,
) -> PointCloud:
    raw = make_raw_image(rgb, semantics=semantics, denoise=denoise)
    uv, gtype = sel.select_points(raw, "rgbd", method)
    xyz, valid = backproject_depth(uv, depth, calib)
    good = valid & (np.linalg.norm(xyz, axis=1) < max_range)
    return _finalize(raw, uv, gtype, xyz, good, bucket, capacity)
