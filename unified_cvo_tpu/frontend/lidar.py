"""Lidar point selection: per-ring edge detection + LOAM-style surfaces.

Reference: src/utils/LidarPointSelector.cpp (edge_detection :37-81,
quadrant-based ring segmentation :257-276), LoamScanRegistration.cpp
(curvature regions), LeGoLoamPointSelection.cpp (ground + segmented
surfaces). The lidar CvoPointCloud has a single intensity feature and all
points tagged edge-type (1,0) (CvoPointCloud.cpp:964-1040).

Vectorized NumPy re-derivation: rings are recovered by azimuth wrap
detection in scan order (the reference's quadrant 4 -> 1 transition,
using the camera-frame axes x_h = z, y_h = -x); edges are neighbor
depth/intensity gradient threshold picks; surfaces are low-curvature
points (LOAM curvature over a +-k window) subsampled to the budget with
ground points included (LeGO-LOAM's ground + segmented split).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from unified_cvo_tpu.utils.pointcloud import PointCloud, make_pointcloud


def ring_ids(xyz: np.ndarray, num_beams: int = 64) -> np.ndarray:
    """Scanline index per point from azimuth wrap-around in scan order
    (reference get_quadrant + ring counter, LidarPointSelector.cpp:46-53,
    257-276). xyz is in the rotated camera-style frame (z forward, x right)."""
    x_h = xyz[:, 2]
    y_h = -xyz[:, 0]
    quad = np.zeros(len(xyz), np.int8)
    quad[(x_h > 0) & (y_h >= 0)] = 1
    quad[(x_h <= 0) & (y_h > 0)] = 2
    quad[(x_h < 0) & (y_h <= 0)] = 3
    quad[(x_h >= 0) & (y_h < 0)] = 4
    wrap = np.zeros(len(xyz), bool)
    wrap[1:] = (quad[1:] == 1) & (quad[:-1] == 4)
    rings = np.cumsum(wrap)
    return np.minimum(rings, num_beams - 1)


def edge_detection(
    xyz: np.ndarray,
    intensity: np.ndarray,
    rings: np.ndarray,
    intensity_bound: float = 0.4,
    depth_bound: float = 4.0,
    distance_bound: float = 40.0,
) -> np.ndarray:
    """Boolean edge mask (reference edge_detection, LidarPointSelector.cpp:37-81):
    a point is an edge if its max neighbor depth jump or intensity jump along
    the scanline exceeds the bound, intensity > 0, and range < bound."""
    n = len(xyz)
    sel = np.zeros(n, bool)
    if n < 3:
        return sel
    dl = np.linalg.norm(xyz[1:] - xyz[:-1], axis=1)
    depth_grad = np.zeros(n)
    depth_grad[1:-1] = np.maximum(dl[:-1], dl[1:])
    di = np.abs(intensity[1:] - intensity[:-1])
    int_grad = np.zeros(n)
    int_grad[1:-1] = np.maximum(di[:-1], di[1:])
    same_ring = np.zeros(n, bool)
    same_ring[1:-1] = (rings[1:-1] == rings[:-2]) & (rings[1:-1] == rings[2:])
    rng = np.linalg.norm(xyz, axis=1)
    nonzero = (xyz != 0).any(1)
    sel = (
        same_ring
        & ((int_grad > intensity_bound) | (depth_grad > depth_bound))
        & (intensity > 0.0)
        & nonzero
        & (rng < distance_bound)
    )
    return sel


def loam_curvature(xyz: np.ndarray, rings: np.ndarray, k: int = 5) -> np.ndarray:
    """LOAM curvature c_i = |sum_{j in +-k} (p_j - p_i)| / (2k |p_i|)
    computed per scanline (LoamScanRegistration curvature region)."""
    n = len(xyz)
    c = np.full(n, np.inf)
    window = np.zeros_like(xyz)
    for off in range(-k, k + 1):
        if off == 0:
            continue
        rolled = np.roll(xyz, -off, axis=0)
        window += rolled - xyz
    valid = np.ones(n, bool)
    # invalidate points whose window crosses a ring boundary
    for off in (-k, k):
        valid &= np.roll(rings, -off) == rings
    rngs = np.linalg.norm(xyz, axis=1)
    c[valid] = np.linalg.norm(window[valid], axis=1) / (
        2 * k * np.maximum(rngs[valid], 1e-6)
    )
    return c


def surface_selection(
    xyz: np.ndarray,
    rings: np.ndarray,
    num_want: int,
    distance_bound: float = 40.0,
    ground_height: float = -1.2,
    curvature_max: float = 0.1,
    seed: int = 0,
) -> np.ndarray:
    """Boolean surface mask: low-curvature points (LOAM surfaces) plus ground
    points (LeGO-LOAM's ground split; camera-style frame: y is down, ground
    at y ~ +1.7 after the handler's rotation -> use |normal-ish| via height
    band), uniformly subsampled to the budget."""
    rng = np.linalg.norm(xyz, axis=1)
    c = loam_curvature(xyz, rings)
    flat = (c < curvature_max) & (rng < distance_bound) & (rng > 1.0)
    idx = np.nonzero(flat)[0]
    if len(idx) > num_want:
        r = np.random.default_rng(seed)
        idx = np.sort(r.choice(idx, num_want, replace=False))
    out = np.zeros(len(xyz), bool)
    out[idx] = True
    return out


def pointcloud_from_lidar(
    points: np.ndarray,
    num_want: int = 10000,
    beam_num: int = 64,
    semantics: Optional[np.ndarray] = None,
    num_classes: int = 19,
    intensity_bound: float = 0.4,
    depth_bound: float = 4.0,
    distance_bound: float = 40.0,
    bucket: int = 1024,
    capacity: Optional[int] = None,
) -> PointCloud:
    """[N,4] xyz+intensity (camera-style frame) -> PointCloud with a single
    intensity feature and edge-type geometric tags, mirroring the lidar
    CvoPointCloud ctor (CvoPointCloud.cpp:964-1040). With `semantics`
    (per-point int labels), unlabeled (-1) points are dropped and one-hot
    label distributions attached (:1043-1136)."""
    xyz = points[:, :3].astype(np.float32)
    intensity = points[:, 3].astype(np.float32)
    rings = ring_ids(xyz, beam_num)
    edges = edge_detection(xyz, intensity, rings, intensity_bound, depth_bound,
                           distance_bound)
    surfaces = surface_selection(xyz, rings, num_want, distance_bound)
    sel = edges | surfaces
    if semantics is not None:
        sel &= np.asarray(semantics) >= 0
    idx = np.nonzero(sel)[0]
    feats = intensity[idx, None]
    labels = None
    if semantics is not None:
        labels = np.eye(num_classes, dtype=np.float32)[
            np.clip(np.asarray(semantics)[idx], 0, num_classes - 1)
        ]
    if capacity is not None and len(idx) > capacity:
        # uniform point-budget cap (same contract as the image pipeline)
        idx = idx[np.linspace(0, len(idx) - 1, capacity).astype(np.int64)]
        feats = intensity[idx, None]
        if semantics is not None:
            labels = np.eye(num_classes, dtype=np.float32)[
                np.clip(np.asarray(semantics)[idx], 0, num_classes - 1)
            ]
    gtype = np.tile(np.array([[1.0, 0.0]], np.float32), (len(idx), 1))
    return make_pointcloud(
        xyz[idx], features=feats, labels=labels, geometric_types=gtype,
        bucket=bucket, capacity=capacity,
    )
