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


# --------------------------------------------------------------- LeGO-LOAM
#
# Faithful re-derivation of the reference's LeGoLoamPointSelection
# (src/utils/LeGoLoamPointSelection.cpp): range-image projection (KITTI
# HDL-64 geometry, LeGoLoamPointSelection.hpp:296-301), ground removal by
# inter-ring vertical angle (:281-318), BFS range-image segmentation with
# the atan2(d2 sin a, d1 - d2 cos a) > 60 deg criterion (:462-505), and
# LOAM feature association (curvature sort per 6 sectors/ring with
# occlusion + neighbor suppression, :644-830). Coordinates are the
# camera-style frame (y down): vertical angle uses -y (:241), horizontal
# angle uses (z, -x) (:250).

LEGO_N_SCAN = 64
LEGO_HORIZON = 1800
LEGO_ANG_RES_X = 0.2
LEGO_ANG_RES_Y = 0.427
LEGO_ANG_BOTTOM = 24.9
LEGO_GROUND_ROWS = 50
LEGO_SEGMENT_THETA = np.deg2rad(60.0)
LEGO_MIN_RANGE = 1.0


def project_range_image(xyz: np.ndarray,
                        n_scan: int = LEGO_N_SCAN,
                        horizon: int = LEGO_HORIZON,
                        ang_res_x: float = LEGO_ANG_RES_X,
                        ang_res_y: float = LEGO_ANG_RES_Y,
                        ang_bottom: float = LEGO_ANG_BOTTOM,
                        min_range: float = LEGO_MIN_RANGE):
    """Project a camera-frame cloud to a [n_scan, horizon] range image.
    Returns (range_img, index_img) with -1/inf for empty cells
    (projectPointCloud, LeGoLoamPointSelection.cpp:215-280)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rng = np.linalg.norm(xyz, axis=1)
    vert = np.degrees(np.arctan2(-y, np.sqrt(x * x + z * z)))
    row = np.floor((vert + ang_bottom) / ang_res_y).astype(np.int64)
    horiz = np.degrees(np.arctan2(z, -x))
    col = (-np.round((horiz - 90.0) / ang_res_x) + horizon / 2).astype(np.int64)
    col = np.where(col >= horizon, col - horizon, col)
    ok = (
        (row >= 0) & (row < n_scan) & (col >= 0) & (col < horizon)
        & (rng >= min_range) & np.isfinite(rng)
    )
    range_img = np.full((n_scan, horizon), np.inf, np.float32)
    index_img = np.full((n_scan, horizon), -1, np.int64)
    idx = np.nonzero(ok)[0]
    # later points overwrite earlier ones, like the reference's assignment
    range_img[row[idx], col[idx]] = rng[idx]
    index_img[row[idx], col[idx]] = idx
    return range_img, index_img


def ground_mask_range_image(xyz: np.ndarray, index_img: np.ndarray,
                            ground_rows: int = LEGO_GROUND_ROWS,
                            mount_angle: float = 0.0):
    """Ground cells: vertical angle between ring i and i+1 within 10 deg of
    the mount angle AND the lower point itself more than 3 deg below level
    (groundRemoval, LeGoLoamPointSelection.cpp:281-318)."""
    n_scan, horizon = index_img.shape
    ground = np.zeros((n_scan, horizon), bool)
    gi = min(ground_rows, n_scan - 1)
    lower = index_img[:gi]
    upper = index_img[1 : gi + 1]
    valid = (lower >= 0) & (upper >= 0)
    pl_ = xyz[np.maximum(lower, 0)]
    pu = xyz[np.maximum(upper, 0)]
    d = pu - pl_
    ang = np.degrees(np.arctan2(d[..., 1], np.sqrt(d[..., 0] ** 2 + d[..., 2] ** 2)))
    pt_ang = np.degrees(np.arctan2(
        pl_[..., 1], np.sqrt(pl_[..., 0] ** 2 + pl_[..., 2] ** 2)))
    is_g = valid & (np.abs(ang - mount_angle) <= 10.0) \
        & (np.abs(pt_ang - mount_angle) > 3.0)
    ground[:gi][is_g] = True
    ground[1 : gi + 1][is_g] = True
    return ground


def segment_range_image(range_img: np.ndarray, ground: np.ndarray,
                        segment_theta: float = LEGO_SEGMENT_THETA,
                        alpha_x: float = np.deg2rad(LEGO_ANG_RES_X),
                        alpha_y: float = np.deg2rad(LEGO_ANG_RES_Y),
                        min_cluster: int = 30,
                        valid_point_num: int = 5,
                        valid_line_num: int = 3):
    """Connected-component segmentation on the range image. Two adjacent
    cells join when atan2(d2 sin a, d1 - d2 cos a) > segment_theta (the
    LeGO-LOAM smoothness criterion, labelComponents
    LeGoLoamPointSelection.cpp:462-505); clusters survive with >=30 cells, or
    >=5 cells spanning >=3 scan lines (:470-486). Returns a boolean mask of
    segmented (non-ground, non-outlier) cells."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n_scan, horizon = range_img.shape
    valid = np.isfinite(range_img) & ~ground
    cell_id = np.arange(n_scan * horizon).reshape(n_scan, horizon)

    def link(r1, c1, r2, c2, alpha):
        a = range_img[r1, c1]
        b = range_img[r2, c2]
        ok = np.isfinite(a) & np.isfinite(b) & valid[r1, c1] & valid[r2, c2]
        d1 = np.maximum(a, b)
        d2 = np.minimum(a, b)
        with np.errstate(invalid="ignore"):
            ang = np.arctan2(d2 * np.sin(alpha), d1 - d2 * np.cos(alpha))
        ok &= ang > segment_theta
        return cell_id[r1, c1][ok], cell_id[r2, c2][ok]

    rows_a, rows_b = [], []
    # vertical neighbors
    r = np.arange(n_scan - 1)[:, None]
    c = np.arange(horizon)[None, :]
    a, b = link(r, c, r + 1, c, alpha_y)
    rows_a.append(a); rows_b.append(b)
    # horizontal neighbors with column wrap (:448-452)
    r = np.arange(n_scan)[:, None]
    c = np.arange(horizon)[None, :]
    a, b = link(r, c, r, (c + 1) % horizon, alpha_x)
    rows_a.append(a); rows_b.append(b)

    ii = np.concatenate(rows_a)
    jj = np.concatenate(rows_b)
    n = n_scan * horizon
    adj = coo_matrix((np.ones(len(ii), np.int8), (ii, jj)), shape=(n, n))
    ncomp, labels = connected_components(adj, directed=False)
    labels = labels.reshape(n_scan, horizon)
    labels = np.where(valid, labels, -1)

    flat = labels.ravel()
    sel = flat >= 0
    counts = np.bincount(flat[sel], minlength=ncomp)
    # distinct scan lines per component
    row_of = np.repeat(np.arange(n_scan), horizon)
    pair = np.unique(np.stack([flat[sel], row_of[sel]], 1), axis=0)
    line_counts = np.bincount(pair[:, 0], minlength=ncomp)
    feasible = (counts >= min_cluster) | (
        (counts >= valid_point_num) & (line_counts >= valid_line_num)
    )
    return np.where(labels >= 0, feasible[np.maximum(labels, 0)], False)


def _loam_extract_features(range_img, index_img, segmented, ground,
                           edge_threshold: float = 0.1,
                           surface_rate: int = 4,
                           seed: int = 0):
    """LOAM feature association on the segmented cloud: per ring, split into
    6 sectors, sort by curvature (sum-of-range-differences squared,
    calculateSmoothness :644-664), mark occluded/parallel points (:666-701),
    pick up to 20 corners per sector with +-5 neighbor suppression, and keep
    1-in-`surface_rate` of the remainder as surfaces (extractFeatures
    :703-817). Returns (edge_point_indices, surface_point_indices)."""
    n_scan, horizon = range_img.shape
    rng = np.random.default_rng(seed)
    edge_idx, surf_idx = [], []
    keep = segmented & (index_img >= 0)
    for i in range(n_scan):
        cols = np.nonzero(keep[i])[0]
        if len(cols) < 12:
            continue
        ranges = range_img[i, cols]
        m = len(cols)
        # curvature over the ring sequence (+-5 window)
        curv = np.full(m, np.nan)
        for k in range(5, m - 5):
            diff = ranges[k - 5 : k + 6].sum() - 11 * ranges[k]
            curv[k] = diff * diff
        picked = np.zeros(m, bool)
        picked[:5] = True
        picked[m - 5 :] = True
        # occlusion marking (markOccludedPoints)
        col_diff = np.abs(np.diff(cols))
        range_diff = np.diff(ranges)
        for k in range(5, m - 6):
            if col_diff[k] < 10:
                if range_diff[k] < -0.3:
                    picked[k - 5 : k + 1] = True
                elif range_diff[k] > 0.3:
                    picked[k + 1 : k + 7] = True
        par = (np.abs(np.diff(ranges, prepend=ranges[0])) >
               0.02 * ranges) & (np.abs(np.diff(ranges, append=ranges[-1])) >
                                 0.02 * ranges)
        picked |= par
        sector = np.linspace(0, m, 7).astype(int)
        is_edge = np.zeros(m, bool)
        for s in range(6):
            sp, ep = sector[s], sector[s + 1]
            if ep - sp < 2:
                continue
            order = np.argsort(curv[sp:ep])[::-1] + sp
            n_corner = 0
            for k in order:
                if picked[k] or not np.isfinite(curv[k]) or curv[k] <= edge_threshold:
                    continue
                is_edge[k] = True
                n_corner += 1
                picked[k] = True
                # suppress +-5 neighbors unless a column gap breaks the run
                for l in range(k + 1, min(k + 6, m)):
                    if abs(int(cols[l]) - int(cols[l - 1])) > 10:
                        break
                    picked[l] = True
                for l in range(k - 1, max(k - 6, -1), -1):
                    if abs(int(cols[l]) - int(cols[l + 1])) > 10:
                        break
                    picked[l] = True
                if n_corner >= 20:
                    break
            # remaining points: 1-in-surface_rate random surface sample
            rest = np.nonzero(~is_edge[sp:ep])[0] + sp
            if len(rest):
                chosen = rest[rng.random(len(rest)) < 1.0 / surface_rate]
                surf_idx.extend(index_img[i, cols[chosen]].tolist())
        edge_idx.extend(index_img[i, cols[is_edge]].tolist())
    return (np.asarray(edge_idx, np.int64).reshape(-1),
            np.asarray(surf_idx, np.int64).reshape(-1))


def legoloam_select(xyz: np.ndarray, seed: int = 0):
    """Full LeGO-LOAM selection pipeline (cloudHandler,
    LeGoLoamPointSelection.cpp:61-85). Returns (edge_indices, surface_indices)
    into `xyz` (camera-style frame)."""
    range_img, index_img = project_range_image(xyz)
    ground = ground_mask_range_image(xyz, index_img)
    segmented = segment_range_image(range_img, ground)
    return _loam_extract_features(range_img, index_img, segmented, ground,
                                  seed=seed)


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
    method: str = "loam",
) -> PointCloud:
    """[N,4] xyz+intensity (camera-style frame) -> PointCloud with a single
    intensity feature and edge/surface geometric tags, mirroring the lidar
    CvoPointCloud ctor (CvoPointCloud.cpp:964-1040). With `semantics`
    (per-point int labels), unlabeled (-1) points are dropped and one-hot
    label distributions attached (:1043-1136). method="loam" uses the
    per-ring edge + curvature-surface selector; method="legoloam" runs the
    full LeGO-LOAM range-image ground-removal + segmentation pipeline
    (LeGoLoamPointSelection.cpp)."""
    xyz = points[:, :3].astype(np.float32)
    intensity = points[:, 3].astype(np.float32)
    rings = ring_ids(xyz, beam_num)
    if method == "legoloam":
        e_idx, s_idx = legoloam_select(xyz)
        edges = np.zeros(len(xyz), bool)
        edges[e_idx] = True
        surfaces = np.zeros(len(xyz), bool)
        surfaces[s_idx] = True
        surfaces &= ~edges
    else:
        edges = edge_detection(xyz, intensity, rings, intensity_bound,
                               depth_bound, distance_bound)
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
