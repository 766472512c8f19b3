"""Lidar front-end tests on a synthetic rotating-scanner point cloud."""

import numpy as np
import pytest

from unified_cvo_tpu.frontend.lidar import (
    edge_detection,
    loam_curvature,
    pointcloud_from_lidar,
    ring_ids,
    surface_selection,
)
from unified_cvo_tpu.utils.pointcloud import to_numpy_valid


def synthetic_scan(num_beams=8, pts_per_ring=360, seed=0):
    """Scanner at origin in the camera-style frame (z forward, x right,
    y down): each ring sweeps azimuth 0..2pi at fixed elevation, hitting a
    cylindrical wall at r=10 with a protruding box (depth edge) and an
    intensity stripe."""
    rng = np.random.default_rng(seed)
    pts, intens = [], []
    for b in range(num_beams):
        elev = np.radians(-10 + 2.0 * b)
        az = np.linspace(0, 2 * np.pi, pts_per_ring, endpoint=False)
        r = np.full(pts_per_ring, 10.0)
        box = (az > 1.0) & (az < 1.3)
        r[box] = 5.0  # protruding box -> depth edges at the borders
        x = -r * np.sin(az) * np.cos(elev)
        z = r * np.cos(az) * np.cos(elev)
        y = -r * np.sin(elev)
        pts.append(np.stack([x, y, z], 1))
        inten = np.full(pts_per_ring, 0.3)
        inten[(az > 4.0) & (az < 4.2)] = 0.9  # intensity stripe
        intens.append(inten)
    xyz = np.concatenate(pts).astype(np.float32)
    inten = np.concatenate(intens).astype(np.float32)
    return np.concatenate([xyz, inten[:, None]], 1)


def test_ring_ids_recovers_beams():
    scan = synthetic_scan(num_beams=8)
    rings = ring_ids(scan[:, :3], 8)
    assert rings.min() == 0 and rings.max() == 7
    # each recovered ring should have ~360 points
    counts = np.bincount(rings)
    assert np.all(np.abs(counts - 360) < 5), counts


def test_edge_detection_finds_box_borders():
    scan = synthetic_scan()
    rings = ring_ids(scan[:, :3], 8)
    edges = edge_detection(scan[:, :3], scan[:, 3], rings,
                           intensity_bound=0.4, depth_bound=2.0,
                           distance_bound=40.0)
    az = np.arctan2(-scan[:, 0], scan[:, 2]) % (2 * np.pi)
    # all edges cluster at the box borders (az ~1.0, 1.3) or stripe (4.0,4.2)
    assert edges.sum() > 8
    near_feature = (
        (np.abs(az - 1.0) < 0.05) | (np.abs(az - 1.3) < 0.05)
        | (np.abs(az - 4.0) < 0.05) | (np.abs(az - 4.2) < 0.05)
    )
    assert near_feature[edges].mean() > 0.9


def test_surface_selection_prefers_flat_regions():
    scan = synthetic_scan()
    rings = ring_ids(scan[:, :3], 8)
    surf = surface_selection(scan[:, :3], rings, num_want=500,
                             distance_bound=40.0)
    assert 100 < surf.sum() <= 500
    c = loam_curvature(scan[:, :3], rings)
    assert np.nanmedian(c[surf]) < 0.05


def test_pointcloud_from_lidar():
    scan = synthetic_scan()
    pc = pointcloud_from_lidar(scan, num_want=1000, beam_num=8, bucket=256)
    data = to_numpy_valid(pc)
    assert len(data["xyz"]) > 200
    assert data["features"].shape[1] == 1  # intensity only
    np.testing.assert_array_equal(data["geometric_types"][:, 0], 1.0)


def test_pointcloud_from_lidar_semantic():
    scan = synthetic_scan()
    sem = np.full(len(scan), 3, np.int32)
    sem[: len(scan) // 4] = -1  # unlabeled: dropped
    pc = pointcloud_from_lidar(scan, num_want=1000, beam_num=8,
                               semantics=sem, num_classes=19, bucket=256)
    data = to_numpy_valid(pc)
    assert data["labels"].shape[1] == 19
    assert np.all(data["labels"].argmax(1) == 3)


# --------------------------------------------------------------- LeGO-LOAM


def lego_synthetic_scan():
    """Dense velodyne-style sweep in the camera frame (y down): ground plane
    at y=1.7 below the sensor plus a wall at z=15."""
    pts = []
    for va in np.arange(-24.5, 2.0, 0.427):
        for ha in np.arange(0, 360, 0.4):
            vr, hr = np.radians(va), np.radians(ha)
            d = np.array([np.sin(hr) * np.cos(vr), -np.sin(vr),
                          np.cos(hr) * np.cos(vr)])
            ts = []
            if d[1] > 1e-3:
                ts.append(1.7 / d[1])
            if d[2] > 1e-3:
                t = 15 / d[2]
                if abs(t * d[0]) < 30 and t * d[1] < 1.7:
                    ts.append(t)
            if not ts:
                continue
            t = min(ts)
            if t < 80:
                pts.append(d * t)
    return np.asarray(pts, np.float32)


def test_lego_range_projection_and_ground():
    from unified_cvo_tpu.frontend.lidar import (
        ground_mask_range_image, project_range_image)

    xyz = lego_synthetic_scan()
    ri, ii = project_range_image(xyz)
    assert (ii >= 0).sum() > 0.9 * len(xyz)
    g = ground_mask_range_image(xyz, ii)
    gidx = ii[g & (ii >= 0)]
    # ground cells really lie on the y=1.7 plane
    np.testing.assert_allclose(np.median(xyz[gidx, 1]), 1.7, atol=0.05)
    # >80% of true plane points are marked ground
    plane = np.abs(xyz[:, 1] - 1.7) < 0.01
    marked = np.zeros(len(xyz), bool)
    marked[gidx] = True
    assert marked[plane].mean() > 0.8


def test_lego_segmentation_keeps_wall_drops_speckle():
    from unified_cvo_tpu.frontend.lidar import (
        ground_mask_range_image, project_range_image, segment_range_image)

    xyz = lego_synthetic_scan()
    # inject 40 isolated far speckle points (tiny clusters -> infeasible)
    rng = np.random.default_rng(0)
    n_spk = 40
    spk = np.stack([rng.uniform(-5, 5, n_spk), rng.uniform(-3, -2.5, n_spk),
                    rng.uniform(60, 75, n_spk)], 1).astype(np.float32)
    allp = np.concatenate([xyz, spk])
    ri, ii = project_range_image(allp)
    g = ground_mask_range_image(allp, ii)
    seg = segment_range_image(ri, g)
    segged = np.zeros(len(allp), bool)
    segged[ii[seg & (ii >= 0)]] = True
    wall = np.abs(allp[:, 2] - 15.0) < 0.01
    assert segged[wall].mean() > 0.7          # wall survives
    assert segged[len(xyz):].mean() < 0.3     # speckle culled


def test_legoloam_select_and_pointcloud():
    from unified_cvo_tpu.frontend.lidar import legoloam_select

    xyz = lego_synthetic_scan()
    e, s = legoloam_select(xyz)
    assert len(e) > 10 and len(s) > 100
    # corners live on the wall (the only segmented structure), in its
    # oblique outer region: the |x|=30 discontinuity itself is suppressed by
    # occlusion marking (markOccludedPoints), so max-curvature picks land
    # just inside it
    np.testing.assert_allclose(xyz[e, 2], 15.0, atol=0.1)
    assert (np.abs(xyz[e, 0]) > 15.0).mean() > 0.5
    pts = np.concatenate(
        [xyz, np.random.default_rng(1).uniform(0, 1, (len(xyz), 1))], 1
    ).astype(np.float32)
    pc = pointcloud_from_lidar(pts, method="legoloam", bucket=1024)
    data = to_numpy_valid(pc)
    assert len(data["xyz"]) == len(e) + len(s) or len(data["xyz"]) > 100
