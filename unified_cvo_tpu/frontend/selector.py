"""Image point selection: FAST-adaptive, Canny+uniform+ORB, DSO-style, FULL.

Reference: select_points_from_image (src/utils/CvoPointCloud.cpp:258-381)
and stereo_surface_sampling (:151-256). Selected pixels carry a 2-vector
geometric type (edge, surface).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

from unified_cvo_tpu.frontend.image import RawImage

CV_FAST = "CV_FAST"
DSO_EDGES = "DSO_EDGES"
CANNY_EDGES = "CANNY_EDGES"
EDGES_ONLY = "EDGES_ONLY"
FULL = "FULL"


def _gray(raw: RawImage) -> np.ndarray:
    if raw.channels == 1:
        return raw.image
    return cv2.cvtColor(raw.image, cv2.COLOR_BGR2GRAY)


def _fast_adaptive(gray, pt_type: str, num_classes: int):
    """FAST with the reference's adaptive threshold search
    (CvoPointCloud.cpp:273-323)."""
    if pt_type == "rgbd":
        thresh, num_want, num_min, break_thresh = 9, 15000, 12000, 13
    else:  # stereo
        thresh, num_want, num_min, break_thresh = 4, 24000, 15000, 50
        if num_classes > 0:
            num_want = 28000

    kp = cv2.FastFeatureDetector_create(5, nonmaxSuppression=False).detect(gray)
    while len(kp) > num_want:
        thresh += 1
        kp = cv2.FastFeatureDetector_create(thresh, nonmaxSuppression=False).detect(gray)
        if thresh == break_thresh:
            break
    while len(kp) < num_min:
        thresh -= 1
        kp = cv2.FastFeatureDetector_create(thresh, nonmaxSuppression=False).detect(gray)
        if thresh == 0:
            break
    uv = np.array([[int(k.pt[0]), int(k.pt[1])] for k in kp], np.int32).reshape(-1, 2)
    gtype = np.tile(np.array([[1.0, 0.0]], np.float32), (len(uv), 1))
    return uv, gtype


def _dso_like(raw: RawImage, expected_points=10000):
    """Gradient-magnitude semi-dense selection approximating the DSO
    PixelSelector (reference src/utils/CvoPixelSelector.cpp): pick the
    strongest-gradient pixel per cell over a small grid, keeping cells whose
    response clears a histogram-adaptive threshold."""
    gs = raw.gradient_square
    h, w = gs.shape
    cell = 4
    H, W = h // cell, w // cell
    gsc = gs[: H * cell, : W * cell].reshape(H, cell, W, cell).transpose(0, 2, 1, 3)
    gsc = gsc.reshape(H, W, cell * cell)
    best = gsc.argmax(-1)
    bestval = gsc.max(-1)
    # adaptive threshold: median of per-cell maxima, scaled to hit the budget
    thr = np.median(bestval[bestval > 0]) if (bestval > 0).any() else 0.0
    order = np.argsort(-bestval.ravel())
    keep = order[: min(expected_points, (bestval.ravel() > thr).sum())]
    cy, cx = np.unravel_index(keep, (H, W))
    oy, ox = np.unravel_index(best[cy, cx], (cell, cell))
    uv = np.stack([cx * cell + ox, cy * cell + oy], axis=1).astype(np.int32)
    gtype = np.tile(np.array([[0.9, 0.1]], np.float32), (len(uv), 1))
    return uv, gtype


def _canny_uniform_orb(gray, use_canny, use_uniform, use_orb,
                       expected_points, rng):
    """stereo_surface_sampling (CvoPointCloud.cpp:151-256): ORB keypoints +
    1/4 of the budget from Canny edges + 3/4 from uniform surface samples;
    edges tagged (1,0), surfaces (0,1)."""
    uvs, gtypes = [], []
    edges = cv2.Canny(gray, 50, 150, apertureSize=3) if use_canny else None
    if use_orb:
        orb = cv2.ORB_create(nfeatures=expected_points // 3)
        for k in orb.detect(gray):
            uvs.append([int(k.pt[0]), int(k.pt[1])])
            gtypes.append([1.0, 0.0])
    if use_canny:
        er, ec = np.nonzero(edges)
        n_edge = len(er)
        if n_edge:
            keep = rng.random(n_edge) < (expected_points / 4) / n_edge
            for r, c in zip(er[keep], ec[keep]):
                uvs.append([c, r])
                gtypes.append([1.0, 0.0])
    if use_uniform:
        h, w = gray.shape
        flat = rng.random((h, w)) < 0.1
        if use_canny:
            flat &= edges == 0
        sr, sc = np.nonzero(flat)
        n_surf = len(sr)
        if n_surf:
            keep = rng.random(n_surf) < (expected_points * 3 / 4) / n_surf
            for r, c in zip(sr[keep], sc[keep]):
                uvs.append([c, r])
                gtypes.append([0.0, 1.0])
    uv = np.array(uvs, np.int32).reshape(-1, 2)
    return uv, np.array(gtypes, np.float32).reshape(-1, 2)


def select_points(
    raw: RawImage,
    pt_type: str = "stereo",
    method: str = CV_FAST,
    expected_points: int = 10000,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (uv [N,2] int32 (u=col, v=row), geometric_type [N,2])."""
    gray = _gray(raw)
    rng = np.random.default_rng(seed)
    if method == CV_FAST:
        return _fast_adaptive(gray, pt_type, raw.num_classes)
    if method == DSO_EDGES:
        return _dso_like(raw, expected_points)
    if method == CANNY_EDGES:
        return _canny_uniform_orb(gray, True, True, True, expected_points, rng)
    if method == EDGES_ONLY:
        return _canny_uniform_orb(gray, True, False, False, expected_points, rng)
    if method == FULL:
        h, w = gray.shape
        vv, uu = np.mgrid[0:h, 0:w]
        uv = np.stack([uu.ravel(), vv.ravel()], axis=1).astype(np.int32)
        gtype = np.tile(np.array([[0.5, 0.5]], np.float32), (len(uv), 1))
        return uv, gtype
    raise ValueError(f"unknown selection method {method}")
