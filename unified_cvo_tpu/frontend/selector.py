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


def _dso_block_thresholds(gs: np.ndarray) -> np.ndarray:
    """DSO gradient-histogram block thresholds (reference makeHists,
    CvoPixelSelector.cpp:85-147): per 32x32 block, the histogram quantile of
    int(sqrt(grad^2)) clipped to 48 at cut 0.5 plus 7 (settings at :48-49),
    then a 3x3 block-neighborhood average, squared (thsSmoothed)."""
    h, w = gs.shape
    h32, w32 = h // 32, w // 32
    # interior pixels only (1 <= x <= w-2, 1 <= y <= h-2)
    g = np.sqrt(np.maximum(gs, 0.0)).astype(np.int32)
    np.clip(g, 0, 48, out=g)
    interior = np.zeros((h, w), bool)
    interior[1 : h - 1, 1 : w - 1] = True
    ths = np.zeros((h32, w32), np.float32)
    for by in range(h32):
        for bx in range(w32):
            blk = g[32 * by : 32 * by + 32, 32 * bx : 32 * bx + 32]
            msk = interior[32 * by : 32 * by + 32, 32 * bx : 32 * bx + 32]
            vals = blk[msk]
            hist = np.bincount(vals, minlength=49)
            total = len(vals)
            # computeHistQuantil (CvoPixelSelector.cpp:72-79)
            th = int(total * 0.5 + 0.5)
            cum = np.cumsum(hist)
            below = np.nonzero(cum > th)[0]
            q = int(below[0]) if len(below) else 90
            ths[by, bx] = q + 7.0
    # 3x3 neighborhood mean (makeHists smoothing, :118-141), then squared
    pad = np.pad(ths, 1, mode="constant")
    cnt = np.pad(np.ones_like(ths), 1, mode="constant")
    sm = sum(
        pad[1 + dy : 1 + dy + h32, 1 + dx : 1 + dx + w32]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    n = sum(
        cnt[1 + dy : 1 + dy + h32, 1 + dx : 1 + dx + w32]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    sm = sm / n
    return (sm * sm).astype(np.float32)


def _dso_select_pot(gs: np.ndarray, ths_sm: np.ndarray, pot: int,
                    th_factor: float = 1.0) -> np.ndarray:
    """One DSO selection pass at grid potential `pot` (reference select(),
    CvoPixelSelector.cpp:270-426, with levels 1-2 and direction distribution
    compiled out :47,373-395): in every pot x pot cell keep the pixel with the
    largest grad^2 among those above the block threshold. Returns uv [N,2]."""
    h, w = gs.shape
    # border exclusion (xf<4 || xf>=w-5 || yf<4 || yf>h-4, :349)
    per_pix_th = np.zeros((h, w), np.float32)
    h32v = np.minimum(np.arange(h) // 32, ths_sm.shape[0] - 1)
    w32v = np.minimum(np.arange(w) // 32, ths_sm.shape[1] - 1)
    per_pix_th = ths_sm[h32v][:, w32v] * th_factor
    ok = gs > per_pix_th
    ok[:4, :] = False
    ok[h - 4 :, :] = False
    ok[:, :4] = False
    ok[:, w - 4 :] = False
    gv = np.where(ok, gs, -1.0)
    H, W = -(-h // pot), -(-w // pot)
    padded = np.full((H * pot, W * pot), -1.0, np.float32)
    padded[:h, :w] = gv
    cells = padded.reshape(H, pot, W, pot).transpose(0, 2, 1, 3).reshape(H, W, pot * pot)
    best = cells.argmax(-1)
    hit = cells.max(-1) > 0
    cy, cx = np.nonzero(hit)
    oy, ox = np.unravel_index(best[cy, cx], (pot, pot))
    return np.stack([cx * pot + ox, cy * pot + oy], axis=1).astype(np.int32)


def _dso_make_heat_maps(gs, ths_sm, num_want, pot, recursions_left):
    """makeHeatMaps (CvoPixelSelector.cpp:152-266): select at the current
    potential, then adapt it with DSO's ideal-potential model
    (selected-count ~ K/(pot+1)^2) and recurse while the yield is >1.25x or
    <0.25x the budget. Returns (uv, final potential).

    Faithfulness notes on the reference's own dead code: the multi-scale
    pyramid levels 1-2 of select() are commented out in the reference
    source (:374-395), setting_selectDirectionDistribution is false (:47)
    so the direction-random patterns never affect the ranking, and the
    quotia<0.95 random thinning (:245-263) zeroes map_out but does NOT
    filter output_uv — the wrapper consumes output_uv, so the thinning has
    no effect on the selected set. None of those paths are live behavior.
    """
    uv = _dso_select_pot(gs, ths_sm, pot)
    num_have = max(len(uv), 1)
    quotia = num_want / num_have
    ideal = int(np.sqrt(num_have * (pot + 1) ** 2 / num_want) - 1)
    ideal = max(ideal, 1)
    if recursions_left > 0 and quotia > 1.25 and pot > 1:
        if ideal >= pot:
            ideal = pot - 1
        return _dso_make_heat_maps(gs, ths_sm, num_want, ideal,
                                   recursions_left - 1)
    if recursions_left > 0 and quotia < 0.25:
        if ideal <= pot:
            ideal = pot + 1
        return _dso_make_heat_maps(gs, ths_sm, num_want, ideal,
                                   recursions_left - 1)
    return uv, pot


def dso_select_pixels(raw: RawImage, num_want: int):
    """The DSO semi-dense pixel selector, transcribed from the reference's
    dso_select_pixels wrapper (CvoPixelSelector.cpp:430-463): makeHeatMaps
    at potential 3 with 3 adaptation recursions; while too many points come
    back, retry at growing potentials (up to 5 tries); if fewer than 2/3 of
    the budget remain, back off two steps."""
    gs = raw.gradient_square
    ths_sm = _dso_block_thresholds(gs)
    uv, pot = _dso_make_heat_maps(gs, ths_sm, num_want, 3, 3)
    times = 1
    while len(uv) > num_want and times < 5:
        uv, pot = _dso_make_heat_maps(gs, ths_sm, num_want, 3 + times, 3)
        times += 1
    if len(uv) < num_want * 2 // 3:
        uv, pot = _dso_make_heat_maps(gs, ths_sm, num_want,
                                      max(3 + times - 2, 1), 3)
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
        return dso_select_pixels(raw, expected_points)
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
