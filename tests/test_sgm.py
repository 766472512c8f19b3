"""Device census/SGM stereo (ops/sgm.py) vs the native AVX2 oracle.

The native matcher (native/cvo_native.cpp) is the transcription source;
agreement is gated with tolerance because the device speckle pass is a
density test rather than the native connected-component fill (module
docstring deviation note).
"""

import numpy as np
import pytest

from unified_cvo_tpu.ops import sgm


def _textured(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 8, w // 8), np.uint8)
    return np.kron(base, np.ones((8, 8), np.uint8))


def test_census_matches_oracle():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (12, 16), np.uint8)
    got = np.asarray(sgm.census_5x5(img))
    h, w = img.shape
    for y, x in [(0, 0), (5, 7), (11, 15), (2, 14)]:
        sig = 0
        c = int(img[y, x])
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                if dy == 0 and dx == 0:
                    continue
                yy = min(max(y + dy, 0), h - 1)
                xx = min(max(x + dx, 0), w - 1)
                sig = (sig << 1) | (1 if int(img[yy, xx]) < c else 0)
        assert int(got[y, x]) == sig, (y, x)


def test_device_sgm_constant_shift():
    left = _textured(240, 320)
    right = np.roll(left, -8, axis=1)
    disp = np.asarray(sgm.sgm_disparity_device(left, right, max_disp=32))
    core = disp[20:-20, 48:-16]
    valid = core[core > 0]
    assert len(valid) > 0.8 * core.size
    assert abs(np.median(valid) - 8.0) < 0.5


@pytest.mark.usefixtures("native_built")
def test_device_sgm_matches_native():
    """EPE parity vs the native oracle on a rendered two-plane scene."""
    from unified_cvo_tpu import native
    from unified_cvo_tpu.frontend.calibration import Calibration
    from unified_cvo_tpu.utils import synth

    K = np.array([[200.0, 0, 128.0], [0, 200.0, 80.0], [0, 0, 1]], np.float32)
    calib = Calibration(K, baseline=0.5, cols=256, rows=160)
    scene = synth.corridor_scene(seed=7)
    left, right, _ = synth.render_stereo(scene, calib, np.eye(4))

    def gray(im):
        return (0.299 * im[..., 2] + 0.587 * im[..., 1]
                + 0.114 * im[..., 0]).astype(np.uint8) if im.ndim == 3 else im

    lg, rg = gray(left), gray(right)
    d_dev = np.asarray(sgm.sgm_disparity_device(lg, rg, max_disp=64))
    d_nat = native.sgm_disparity(lg, rg, max_disp=64)
    both = (d_dev > 0) & (d_nat > 0)
    assert both.mean() > 0.5, "too few co-valid pixels"
    diff = np.abs(d_dev[both] - d_nat[both])
    # within-1px agreement on nearly all co-valid pixels; the residual is
    # uniqueness/speckle borderline pixels
    assert (diff <= 1.0).mean() > 0.95, (diff.mean(), (diff <= 1.0).mean())
    assert diff.mean() < 0.35, diff.mean()
    # neither matcher may invalidate wildly more than the other
    assert abs((d_dev > 0).mean() - (d_nat > 0).mean()) < 0.15
