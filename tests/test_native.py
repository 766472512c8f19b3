"""Native C++ library tests (census/SGM stereo + voxel downsample)."""

import numpy as np
import pytest

from unified_cvo_tpu import native

# The session-scoped `native_built` fixture (conftest.py) builds the .so on
# demand and skips these tests when no toolchain exists.
pytestmark = pytest.mark.usefixtures("native_built")


def _textured(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 8, w // 8), np.uint8)
    return np.kron(base, np.ones((8, 8), np.uint8))


def test_native_sgm_constant_shift():
    left = _textured(240, 320)
    right = np.roll(left, -8, axis=1)
    disp = native.sgm_disparity(left, right, max_disp=32)
    core = disp[20:-20, 48:-16]
    valid = core[core > 0]
    assert len(valid) > 0.8 * core.size
    assert abs(np.median(valid) - 8.0) < 0.5


def test_native_sgm_matches_frontend_backend():
    from unified_cvo_tpu.frontend.stereo import compute_disparity

    left = _textured(120, 256, seed=5)
    right = np.roll(left, -12, axis=1)
    d_native = compute_disparity(left, right, max_disparity=32, backend="native")
    v = d_native[20:-20, 48:-16]
    v = v[v > 0]
    assert abs(np.median(v) - 12.0) < 1.0


def test_native_sgm_rejects_bad_args():
    with pytest.raises(RuntimeError):
        native.sgm_disparity(
            np.zeros((4, 4), np.uint8), np.zeros((4, 4), np.uint8), max_disp=512
        )


def test_native_voxel_downsample_matches_numpy():
    from unified_cvo_tpu.utils.voxel import voxel_downsample_indices as np_voxel

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
    got = np.sort(native.voxel_downsample_indices(xyz, 0.5))
    want = np.sort(np_voxel(xyz, 0.5))
    # same voxel set (representatives may differ only if hash collides; with
    # first-point-per-voxel semantics both pick the first in scan order)
    np.testing.assert_array_equal(got, want)
