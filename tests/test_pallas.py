"""Pallas fused kernels vs the blocked-jnp reference (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.ops import kernels
from unified_cvo_tpu.ops import pallas_kernels as pk
from unified_cvo_tpu.utils.pointcloud import make_pointcloud

from test_kernels import _random_clouds


@pytest.mark.parametrize(
    "flags",
    [
        dict(is_using_geometry=1),
        dict(is_using_geometry=1, is_using_intensity=1),
        dict(is_using_geometry=1, is_using_intensity=1, is_using_semantics=1,
             is_using_geometric_type=1),
        dict(is_using_geometry=1, is_using_range_ell=1),
    ],
)
def test_flow_stats_pallas_matches_jnp(flags, rng):
    p = CvoParams(sp_thres=0.002).replace(**flags)
    ell = jnp.float32(0.45)
    x, y, kw_x, kw_y = _random_clouds(
        rng, n=70, m=90,
        features="is_using_intensity" in flags,
        labels="is_using_semantics" in flags,
        geo=True,
    )
    pcx = make_pointcloud(x, bucket=8, **kw_x)
    pcy = make_pointcloud(y, bucket=8, **kw_y)
    ref = kernels.flow_stats(p, ell, pcx, pcy, chunk=16)
    got = pk.flow_stats_pallas(p, ell, pcx, pcy, tile_i=16, tile_j=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got.row_sum), np.asarray(ref.row_sum),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.row_wy), np.asarray(ref.row_wy),
                               rtol=1e-5, atol=1e-6)
    assert int(got.nonzeros) == int(ref.nonzeros)
    np.testing.assert_allclose(float(got.a_sum), float(ref.a_sum), rtol=1e-5)


@pytest.mark.parametrize("use_range_ell", [0, 1])
def test_step_coeffs_pallas_matches_jnp(use_range_ell, rng):
    p = CvoParams(sp_thres=0.002, is_using_range_ell=use_range_ell,
                  is_using_intensity=1)
    ell = jnp.float32(0.5)
    x, y, kw_x, kw_y = _random_clouds(rng, n=48, m=64, features=True)
    pcx = make_pointcloud(x, bucket=8, **kw_x)
    pcy = make_pointcloud(y, bucket=8, **kw_y)
    stats = kernels.flow_stats(p, ell, pcx, pcy, chunk=16)
    twist, _ = kernels.flow_from_stats(p, pcx, stats)
    ref = kernels.step_coeffs(p, ell, pcx, pcy, twist, chunk=16)
    got = pk.step_coeffs_pallas(p, ell, pcx, pcy, twist,
                                tile_i=16, tile_j=32, interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(float(g), float(r), rtol=2e-4, atol=1e-6)


def test_align_backend_pallas_interpret_matches_jnp(rng):
    from unified_cvo_tpu.models.align import align
    from test_align import _bunnyish_cloud

    xyz, feats = _bunnyish_cloud(rng, n=160)
    p = CvoParams(ell_init=0.5, is_using_intensity=1, max_step=0.05,
                  ell_decay_start=5, indicator_window_size=5,
                  indicator_stable_threshold=0.2)
    src = make_pointcloud(xyz, features=feats, bucket=64)
    T1, ret1, info1 = align(src, src, jnp.eye(4), p, max_iter=10, chunk=64,
                            backend="jnp")
    T2, ret2, info2 = align(src, src, jnp.eye(4), p, max_iter=10,
                            backend="pallas_interpret")
    assert int(info1.iterations) == int(info2.iterations)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-5)

def test_compact_tile_mask_partition(rng):
    mask = (rng.random((6, 8)) < 0.3).astype(np.int32)
    comp = pk.compact_tile_mask(jnp.asarray(mask))
    n = int(comp.n)
    flat = mask.reshape(-1)
    expect_n = max(int(flat.sum()), 1)
    assert n == expect_n
    pi = np.asarray(comp.pair_i)
    pj = np.asarray(comp.pair_j)
    first = np.asarray(comp.first)
    if flat.sum() > 0:
        active_flat = np.flatnonzero(flat)
        got_flat = pi[: n] * 8 + pj[: n]
        # actives first, original row-major order (stable partition)
        np.testing.assert_array_equal(got_flat, active_flat)
        # first flags mark the first pair of each source tile, actives only
        expect_first = np.concatenate([[1], (pi[1:n] != pi[: n - 1]).astype(int)])
        np.testing.assert_array_equal(first[:n], expect_first)
        assert first[n:].sum() == 0
    np.testing.assert_array_equal(np.asarray(comp.row_has), mask.any(axis=1))


def test_flow_stats_pallas_culled_mask_all_zero(rng):
    """All-culled mask: dynamic grid is clamped to one (gated) step and every
    output row is masked off."""
    p = CvoParams(sp_thres=0.002)
    x, y, kw_x, kw_y = _random_clouds(rng, n=40, m=40)
    pcx = make_pointcloud(x, bucket=8, **kw_x)
    pcy = make_pointcloud(y, bucket=8, **kw_y)
    from unified_cvo_tpu.ops.kernels import pad_cloud_to_multiple

    nI = pad_cloud_to_multiple(pcx, 8).capacity // 8
    nJ = pad_cloud_to_multiple(pcy, 16).capacity // 16
    mask = jnp.zeros((nI, nJ), jnp.int32)
    got = pk.flow_stats_pallas(p, jnp.float32(0.5), pcx, pcy, tile_i=8,
                               tile_j=16, tile_mask=mask, interpret=True)
    assert float(jnp.abs(got.row_sum).max()) == 0.0
    assert float(jnp.abs(got.row_wy).max()) == 0.0
    assert int(got.nonzeros) == 0
