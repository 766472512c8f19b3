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
