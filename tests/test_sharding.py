"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.parallel.sharded import (
    _align_iteration_local,
    make_batched_align_step,
)


def _pair(seed, n=128):
    import __graft_entry__ as ge

    return ge._synthetic_pair(n=n, m=n, seed=seed)


@pytest.fixture(scope="module")
def params():
    return CvoParams(ell_init=0.5, is_using_intensity=1, max_step=0.05)


def test_sharded_step_matches_single_device(params):
    """The (dp=4, sp=2) sharded step must reproduce the single-device
    iteration bit-for-bit-ish on every pair in the batch."""
    devices = jax.devices()[:8]
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices).reshape(4, 2), ("dp", "sp"))
    step_fn = make_batched_align_step(params, mesh)

    pairs = [_pair(seed) for seed in range(4)]
    src_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in pairs])
    tgt_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[1] for p in pairs])
    B = 4
    R_b = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
    T_b = jnp.zeros((B, 3), jnp.float32)
    ell_b = jnp.full((B,), 0.5, jnp.float32)

    R_new, T_new, metrics = step_fn(src_b, tgt_b, R_b, T_b, ell_b)

    for b in range(B):
        R1, T1, m1 = _align_iteration_local(
            params, None, pairs[b][0], pairs[b][1],
            jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32),
            jnp.float32(0.5),
        )
        np.testing.assert_allclose(np.asarray(R_new[b]), np.asarray(R1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T_new[b]), np.asarray(T1), atol=1e-5)
        np.testing.assert_allclose(
            float(metrics["inner_product"][b]), float(m1["inner_product"]), rtol=1e-4
        )
        assert int(metrics["nonzeros"][b]) == int(m1["nonzeros"])


def test_sharded_full_irls_matches_device_engine(rng):
    """The complete sharded IRLS schedule (edge-sharded moments + psum'd GN
    inside one mesh while_loop, frame-sharded clouds at rest) must
    reproduce the single-device on-device solver's result."""
    from unified_cvo_tpu.models import irls
    from unified_cvo_tpu.ops import lie
    from unified_cvo_tpu.parallel.sharded_irls import (
        make_sharded_irls_solver, pad_edges, pad_frames)

    devices = jax.devices()[:8]
    assert len(devices) == 8
    F, n = 5, 256
    base = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(-1, 1, n)],
        axis=1).astype(np.float32)
    from unified_cvo_tpu.utils.pointcloud import make_pointcloud

    clouds, init = [], []
    for f in range(F):
        xi = 0.06 * rng.normal(size=6).astype(np.float32)
        R, t = (np.asarray(v) for v in lie.se3_exp(jnp.asarray(xi), 1.0))
        if f == 0:
            R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        clouds.append(make_pointcloud(((base - t) @ R).astype(np.float32),
                                      bucket=n))
        init.append(np.eye(3, 4, dtype=np.float32))
    stacked = irls.stack_clouds(clouds)
    init = np.stack(init)
    edges = [(i, j) for i in range(F) for j in range(i + 1, F)]
    pivots = [True] + [False] * (F - 1)
    p = CvoParams(ell_init=0.5, multiframe_ell_init=0.5,
                  multiframe_ell_min=0.15, multiframe_ell_decay_rate=0.8,
                  multiframe_iterations_per_ell=3,
                  multiframe_iterations_per_solve=4,
                  multiframe_min_nonzeros=10, multiframe_max_iters=40)

    ref_poses, hist = irls.irls_solve(
        stacked, init, edges, pivots, p, chunk=256, engine="device",
        backend="dense")

    mesh = Mesh(np.asarray(devices), ("dp",))
    solver = make_sharded_irls_solver(p, mesh, chunk=256, frame_sharded=True)
    ei, ej, valid = pad_edges(
        np.asarray([e[0] for e in edges], np.int32),
        np.asarray([e[1] for e in edges], np.int32), 8)
    poses_sh, info = solver(
        pad_frames(stacked, 8), jnp.asarray(init),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(valid),
        jnp.asarray(np.asarray(pivots, np.float32)))
    # identical schedule decisions; f32 reduction order differs (psum over
    # edge shards vs one-device sums)
    assert int(info["it"]) == hist[0]["iter"]
    np.testing.assert_allclose(float(info["ell"]), hist[0]["ell"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(poses_sh), np.asarray(ref_poses), atol=5e-4)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
