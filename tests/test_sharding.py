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


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
