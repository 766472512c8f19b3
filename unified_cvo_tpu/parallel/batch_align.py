"""Data-parallel batched frame-to-frame registration.

The embarrassing parallelism the reference never had (SURVEY.md §2.7): many
full alignments run simultaneously, one pair batch shard per device. The
per-pair while-loops are vmapped (JAX runs the loop until every lane
converges, masking finished lanes), and the batch axis shards over the mesh
with shard_map — frames/s scales with chip count.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.models.align import align
from unified_cvo_tpu.utils.pointcloud import PointCloud


def stack_pairs(sources: List[PointCloud], targets: List[PointCloud]):
    """Stack equal-capacity clouds into batched pytrees with a leading axis."""

    def cat(*xs):
        if any(x is None for x in xs):
            return None
        return jnp.stack(xs)

    src = jax.tree.map(cat, *sources, is_leaf=lambda x: x is None)
    tgt = jax.tree.map(cat, *targets, is_leaf=lambda x: x is None)
    return src, tgt


def make_batch_align(params: CvoParams, mesh: Optional[Mesh] = None,
                     axis: str = "dp", chunk: int = 1024,
                     max_iter: Optional[int] = None, backend: str = "auto"):
    """Returns jitted fn(src_batch, tgt_batch, init_batch[B,4,4]) ->
    (transforms [B,4,4], rets [B], iterations [B]).

    With a mesh, the batch shards over `axis` (pad B to a device multiple).
    """

    def one(src, tgt, init):
        T, ret, info = align(
            src, tgt, init, params, chunk=chunk, max_iter=max_iter,
            backend=backend,
        )
        return T, ret, info.iterations

    batched = jax.vmap(one)
    if mesh is None:
        return jax.jit(batched)

    @jax.jit
    def sharded(src_b, tgt_b, init_b):
        def spec(pc):
            return jax.tree.map(lambda a: P(*((axis,) + (None,) * (a.ndim - 1))), pc)

        fn = jax.shard_map(
            batched,
            mesh=mesh,
            in_specs=(spec(src_b), spec(tgt_b), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
        return fn(src_b, tgt_b, init_b)

    return sharded
