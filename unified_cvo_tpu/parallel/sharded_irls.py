"""Distributed multiframe BA: edges sharded across the mesh, psum'd GN.

The multi-host design from SURVEY.md §2.7 / BASELINE north star: the
co-visibility graph's *edges* (the expensive kernel-moment computations) are
sharded across devices; every device reduces its edge shard into partial
6F x 6F Hessian blocks; one `psum` over the edge axis yields the replicated
reduced system, which every device solves identically (F is small). Poses
stay replicated. Collectives ride ICI only — per GN outer iteration the
traffic is one psum of (6F)^2 + 6F floats, independent of point count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.models import irls
from unified_cvo_tpu.utils.pointcloud import PointCloud


def pad_edges(edge_i, edge_j, n_devices):
    """Pad the edge list to a device multiple; padding edges are (0,0) with
    active=False."""
    E = len(edge_i)
    Ep = ((E + n_devices - 1) // n_devices) * n_devices
    pad = Ep - E
    ei = np.concatenate([edge_i, np.zeros(pad, np.int32)])
    ej = np.concatenate([edge_j, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])
    return ei.astype(np.int32), ej.astype(np.int32), valid


def make_sharded_ba_step(params: CvoParams, mesh: Mesh, axis: str = "dp",
                         chunk: int = 512, n_gn_iters: int = 4):
    """Jitted sharded step: (clouds, poses, edge lists, ell) -> updated poses.

    clouds are replicated (each frame's points live on every device — frame
    sharding with ring exchange is the next scaling rung); edges shard over
    `axis`.
    """

    def local(clouds, poses, edge_i, edge_j, edge_valid, pivot_mask, ell):
        def one(ei, ej):
            c1 = jax.tree.map(lambda a: a[ei] if a is not None else None, clouds)
            c2 = jax.tree.map(lambda a: a[ej] if a is not None else None, clouds)
            return irls._edge_moments_single(
                params, ell, c1, c2, poses[ei], poses[ej], chunk
            )

        mom = jax.vmap(one)(edge_i, edge_j)
        nz_local = jnp.sum(
            jnp.where(edge_valid, mom.nonzeros, 0)
        )
        total_nz = lax.psum(nz_local, axis)

        edge_active = edge_valid & (mom.nonzeros > params.multiframe_min_nonzeros)

        def gn_body(carry, _):
            poses_c = carry
            F = poses_c.shape[0]
            T1 = poses_c[edge_i]
            T2 = poses_c[edge_j]
            blocks = jax.vmap(irls._edge_blocks)(mom.P11, mom.P12, mom.P22, T1, T2)
            H_aa, H_bb, H_ab, b_a, b_b, costs = blocks
            w = edge_active.astype(poses_c.dtype)
            H = jnp.zeros((F, 6, F, 6), poses_c.dtype)
            H = H.at[edge_i, :, edge_i, :].add(H_aa * w[:, None, None])
            H = H.at[edge_j, :, edge_j, :].add(H_bb * w[:, None, None])
            H = H.at[edge_i, :, edge_j, :].add(H_ab * w[:, None, None])
            H = H.at[edge_j, :, edge_i, :].add(
                jnp.swapaxes(H_ab, -1, -2) * w[:, None, None]
            )
            b = jnp.zeros((F, 6), poses_c.dtype)
            b = b.at[edge_i].add(b_a * w[:, None])
            b = b.at[edge_j].add(b_b * w[:, None])
            # the one collective: reduce the tiny system over the edge shards
            H = lax.psum(H, axis)
            b = lax.psum(b, axis)
            cost = lax.psum(jnp.sum(costs * w), axis)

            free = 1.0 - pivot_mask.astype(poses_c.dtype)
            free6 = jnp.repeat(free, 6)
            Hd = H.reshape(6 * F, 6 * F) * free6[:, None] * free6[None, :]
            Hd = Hd + jnp.diag(jnp.where(free6 > 0, 1e-6, 1.0))
            bd = b.reshape(6 * F) * free6
            delta = jnp.linalg.solve(Hd, -bd).reshape(F, 6) * free[:, None]
            from unified_cvo_tpu.ops import lie

            dR, dt = lie.se3_exp(delta, 1.0)
            R_new = dR @ poses_c[:, :, :3]
            t_new = jnp.einsum("fij,fj->fi", dR, poses_c[:, :, 3]) + dt
            return jnp.concatenate([R_new, t_new[:, :, None]], axis=-1), cost

        poses_new, costs = lax.scan(gn_body, poses, None, length=n_gn_iters)
        return poses_new, costs[-1], total_nz

    @functools.partial(jax.jit, static_argnames=())
    def step(clouds, poses, edge_i, edge_j, edge_valid, pivot_mask, ell):
        # recenter the world at the mean frame translation so the f32 moment
        # contractions keep residual-scale accuracy (see irls_solve)
        world_center = jnp.mean(poses[:, :, 3], axis=0)
        poses = poses.at[:, :, 3].add(-world_center)
        cloud_specs = jax.tree.map(lambda a: P(), clouds)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(cloud_specs, P(), P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        poses_new, cost, nz = fn(
            clouds, poses, edge_i, edge_j, edge_valid, pivot_mask, ell
        )
        return poses_new.at[:, :, 3].add(world_center), cost, nz

    return step
