"""Distributed multiframe BA: edges sharded across the mesh, psum'd GN.

The multi-host design from SURVEY.md §2.7 / BASELINE north star: the
co-visibility graph's *edges* (the expensive kernel-moment computations) are
sharded across devices; every device reduces its edge shard into partial
6F x 6F Hessian blocks; one `psum` over the edge axis yields the replicated
reduced system, which every device solves identically (F is small). Poses
stay replicated. Collectives ride ICI only — per GN inner iteration the
traffic is one psum of (6F)^2 + 6F floats, independent of point count.

Two entry points:
  * make_sharded_ba_step — one outer iteration at a fixed ell (moments ->
    gate -> n GN iterations). The building block, kept for elasticity
    re-sharding and benchmarking.
  * make_sharded_irls_solver — the FULL IRLS schedule (moments -> gate ->
    GN -> nonzeros-plateau ell decay -> converge, reference CvoBatchIRLS
    IRLS.cpp:77-215) inside one jitted lax.while_loop inside the mesh
    program. Schedule state (ell, it, done, last_nz) is driven by psum'd
    totals, so every device takes identical branches.

Cloud placement: replicated by default. With frame_sharded=True the stacked
clouds live frame-sharded across the mesh at rest (HBM per device scales as
F/n_devices) and are all_gather'd once per outer iteration for the moment
pass — the gathered copy is transient. Streaming the gather through the
edge shard (ring exchange) is the next scaling rung.

The GN assembly reuses irls._assemble_system / _solve_and_update — the
exact single-device math with one psum spliced between the halves.
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


def pad_frames(clouds: PointCloud, n_devices: int) -> PointCloud:
    """Pad the stacked-cloud frame axis to a device multiple with empty
    (mask=0) frames, for frame-sharded placement. Padding frames are never
    referenced by any edge."""
    F = clouds.xyz.shape[0]
    Fp = ((F + n_devices - 1) // n_devices) * n_devices
    if Fp == F:
        return clouds
    extra = Fp - F

    def pad(a):
        if a is None:
            return None
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0)

    return jax.tree.map(pad, clouds)


def _local_moments(params, chunk, clouds, poses, edge_i, edge_j, ell):
    """vmapped dense edge moments over the local edge shard."""

    def one(args):
        ei, ej = args
        c1 = jax.tree.map(lambda a: a[ei] if a is not None else None, clouds)
        c2 = jax.tree.map(lambda a: a[ej] if a is not None else None, clouds)
        return irls._edge_moments_single(
            params, ell, c1, c2, poses[ei], poses[ej], chunk)

    return jax.vmap(one)((edge_i, edge_j))


def _gather_clouds(clouds, axis, frame_sharded):
    if not frame_sharded:
        return clouds
    return jax.tree.map(
        lambda a: None if a is None else lax.all_gather(a, axis, axis=0,
                                                        tiled=True),
        clouds)


def _cloud_specs(clouds, axis, frame_sharded):
    spec = P(axis) if frame_sharded else P()
    return jax.tree.map(lambda a: spec, clouds)


def make_sharded_ba_step(params: CvoParams, mesh: Mesh, axis: str = "dp",
                         chunk: int = 512, n_gn_iters: int = 4,
                         frame_sharded: bool = False):
    """Jitted sharded step: (clouds, poses, edge lists, ell) -> updated poses.

    One outer iteration at fixed ell. Edges shard over `axis`; clouds are
    replicated (or frame-sharded at rest with frame_sharded=True). The
    elasticity contract: edges are stateless shards, so the same edge list
    re-padded with pad_edges continues on any surviving device count."""

    def local(clouds, poses, edge_i, edge_j, edge_valid, pivot_mask, ell):
        clouds = _gather_clouds(clouds, axis, frame_sharded)
        mom = _local_moments(params, chunk, clouds, poses, edge_i, edge_j, ell)
        total_nz = lax.psum(
            jnp.sum(jnp.where(edge_valid, mom.nonzeros, 0)), axis)
        edge_active = edge_valid & (mom.nonzeros > params.multiframe_min_nonzeros)

        def gn_body(poses_c, _):
            H, b, cost = irls._assemble_system(
                poses_c, edge_i, edge_j, mom, edge_active)
            # the one collective: reduce the tiny system over the edge shards
            H, b, cost = lax.psum((H, b, cost), axis)
            poses_new, _ = irls._solve_and_update(
                poses_c, H, b, pivot_mask, 1e-6)
            return poses_new, cost

        poses_new, costs = lax.scan(gn_body, poses, None, length=n_gn_iters)
        return poses_new, costs[-1], total_nz

    @functools.partial(jax.jit, static_argnames=())
    def step(clouds, poses, edge_i, edge_j, edge_valid, pivot_mask, ell):
        # recenter the world at the mean frame translation so the f32 moment
        # contractions keep residual-scale accuracy (see irls_solve)
        world_center = jnp.mean(poses[:, :, 3], axis=0)
        poses = poses.at[:, :, 3].add(-world_center)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(_cloud_specs(clouds, axis, frame_sharded), P(),
                      P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        poses_new, cost, nz = fn(
            clouds, poses, edge_i, edge_j, edge_valid, pivot_mask, ell
        )
        return poses_new.at[:, :, 3].add(world_center), cost, nz

    return step


def make_sharded_irls_solver(params: CvoParams, mesh: Mesh, axis: str = "dp",
                             chunk: int = 512, translation_only: bool = False,
                             frame_sharded: bool = False):
    """The COMPLETE IRLS schedule inside the edge-sharded mesh program.

    solve(clouds, init_poses [F,3,4], edge_i, edge_j, edge_valid,
          pivot_mask [F], ell0=None)
      -> (poses [F,3,4], info {ell, it, cost, nonzeros})

    Mirrors models/irls.make_irls_solver's on-device outer loop (the
    CvoBatchIRLS schedule, IRLS.cpp:77-215) with the moment pass and GN
    assembly sharded over edges. ell0 overrides the schedule's starting
    lengthscale — the elastic-restart hook: a solve interrupted by device
    loss resumes on a smaller mesh from (poses, ell) where it stopped.
    """
    dof_mask = (
        jnp.asarray([0, 0, 0, 1, 1, 1], jnp.float32) if translation_only else None
    )
    f32 = jnp.float32
    n_solve = int(params.multiframe_iterations_per_solve)

    def local(clouds, poses0, edge_i, edge_j, edge_valid, pivot_mask, ell0):
        clouds = _gather_clouds(clouds, axis, frame_sharded)

        def gn_fn(poses, mom, edge_active):
            def gn_body(carry, _):
                poses_c, _ = carry
                H, b, cost = irls._assemble_system(
                    poses_c, edge_i, edge_j, mom, edge_active)
                H, b, cost = lax.psum((H, b, cost), axis)
                poses_new, _ = irls._solve_and_update(
                    poses_c, H, b, pivot_mask, 1e-6, dof_mask=dof_mask)
                return (poses_new, cost), None

            (poses, cost), _ = lax.scan(
                gn_body, (poses, jnp.zeros((), f32)), None, length=n_solve)
            return poses, cost

        def cond(c):
            return jnp.logical_not(c["done"])

        def body(c):
            mom = _local_moments(
                params, chunk, clouds, c["poses"], edge_i, edge_j, c["ell"])
            nz = jnp.where(edge_valid, mom.nonzeros, 0)
            edge_active = edge_valid & (nz > params.multiframe_min_nonzeros)
            total = lax.psum(jnp.sum(nz), axis)
            any_active = lax.psum(
                jnp.sum(edge_active.astype(jnp.int32)), axis) > 0
            stop_now = (~any_active) | (c["it"] >= params.multiframe_max_iters)
            do_solve = (total > c["last_nz"]) | (
                c["it"] < params.multiframe_iterations_per_ell)

            poses_new, cost = lax.cond(
                do_solve & ~stop_now,
                lambda p: gn_fn(p, mom, edge_active),
                lambda p: (p, c["cost"]), c["poses"])
            can_decay = c["ell"] >= params.multiframe_ell_min
            decay_now = ~stop_now & ~do_solve & can_decay
            ell_new = jnp.where(
                decay_now, c["ell"] * params.multiframe_ell_decay_rate,
                c["ell"])
            last_new = jnp.where(
                ~stop_now & do_solve, total.astype(jnp.int32),
                jnp.where(decay_now, 0, c["last_nz"]))
            done = stop_now | (~do_solve & ~can_decay)
            return {
                "poses": poses_new, "ell": ell_new,
                "last_nz": last_new, "it": c["it"] + 1,
                "done": done, "cost": cost,
                "nonzeros": total.astype(jnp.int32),
            }

        init = {
            "poses": poses0, "ell": ell0,
            "last_nz": jnp.zeros((), jnp.int32), "it": jnp.zeros((), jnp.int32),
            "done": jnp.zeros((), bool), "cost": jnp.zeros((), f32),
            "nonzeros": jnp.zeros((), jnp.int32),
        }
        final = lax.while_loop(cond, body, init)
        info = {k: final[k] for k in ("ell", "it", "cost", "nonzeros")}
        return final["poses"], info

    @functools.partial(jax.jit, static_argnames=())
    def solve(clouds, init_poses, edge_i, edge_j, edge_valid, pivot_mask,
              ell0=None):
        poses0 = jnp.asarray(init_poses, f32)
        world_center = jnp.mean(poses0[:, :, 3], axis=0)
        poses0 = poses0.at[:, :, 3].add(-world_center)
        if ell0 is None:
            ell0 = jnp.asarray(params.multiframe_ell_init, f32)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(_cloud_specs(clouds, axis, frame_sharded), P(),
                      P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), {k: P() for k in ("ell", "it", "cost", "nonzeros")}),
            check_vma=False,
        )
        poses, info = fn(clouds, poses0, edge_i, edge_j, edge_valid,
                         pivot_mask, jnp.asarray(ell0, f32))
        return poses.at[:, :, 3].add(world_center), info

    return solve
