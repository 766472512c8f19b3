"""Elastic recovery of the distributed BA (SURVEY §5 failure handling).

The reference has no restart/elasticity; the multi-host design here
tolerates device loss by construction: edges are stateless shards
(pad_edges re-partitions the same edge list onto any device count) and
poses are replicated, so after losing devices the solve continues from
the current poses on a smaller mesh. This test runs BA steps on an
8-device mesh, "loses" half the devices, re-shards, continues on 4, and
checks the solution keeps improving to the same optimum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.models import irls
from unified_cvo_tpu.ops import lie
from unified_cvo_tpu.parallel.sharded_irls import make_sharded_ba_step, pad_edges
from unified_cvo_tpu.utils.pointcloud import make_pointcloud


def _setup(rng, F=4, n=256):
    base = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(-1, 1, n)],
        axis=1,
    ).astype(np.float32)
    clouds, true_poses = [], []
    for f in range(F):
        xi = 0.08 * rng.normal(size=6).astype(np.float32)
        R, t = (np.asarray(v) for v in lie.se3_exp(jnp.asarray(xi), 1.0))
        if f == 0:
            R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        true_poses.append(np.concatenate([R, t[:, None]], 1).astype(np.float32))
        clouds.append(make_pointcloud(((base - t) @ R).astype(np.float32),
                                      bucket=n))
    stacked = irls.stack_clouds(clouds)
    edges = [(i, j) for i in range(F) for j in range(i + 1, F)]
    return stacked, true_poses, edges


def _pose_err(poses, true_poses):
    errs = []
    for f in range(len(true_poses)):
        E_R = np.asarray(poses[f][:, :3]).T @ true_poses[f][:, :3]
        E_t = true_poses[f][:, 3] - np.asarray(poses[f][:, 3])
        errs.append(float(np.linalg.norm(
            np.asarray(lie.se3_log(jnp.asarray(E_R), jnp.asarray(E_t))))))
    return max(errs)


def test_ba_survives_device_loss(rng):
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    stacked, true_poses, edges = _setup(rng)
    F = len(true_poses)
    pivot = jnp.asarray(np.array([1.0] + [0.0] * (F - 1), np.float32))
    params = CvoParams(ell_init=0.6, multiframe_ell_init=0.6,
                       multiframe_min_nonzeros=10)
    poses = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32), (F, 1, 1)))
    err0 = _pose_err(poses, true_poses)

    def run_steps(device_subset, poses, ells):
        mesh = Mesh(np.asarray(device_subset), ("dp",))
        step = make_sharded_ba_step(params, mesh, chunk=256, n_gn_iters=3)
        ei, ej, valid = pad_edges(
            np.asarray([e[0] for e in edges], np.int32),
            np.asarray([e[1] for e in edges], np.int32),
            len(device_subset),
        )
        for ell in ells:
            poses, cost, nz = step(
                stacked, poses, jnp.asarray(ei), jnp.asarray(ej),
                jnp.asarray(valid), pivot, jnp.float32(ell))
        return poses

    # phase 1: 8 devices, start of the ell schedule
    poses = run_steps(devices[:8], poses, [0.6, 0.6])
    err1 = _pose_err(poses, true_poses)
    assert err1 < err0, (err1, err0)

    # device loss: re-place the carried state on the surviving devices
    # (what a real failover does via the checkpointed poses) and continue
    # with the remaining ell schedule
    poses = jax.device_put(np.asarray(poses))
    poses = run_steps(devices[:4], poses, [0.5, 0.4, 0.3, 0.2, 0.15, 0.1])
    err2 = _pose_err(poses, true_poses)
    assert err2 < err1, (err2, err1)
    assert err2 < 0.02, err2


def test_full_sharded_solver_survives_device_loss(rng):
    """Elasticity through the COMPLETE sharded IRLS schedule: a solve
    interrupted mid-schedule (multiframe_max_iters cap standing in for a
    failure) resumes on half the devices from its (poses, ell) state via
    the solver's ell0 restart hook, and reaches the optimum."""
    from unified_cvo_tpu.parallel.sharded_irls import (
        make_sharded_irls_solver, pad_frames)

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    stacked, true_poses, edges = _setup(rng)
    F = len(true_poses)
    pivot = jnp.asarray(np.array([1.0] + [0.0] * (F - 1), np.float32))
    base = CvoParams(ell_init=0.6, multiframe_ell_init=0.6,
                     multiframe_ell_min=0.1, multiframe_ell_decay_rate=0.8,
                     multiframe_iterations_per_ell=2,
                     multiframe_iterations_per_solve=3,
                     multiframe_min_nonzeros=10)
    poses = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32), (F, 1, 1)))
    err0 = _pose_err(poses, true_poses)

    def run(device_subset, params, poses, ell0=None):
        mesh = Mesh(np.asarray(device_subset), ("dp",))
        solver = make_sharded_irls_solver(params, mesh, chunk=256,
                                          frame_sharded=True)
        ei, ej, valid = pad_edges(
            np.asarray([e[0] for e in edges], np.int32),
            np.asarray([e[1] for e in edges], np.int32),
            len(device_subset),
        )
        return solver(
            pad_frames(stacked, len(device_subset)), poses,
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(valid), pivot,
            **({} if ell0 is None else {"ell0": jnp.float32(ell0)}))

    # phase 1: 8 devices, schedule interrupted after 4 outer iterations
    poses, info1 = run(devices[:8], base.replace(multiframe_max_iters=4), poses)
    err1 = _pose_err(np.asarray(poses), true_poses)
    assert int(info1["it"]) >= 4  # capped schedule stopped early
    assert err1 < err0, (err1, err0)

    # phase 2: continue on 4 devices from (poses, ell) where it stopped
    poses = jax.device_put(np.asarray(poses))
    poses, info2 = run(devices[:4], base.replace(multiframe_max_iters=40),
                       poses, ell0=float(info1["ell"]))
    err2 = _pose_err(np.asarray(poses), true_poses)
    assert float(info2["ell"]) < float(info1["ell"])
    assert err2 < err1, (err2, err1)
    assert err2 < 0.02, err2
