"""Bunny-random multiframe BA fixture — the cvo_irls_rand_pcd twin.

Usage:
    python -m unified_cvo_tpu.apps.irls_bunny [PCD_FILE] [NUM_FRAMES] [SIGMA]

Mirrors src/experiments/main_multi_frame_irls_bunny_random.cpp: take one
cloud (a PCD file, or a synthetic bunny-ish shape if omitted), express it in
NUM_FRAMES frames with random SE(3) offsets (twist std SIGMA), initialize
all poses at identity, and let multiframe IRLS pull the frames back onto the
ground-truth configuration. Prints per-frame pose error before/after.
"""

from __future__ import annotations

import sys

import numpy as np

import jax.numpy as jnp

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.models import irls
from unified_cvo_tpu.ops import lie
from unified_cvo_tpu.utils.pointcloud import make_pointcloud


def synthetic_bunny(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    sph = rng.normal(size=(n // 2, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    box = rng.uniform(-1, 1, size=(n - n // 2, 3)) * np.array([1.5, 0.2, 1.0])
    return np.concatenate([sph, box]).astype(np.float32)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    pcd_file = argv[0] if argv else None
    F = int(argv[1]) if len(argv) > 1 else 5
    sigma = float(argv[2]) if len(argv) > 2 else 0.1

    if pcd_file and pcd_file != "-":
        from unified_cvo_tpu.datasets.pcd import read_pcd

        base, _ = read_pcd(pcd_file)
    else:
        base = synthetic_bunny()
    print(f"base cloud: {len(base)} points, {F} frames, twist sigma {sigma}")

    rng = np.random.default_rng(42)
    clouds = [make_pointcloud(base, bucket=256)]
    true_poses = [np.eye(3, 4, dtype=np.float32)]
    for _ in range(1, F):
        xi = sigma * rng.normal(size=6).astype(np.float32)
        R, t = (np.asarray(v) for v in lie.se3_exp(jnp.asarray(xi), 1.0))
        clouds.append(make_pointcloud(((base - t) @ R).astype(np.float32), bucket=256))
        true_poses.append(np.hstack([R, t[:, None]]).astype(np.float32))

    stacked = irls.stack_clouds(clouds)
    init = np.tile(np.eye(3, 4, dtype=np.float32), (F, 1, 1))
    edges = [(i, j) for i in range(F) for j in range(i + 1, F)]
    params = CvoParams(
        sp_thres=0.002,
        multiframe_ell_init=max(0.5, 3 * sigma),
        multiframe_ell_min=0.05,
        multiframe_ell_decay_rate=0.7,
        multiframe_iterations_per_ell=3,
        multiframe_iterations_per_solve=6,
        multiframe_min_nonzeros=20,
        multiframe_max_iters=80,
    )

    def err(poses):
        out = []
        for f in range(F):
            dR = poses[f][:, :3].T @ true_poses[f][:, :3]
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            out.append((ang, np.linalg.norm(poses[f][:, 3] - true_poses[f][:, 3])))
        return out

    print("before:", [f"({a:.4f} rad, {t:.4f} m)" for a, t in err(init)])
    poses, hist = irls.irls_solve(
        stacked, init, edges, [True] + [False] * (F - 1), params,
        chunk=stacked.xyz.shape[1], log=print,
    )
    after = err(poses)
    print("after: ", [f"({a:.4f} rad, {t:.4f} m)" for a, t in after])
    worst = max(max(a, t) for a, t in after)
    print(f"worst residual error: {worst:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
