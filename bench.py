"""Headline benchmark: frame-to-frame CVO registration throughput on TPU.

Prints ONE JSON line:
  {"metric": "f2f_registration_fps", "value": N, "unit": "frames/s",
   "vs_baseline": R}

Workload: one full pairwise registration (kernel + flow + quartic step +
lengthscale schedule to convergence inside a single jitted while-loop) on a
KITTI-scale synthetic stereo frame pair (16384 x 16384 points, geometric
KITTI preset cvo_geometric_params_img_gpu0.yaml with a constant-velocity-like
initial guess — the hot path of the reference's cvo_align_gpu_img driver,
main_cvo_gpu_align_raw_image.cpp:73-163).

Baseline: the reference CUDA CvoGPU registers a KITTI stereo frame pair in
~0.5 s on its desktop GPU ("Average registration time", printed by
main_cvo_gpu_align_raw_image.cpp:165; repo stores no numbers — BASELINE.md),
i.e. ~2 frames/s. vs_baseline = fps / 2.0.

Supplementary numbers go to stderr so stdout stays a single JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_kitti_pair(n=16384, seed=0):
    """Structured outdoor scene: ground plane, two walls, posts; ~55 m range
    (mimicking the reference's stereo point selection envelope,
    CvoPointCloud.cpp:39-57)."""
    rng = np.random.default_rng(seed)
    k = n // 4
    ground = np.stack(
        [rng.uniform(-12, 12, k), rng.uniform(-1.75, -1.6, k), rng.uniform(2, 55, k)],
        axis=1,
    )
    wall_l = np.stack(
        [rng.uniform(-10, -8, k), rng.uniform(-1.5, 3.0, k), rng.uniform(2, 55, k)],
        axis=1,
    )
    wall_r = np.stack(
        [rng.uniform(7, 9, k), rng.uniform(-1.5, 3.0, k), rng.uniform(2, 55, k)],
        axis=1,
    )
    m = n - 3 * k
    posts = np.stack(
        [rng.uniform(-8, 8, m), rng.uniform(-1.5, 2.5, m), rng.uniform(2, 40, m)],
        axis=1,
    )
    xyz = np.concatenate([ground, wall_l, wall_r, posts]).astype(np.float32)
    xyz += rng.normal(scale=0.01, size=xyz.shape).astype(np.float32)
    return xyz


def main():
    import jax
    import jax.numpy as jnp

    from unified_cvo_tpu.config import read_cvo_params_yaml
    from unified_cvo_tpu.models.align import align
    from unified_cvo_tpu.ops import lie
    from unified_cvo_tpu.utils.pointcloud import make_pointcloud

    n = int(os.environ.get("BENCH_N", 16384))
    log(f"devices: {jax.devices()}")
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml"
    )

    xyz = synthetic_kitti_pair(n)
    # frame-to-frame motion: ~1.0 m forward + small yaw (KITTI @ 10 Hz)
    xi_true = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    R_m, t_m = lie.se3_exp(jnp.asarray(xi_true), 1.0)
    xyz2 = np.asarray(xyz @ np.asarray(R_m).T + np.asarray(t_m))

    src = make_pointcloud(xyz, bucket=n)
    tgt = make_pointcloud(xyz2, bucket=n)
    # constant-velocity init guess (the driver feeds the previous relative
    # motion, main_cvo_gpu_align_raw_image.cpp:125): perturb the truth a bit
    xi_guess = xi_true + 0.3 * np.array(
        [0.002, -0.003, 0.002, 0.02, -0.02, 0.08], np.float32
    )
    Rg, tg = lie.se3_exp(jnp.asarray(xi_guess), 1.0)
    init_guess = np.asarray(lie.rt_to_mat44(Rg, tg))

    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    # Hard iteration cap: an unbounded while_loop dispatched to the TPU
    # cannot be cancelled and would hold the chip for minutes.
    max_iter = int(os.environ.get("BENCH_MAX_ITER", 1500))

    def run():
        T, ret, info = align(
            src, tgt, jnp.asarray(init_guess), params, chunk=chunk,
            max_iter=max_iter, backend=backend,
        )
        jax.block_until_ready(T)
        return np.asarray(T), int(ret), info

    t0 = time.time()
    T, ret, info = run()  # includes compile
    log(f"warmup (with compile): {time.time()-t0:.2f}s, iters={int(info.iterations)}")

    times = []
    for rep in range(3):
        t0 = time.time()
        T, ret, info = run()
        times.append(time.time() - t0)
    t_frame = min(times)
    iters = int(info.iterations)
    log(f"align: {t_frame*1e3:.1f} ms, {iters} iters, "
        f"{t_frame/max(iters,1)*1e3:.2f} ms/iter, ell={float(info.final_ell):.3f}")

    # accuracy sanity: recovered transform vs ground truth
    T_true = np.asarray(lie.rt_to_mat44(R_m, t_m))
    err_mat = T @ T_true
    xi_err = np.asarray(
        lie.se3_log(jnp.asarray(err_mat[:3, :3]), jnp.asarray(err_mat[:3, 3]))
    )
    log(f"pose error |xi| = {np.linalg.norm(xi_err):.5f} (ret={ret})")

    fps = 1.0 / t_frame
    print(
        json.dumps(
            {
                "metric": "f2f_registration_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 2.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
