"""Headline benchmark: frame-to-frame CVO registration throughput on TPU.

Prints ONE JSON line:
  {"metric": "f2f_registration_fps", "value": N, "unit": "frames/s",
   "vs_baseline": R}

Workload: KITTI-scale stereo odometry steady state — a sequence of synthetic
frames (16384 points each, ~55 m range envelope mimicking the reference's
stereo point selection, CvoPointCloud.cpp:39-57) registered consecutively
with the geometric KITTI preset (cvo_geometric_params_img_gpu0.yaml) and a
constant-velocity initial guess, exactly the hot path of the reference's
cvo_align_gpu_img driver (main_cvo_gpu_align_raw_image.cpp:73-163, init
guess at :125). Each full pairwise registration (kernel + flow + quartic
step + lengthscale schedule to convergence) runs inside a single jitted
while-loop; the pose chain stays on device across frames, as a production
pipeline would run it (the per-frame result feeds the next frame's initial
guess without a host round-trip).

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


def synthetic_kitti_scene(n=16384, seed=0):
    """Structured outdoor scene: ground plane, two walls, posts; ~55 m range."""
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


# kept for importers (scripts/profile_iter.py etc.)
synthetic_kitti_pair = synthetic_kitti_scene


def main():
    import jax
    import jax.numpy as jnp

    from unified_cvo_tpu.config import read_cvo_params_yaml
    from unified_cvo_tpu.models.align import align
    from unified_cvo_tpu.ops import lie
    from unified_cvo_tpu.utils.pointcloud import make_pointcloud

    n = int(os.environ.get("BENCH_N", 16384))
    # 50 frames ~ steady-state odometry (amortizes per-align dispatch the
    # way a real long sequence does)
    n_frames = int(os.environ.get("BENCH_FRAMES", 50))
    log(f"devices: {jax.devices()}")
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml"
    )

    # sequence of frames marching forward ~1.0 m/frame with per-frame motion
    # variation (acceleration / steering at realistic KITTI 10 Hz scale), so
    # the constant-velocity warm start is good-but-wrong for every pair and
    # each registration does real gradient-flow work.
    xyz_scene = synthetic_kitti_scene(n)
    xi_base = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    rng = np.random.default_rng(7)
    frames = []
    T_true_seq = []
    xyz_k = xyz_scene
    for k in range(n_frames + 1):
        noisy = xyz_k + rng.normal(scale=0.005, size=xyz_k.shape).astype(np.float32)
        frames.append(make_pointcloud(noisy, bucket=n))
        if k == n_frames:
            break
        xi_k = xi_base + np.array(
            [0.0006, -0.0009, 0.0006, 0.006, -0.006, 0.024], np.float32
        ) * np.float32(np.cos(0.9 * k + 0.4) * 2.0)
        R_k, t_k = lie.se3_exp(jnp.asarray(xi_k), 1.0)
        R_k, t_k = np.asarray(R_k), np.asarray(t_k)
        # pair convention: frame_{k+1} points = R_k . frame_k points + t_k
        xyz_k = xyz_k @ R_k.T + t_k
        # keep the workload stationary: points that recede past the ~55 m
        # envelope wrap back to near range, like new points entering view
        # on a real forward-moving sequence (the wrapped ~2%/frame have no
        # correspondence in the previous frame — realistic partial overlap)
        xyz_k[:, 2] = 2.0 + np.mod(xyz_k[:, 2] - 2.0, 53.0)
        T_true_seq.append(np.asarray(lie.rt_to_mat44(jnp.asarray(R_k),
                                                     jnp.asarray(t_k))))
    frames = [jax.device_put(f) for f in frames]
    jax.block_until_ready(frames[-1].xyz)

    chunk = int(os.environ.get("BENCH_CHUNK", 4096))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    nl_builder = os.environ.get("BENCH_NL_BUILDER") or None
    nl_k = int(os.environ["BENCH_NL_K"]) if "BENCH_NL_K" in os.environ else None
    nl_per_cell = (int(os.environ["BENCH_NL_PER_CELL"])
                   if "BENCH_NL_PER_CELL" in os.environ else None)
    # Hard iteration cap: an unbounded while_loop dispatched to the TPU
    # cannot be cancelled and would hold the chip for minutes.
    max_iter = int(os.environ.get("BENCH_MAX_ITER", 1500))

    # constant-velocity seed for the first pair, as the driver warm-starts
    # from the previous frame's relative motion (slightly wrong on purpose)
    xi_guess = xi_base + 0.3 * np.array(
        [0.002, -0.003, 0.002, 0.02, -0.02, 0.08], np.float32
    )
    Rg, tg = lie.se3_exp(jnp.asarray(xi_guess), 1.0)
    ig0 = jax.device_put(lie.rt_to_mat44(Rg, tg))

    def run_sequence(guess):
        """Register all consecutive pairs; the pose chain stays on device
        (result k is the constant-velocity init guess for pair k+1).

        Ends with a HOST FETCH of the final pose: pair k+1's guess depends
        on pair k's result, so fetching the tail synchronizes the whole
        chain. On the remote-TPU platform `block_until_ready` does NOT wait
        for execution (verified in scripts/roofline.py) — only a
        data-dependent device->host fetch does. The 16-float transfer is
        negligible on any platform."""
        results = []
        infos = []
        for k in range(n_frames):
            T_rel, ret, info = align(
                frames[k], frames[k + 1], guess, params, chunk=chunk,
                max_iter=max_iter, backend=backend, nl_builder=nl_builder,
                nl_k=nl_k, nl_per_cell=nl_per_cell,
            )
            # constant-velocity warm start, device-resident. align returns
            # the target->source map and takes the inverse convention as its
            # guess (see models/align.py docstring), so re-invert on device.
            Ri, Ti = lie.mat44_to_rt(T_rel)
            guess = lie.rt_to_mat44(*lie.invert_rt(Ri, Ti))
            results.append(T_rel)
            infos.append(info)
        np.asarray(results[-1])
        return results, infos

    def ig_rep(rep):
        """Distinct warm start per repetition so no execution-caching layer
        can elide reruns of an identical sequence."""
        Rr, tr = lie.se3_exp(jnp.asarray(
            xi_guess * np.float32(1.0 + 1e-4 * rep)), 1.0)
        return jax.device_put(lie.rt_to_mat44(Rr, tr))

    t0 = time.time()
    results, infos = run_sequence(ig0)  # includes compile
    log(f"warmup (with compile): {time.time()-t0:.2f}s")

    times = []
    for rep in range(3):
        guess_r = ig_rep(rep + 1)
        np.asarray(guess_r)  # materialize outside the timed region
        t0 = time.time()
        results, infos = run_sequence(guess_r)
        times.append(time.time() - t0)
    t_seq = min(times)
    iters = [int(i.iterations) for i in infos]
    log(f"sequence: {t_seq*1e3:.1f} ms for {n_frames} frames, "
        f"{t_seq/n_frames*1e3:.1f} ms/frame, iters/frame={iters}")

    # single-pair latency (incl. one host sync), for reference
    ig1 = ig_rep(7)
    np.asarray(ig1)
    t0 = time.time()
    T1, ret1, info1 = align(
        frames[0], frames[1], ig1, params, chunk=chunk, max_iter=max_iter,
        backend=backend, nl_builder=nl_builder, nl_k=nl_k,
        nl_per_cell=nl_per_cell,
    )
    np.asarray(T1)
    log(f"single-pair latency: {(time.time()-t0)*1e3:.1f} ms "
        f"({int(info1.iterations)} iters)")

    # accuracy sanity: every recovered relative transform vs ground truth
    errs = []
    for T_rel, T_true in zip(results, T_true_seq):
        err_mat = np.asarray(T_rel) @ T_true
        xi_err = np.asarray(
            lie.se3_log(jnp.asarray(err_mat[:3, :3]), jnp.asarray(err_mat[:3, 3]))
        )
        errs.append(float(np.linalg.norm(xi_err)))
    log(f"pose error |xi|: max={max(errs):.5f} mean={np.mean(errs):.5f}")
    if max(errs) > 0.05:
        log("WARNING: pose error above sanity bound — fps number suspect")

    fps = n_frames / t_seq
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
    try:
        main()
    except Exception as e:  # transient remote-TPU hiccups (observed once:
        # FAILED_PRECONDITION on a first-run fetch); one clean retry
        log(f"bench attempt failed ({type(e).__name__}: {e}); retrying once")
        main()
