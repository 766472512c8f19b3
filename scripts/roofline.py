"""Roofline accounting for the pairwise-registration hot path (VERDICT task 2).

Measures the attached chip's actual ceilings with microbenchmarks (no spec
sheet numbers), counts the model FLOPs/bytes of each compute path from its
static shapes, then times the paths and reports achieved throughput as a
fraction of the governing roof. This answers "is it fast?" (vs the machine),
not just "is it faster?" (vs the reference GPU — bench.py's job).

Methodology (what this environment actually requires, verified empirically):
  * On the remote-TPU ("axon") platform `block_until_ready` does NOT wait
    for device execution — re-running a jitted fn on the same inputs
    returns in ~0.1 ms regardless of the work inside. Only a device->host
    fetch of a value that data-depends on the computation synchronizes.
  * Every fetch pays one tunnel round trip (~25-130 ms), which would bury
    sub-ms kernels.
So every measurement (a) chains ITERS data-dependent repetitions inside one
jitted lax.fori_loop, (b) perturbs the inputs per repetition so no caching
layer can elide the execution, (c) fetches a scalar that depends on the
final iterate, and (d) reports the DIFFERENCE between a long and a short
chain, which cancels the round trip and any constant dispatch overhead.
Sanity anchor: this measures the MXU at ~185 TF/s bf16, consistent with the
v5e generation's public peak (~197 TF/s), where naive per-call timing
reports an impossible 12 PF/s.

Paths profiled at bench scale (N = M = 16384, geometric KITTI preset):
  * ELL consume iteration  (neighbors.flow_stats_ell + step_coeffs_ell)
  * ELL grid build         (neighbors.build_neighbor_list)
  * ELL scan build         (neighbors.build_neighbor_list_scan)
  * dense tiled Pallas     (pallas_kernels flow+step with AABB culling)

Run: python scripts/roofline.py        (TPU; CPU works but the roofs are
                                        host-core numbers)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from bench import synthetic_kitti_scene  # noqa: E402

from unified_cvo_tpu.config import read_cvo_params_yaml  # noqa: E402
from unified_cvo_tpu.ops import kernels, lie, morton  # noqa: E402
from unified_cvo_tpu.ops import neighbors as nbr  # noqa: E402
from unified_cvo_tpu.ops import pallas_kernels as pk  # noqa: E402
from unified_cvo_tpu.utils.pointcloud import make_pointcloud  # noqa: E402


def timed_fetch(fn, args_fn, reps=3):
    """Min wall time of fn(*args_fn(rep)) -> scalar fetch, first (compile)
    call excluded. args_fn must return distinct inputs per rep."""
    float(fn(*args_fn(-1)))  # compile + warm
    best = np.inf
    for r in range(reps):
        args = args_fn(r)
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(make_chain, args_fn, it_small, it_big, reps=3):
    """Seconds per chain iteration via the long-minus-short difference."""
    t_s = timed_fetch(make_chain(it_small), args_fn, reps)
    t_b = timed_fetch(make_chain(it_big), args_fn, reps)
    return max(t_b - t_s, 1e-12) / (it_big - it_small)


# ------------------------------------------------- machine ceilings (measured)


def measure_peaks():
    peaks = {}
    s = 2048

    a_mm = jax.random.normal(jax.random.PRNGKey(0), (s, s), jnp.bfloat16) * 0.02
    b_mm = jax.random.normal(jax.random.PRNGKey(1), (s, s), jnp.bfloat16)

    def make_mm(it):
        @jax.jit
        def run(a, b):
            def body(i, b):
                c = jnp.dot(a, b, preferred_element_type=jnp.float32)
                n = jnp.sqrt(jnp.mean(c * c) + 1e-9)
                return (c / n).astype(jnp.bfloat16)
            return jnp.sum(lax.fori_loop(0, it, body, b).astype(jnp.float32))
        return run

    t = per_iter(make_mm, lambda r: (a_mm, b_mm * (1.0 + 1e-6 * (r + 2))),
                 64, 512)
    peaks["mxu_bf16_tflops"] = 2 * s**3 / t / 1e12

    # VPU f32: each fori_loop stage applies UNROLL unrollable *nonlinear*
    # steps (x + x*x*c: 3 flops, not algebraically foldable the way an
    # affine chain is), fused by XLA into one elementwise kernel — so the
    # stage is compute-bound (AI ~ 48 f/byte), unlike a bare FMA chain
    # whose 0.25 f/byte makes it an HBM benchmark in disguise.
    m = 1 << 22
    x0 = jnp.linspace(0.5, 1.5, m, dtype=jnp.float32)
    UNROLL = 128

    def make_vpu(it):
        @jax.jit
        def run(x, c):
            def body(i, x):
                for j in range(UNROLL):
                    x = x + x * x * (c if j % 2 == 0 else -c)
                return x
            return jnp.sum(lax.fori_loop(0, it, body, x))
        return run

    t = per_iter(make_vpu,
                 lambda r: (x0 * (1.0 + 1e-7 * (r + 2)), jnp.float32(1e-4)),
                 16, 128)
    peaks["vpu_f32_fma_tflops"] = 3 * UNROLL * m / t / 1e12

    # exp throughput (the kernel's transcendental), same unrolled-stage trick
    E_UNROLL = 16

    def make_exp(it):
        @jax.jit
        def run(x, c):
            def body(i, x):
                for _ in range(E_UNROLL):
                    x = jnp.exp(-x) + c
                return x
            return jnp.sum(lax.fori_loop(0, it, body, x))
        return run

    t = per_iter(make_exp,
                 lambda r: (x0 * (1.0 + 1e-7 * (r + 2)), jnp.float32(0.1)),
                 16, 128)
    peaks["exp_gops"] = E_UNROLL * m / t / 1e9

    # HBM stream: chained x <- x + 1 on a 256 MB array (read + write)
    big = jnp.linspace(0.0, 1.0, 1 << 26, dtype=jnp.float32)

    def make_stream(it):
        @jax.jit
        def run(x):
            return jnp.sum(lax.fori_loop(0, it, lambda i, x: x + 1.0, x))
        return run

    t = per_iter(make_stream, lambda r: (big * (1.0 + 1e-7 * (r + 2)),),
                 8, 64)
    peaks["hbm_stream_gbs"] = 2 * big.size * 4 / t / 1e9
    return peaks


# ----------------------------------------------------- model work accounting


def ell_consume_counts(N, K):
    """FLOPs / transcendentals / HBM bytes of one ELL iteration (flow+step).

    Flow (flow_stats_ell): per slot — y transform 15, d2 9, exp arg+mul 3,
    gates 3, row-sum + 3x wy-accum + count 9  => ~39 f + 1 exp.
    Step (step_coeffs_ell): per slot — xi{1..4}z 4x15, diff 3, five 3-dots
    25, beta..epsil 12, B..E polys 26        => ~126 f.
    Bytes: ~16 resident [N,K] f32 streams (y_xyz x3 + valid read twice,
    a and y_t_slots x3 written + re-read, reduction reads).
    """
    slots = N * K
    return {
        "flops": slots * (39 + 126),
        "transc": slots * 1,
        "bytes": slots * 4 * 16,
    }


def dense_pass_counts(N, M, density):
    """One dense tiled iteration (flow pass + step pass over active tiles).

    Per pair, flow: d2 9, exp 3, gates 3, accums 9 => 24 f + 1 exp;
    step: recompute A (15) + dots/polys (~90) => ~105 f + 1 exp.
    A never leaves VMEM: HBM traffic is the packed x/y tiles only,
    negligible per pair => compute-bound by construction.
    """
    pairs = N * M * density
    return {"flops": pairs * (24 + 105), "transc": pairs * 2}


# ------------------------------------------------------------------- driver


def main():
    n = 16384
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml")
    print(f"device: {jax.devices()[0].platform}", flush=True)
    peaks = measure_peaks()
    for k, v in peaks.items():
        print(f"peak {k}: {v:.2f}", flush=True)

    xyz = synthetic_kitti_scene(n)
    xi = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    R_m, t_m = lie.se3_exp(jnp.asarray(xi), 1.0)
    xyz2 = np.asarray(xyz @ np.asarray(R_m).T + np.asarray(t_m))
    src = make_pointcloud(xyz, bucket=n)
    tgt = make_pointcloud(xyz2, bucket=n)
    ell0 = float(params.ell_init)
    Rinv, Tinv = lie.invert_rt(jnp.asarray(R_m), jnp.asarray(t_m))
    K = nbr.DEFAULT_K

    def ell_arg(r):
        return jnp.float32(ell0 * (1.0 + 1e-5 * (r + 2)))

    # ---- ELL builds (chained: ell perturbed by the previous overflow)
    def make_build_chain(build):
        def make(it):
            @jax.jit
            def run(ell):
                def body(i, carry):
                    ell, acc = carry
                    nl = build(ell)
                    return (ell + 1e-12 * nl.y_xyz[0, 0, 0],
                            acc + nl.overflow)
                ell, acc = lax.fori_loop(0, it, body, (ell, jnp.int32(0)))
                return ell + acc.astype(jnp.float32)
            return run
        return make

    t_bg = per_iter(make_build_chain(
        lambda e: nbr.build_neighbor_list(params, e, src, tgt, Rinv, Tinv)),
        lambda r: (ell_arg(r),), 4, 24)
    t_bs = per_iter(make_build_chain(
        lambda e: nbr.build_neighbor_list_scan(params, e, src, tgt, Rinv,
                                               Tinv)),
        lambda r: (ell_arg(r),), 2, 8)
    print(f"\ngrid build: {t_bg*1e3:.2f} ms   scan build: {t_bs*1e3:.2f} ms "
          f"(= {t_bs/t_bg:.1f}x grid; amortized over iterations between "
          f"drift rebuilds)", flush=True)

    # ---- ELL consume iteration (chained through ell)
    nl = jax.jit(lambda e: nbr.build_neighbor_list(
        params, e, src, tgt, Rinv, Tinv))(jnp.float32(ell0))

    def make_ell_chain(it):
        @jax.jit
        def run(ell, nl):
            def body(i, ell):
                stats, a, yts = nbr.flow_stats_ell(params, ell, src, nl,
                                                   Rinv, Tinv)
                twist, _ = kernels.flow_from_stats(params, src, stats)
                B, C, D, E = nbr.step_coeffs_ell(params, ell, src, a, yts,
                                                 twist)
                return ell + 1e-12 * (B + C + D + E)
            return lax.fori_loop(0, it, body, ell)
        return run

    t_ell = per_iter(make_ell_chain, lambda r: (ell_arg(r), nl), 50, 400)
    ec = ell_consume_counts(n, K)
    ell_tf = ec["flops"] / t_ell / 1e12
    ell_gb = ec["bytes"] / t_ell / 1e9
    print(f"\nELL consume iteration (N={n}, K={K}): {t_ell*1e3:.3f} ms")
    print(f"  {ec['flops']/1e9:.2f} GF -> {ell_tf:.2f} TF/s "
          f"({ell_tf/peaks['vpu_f32_fma_tflops']:.0%} of VPU roof)")
    print(f"  {ec['transc']/t_ell/1e9:.2f} Gexp/s "
          f"({ec['transc']/t_ell/1e9/peaks['exp_gops']:.0%} of exp roof)")
    print(f"  ~{ec['bytes']/1e6:.0f} MB streamed -> {ell_gb:.0f} GB/s "
          f"({ell_gb/peaks['hbm_stream_gbs']:.0%} of HBM stream roof)",
          flush=True)

    # ---- fused Pallas ELL consume (accelerator only: Mosaic interpreter
    # on CPU is orders slower)
    if jax.default_backend() != "cpu":
        from unified_cvo_tpu.ops import pallas_ell as pe

        def make_fused_chain(it):
            @jax.jit
            def run(ell, nl):
                def body(i, ell):
                    stats = pe.flow_stats_ell_fused(params, ell, src, nl,
                                                    Rinv, Tinv)
                    twist, _ = kernels.flow_from_stats(params, src, stats)
                    B, C, D, E = pe.step_coeffs_ell_fused(
                        params, ell, src, nl, Rinv, Tinv, twist)
                    return ell + 1e-12 * (B + C + D + E)
                return lax.fori_loop(0, it, body, ell)
            return run

        t_f = per_iter(make_fused_chain, lambda r: (ell_arg(r), nl), 50, 400)
        fb = n * K * 4 * 4  # y_xyz x2 passes read once each + x rows
        print(f"\nfused ELL consume iteration: {t_f*1e3:.3f} ms "
              f"({t_ell/t_f:.2f}x the jnp passes; ~{fb/1e6:.0f} MB streamed "
              f"-> {fb/t_f/1e9:.0f} GB/s of the reduced traffic)", flush=True)

    # ---- dense tiled Pallas iteration (with culling) — accelerator only
    if jax.default_backend() != "cpu":
        ti, tj = pk.DEFAULT_TILE_I, pk.DEFAULT_TILE_J
        srcp = kernels.pad_cloud_to_multiple(src, ti)
        tgtp = kernels.pad_cloud_to_multiple(tgt, tj)
        srcp, _ = jax.jit(morton.sort_cloud)(srcp)
        tgtp, _ = jax.jit(morton.sort_cloud)(tgtp)
        x_lo, x_hi = jax.jit(
            lambda c: morton.tile_aabbs(c.xyz, c.mask, ti))(srcp)
        y_t = jax.jit(lambda c: c.transformed(Rinv, Tinv))(tgtp)

        def make_dense_chain(it):
            @jax.jit
            def run(ell, y_t):
                def body(i, ell):
                    y_lo, y_hi = morton.tile_aabbs(y_t.xyz, y_t.mask, tj)
                    d2max = morton.tile_d2max(params, ell, srcp.xyz,
                                              srcp.mask, ti)
                    mask = morton.tile_cull_mask(x_lo, x_hi, d2max, y_lo,
                                                 y_hi)
                    comp = pk.compact_tile_mask(mask)
                    stats = pk.flow_stats_pallas(params, ell, srcp, y_t,
                                                 compaction=comp)
                    twist, _ = kernels.flow_from_stats(params, srcp, stats)
                    B, C, D, E = pk.step_coeffs_pallas(params, ell, srcp,
                                                       y_t, twist,
                                                       compaction=comp)
                    return ell + 1e-12 * (B + C + D + E)
                return lax.fori_loop(0, it, body, ell)
            return run

        @jax.jit
        def density(ell, y_t):
            y_lo, y_hi = morton.tile_aabbs(y_t.xyz, y_t.mask, tj)
            d2max = morton.tile_d2max(params, ell, srcp.xyz, srcp.mask, ti)
            mask = morton.tile_cull_mask(x_lo, x_hi, d2max, y_lo, y_hi)
            return jnp.mean(mask.astype(jnp.float32))

        dens = float(density(jnp.float32(ell0), y_t))
        t_dense = per_iter(make_dense_chain, lambda r: (ell_arg(r), y_t),
                           5, 25)
        dc = dense_pass_counts(srcp.capacity, tgtp.capacity, dens)
        dtf = dc["flops"] / t_dense / 1e12
        dexp = dc["transc"] / t_dense / 1e9
        print(f"\ndense tiled iteration (density {dens:.0%}): "
              f"{t_dense*1e3:.3f} ms")
        print(f"  {dc['flops']/1e9:.2f} GF -> {dtf:.2f} TF/s "
              f"({dtf/peaks['vpu_f32_fma_tflops']:.0%} of VPU roof)")
        print(f"  {dexp:.2f} Gexp/s ({dexp/peaks['exp_gops']:.0%} of exp roof)")
        print(f"  work ratio dense/ELL: {dc['flops']/ec['flops']:.0f}x flops, "
              f"{dc['transc']/ec['transc']:.0f}x exp — the 'gap' is pair "
              f"count, not kernel efficiency", flush=True)
    else:
        print("\n(dense Pallas path skipped on CPU — Mosaic interpreter)")


if __name__ == "__main__":
    main()
