"""Roofline accounting for the pairwise-registration hot path (VERDICT task 2).

Measures the attached chip's actual ceilings with microbenchmarks (no spec
sheet numbers), counts the model FLOPs/bytes of each compute path from its
static shapes, then times the paths and reports achieved throughput as a
fraction of the governing roof. This answers "is it fast?" (vs the machine),
not just "is it faster?" (vs the reference GPU — bench.py's job).

Methodology: every measurement runs ITERS data-dependent repetitions inside
ONE jitted lax.fori_loop (each iteration consumes the previous one's
output), so a single dispatch + block_until_ready brackets real device
time. Per-call timing over the remote-TPU tunnel measures dispatch, not
execution — chained-loop numbers here supersede any per-call numbers.

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


def timed(fn, *args, reps=3):
    """Wall time of one call of an already-jitted fn (which internally
    chains its iterations); min over reps, first call excluded (compile)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


# ------------------------------------------------- machine ceilings (measured)


def measure_peaks():
    peaks = {}

    # MXU bf16: chained b <- normalize(a @ b), one dispatch
    s, M_IT = 2048, 64

    @jax.jit
    def mm_chain(a, b):
        def body(i, b):
            c = jnp.dot(a, b, preferred_element_type=jnp.float32)
            return (c * (1.0 / s)).astype(jnp.bfloat16)
        return lax.fori_loop(0, M_IT, body, b)

    a = jnp.ones((s, s), jnp.bfloat16)
    b = jnp.ones((s, s), jnp.bfloat16)
    t, _ = timed(mm_chain, a, b)
    peaks["mxu_bf16_tflops"] = 2 * s**3 * M_IT / t / 1e12

    # VPU f32 FMA: chained x <- x*c + d, 2 flops/elem/stage
    m, F_IT = 1 << 22, 256

    @jax.jit
    def fma_chain(x, c):
        return lax.fori_loop(0, F_IT, lambda i, x: x * c + 1e-7, x)

    x = jnp.linspace(0.5, 1.5, m, dtype=jnp.float32)
    t, _ = timed(fma_chain, x, jnp.float32(0.9999))
    peaks["vpu_f32_fma_tflops"] = 2 * F_IT * m / t / 1e12

    # exp throughput (the kernel's transcendental)
    E_IT = 64

    @jax.jit
    def exp_chain(x, c):
        return lax.fori_loop(0, E_IT, lambda i, x: jnp.exp(-x) + c, x)

    t, _ = timed(exp_chain, x, jnp.float32(0.1))
    peaks["exp_gops"] = E_IT * m / t / 1e9

    # HBM stream: chained x <- x + 1 on a 256 MB array (read + write)
    big = jnp.ones((1 << 26,), jnp.float32)
    B_IT = 16

    @jax.jit
    def stream_chain(x):
        return lax.fori_loop(0, B_IT, lambda i, x: x + 1.0, x)

    t, _ = timed(stream_chain, big)
    peaks["hbm_stream_gbs"] = 2 * big.size * 4 * B_IT / t / 1e9
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
    ell0 = jnp.float32(params.ell_init)
    Rinv, Tinv = lie.invert_rt(jnp.asarray(R_m), jnp.asarray(t_m))
    K = nbr.DEFAULT_K
    B_IT = 20

    # ---- ELL builds (chained: ell perturbed by the previous overflow)
    def chain_build(build):
        @jax.jit
        def run(ell):
            def body(i, carry):
                ell, acc = carry
                nl = build(ell)
                return (ell + 1e-12 * nl.y_xyz[0, 0, 0], acc + nl.overflow)
            return lax.fori_loop(0, B_IT, body, (ell, jnp.int32(0)))
        return run

    t_bg, _ = timed(chain_build(
        lambda e: nbr.build_neighbor_list(params, e, src, tgt, Rinv, Tinv)),
        ell0)
    t_bs, _ = timed(chain_build(
        lambda e: nbr.build_neighbor_list_scan(params, e, src, tgt, Rinv,
                                               Tinv)), ell0)
    t_bg /= B_IT
    t_bs /= B_IT
    print(f"\ngrid build: {t_bg*1e3:.2f} ms   scan build: {t_bs*1e3:.2f} ms "
          f"(= {t_bs/t_bg:.1f}x grid; amortized over iterations between "
          f"drift rebuilds)", flush=True)

    # ---- ELL consume iteration (chained through ell)
    nl = jax.jit(lambda e: nbr.build_neighbor_list(
        params, e, src, tgt, Rinv, Tinv))(ell0)
    jax.block_until_ready(nl)
    C_IT = 50

    @jax.jit
    def ell_chain(ell, nl):
        def body(i, ell):
            stats, a, yts = nbr.flow_stats_ell(params, ell, src, nl, Rinv, Tinv)
            twist, _ = kernels.flow_from_stats(params, src, stats)
            B, C, D, E = nbr.step_coeffs_ell(params, ell, src, a, yts, twist)
            return ell + 1e-12 * (B + C + D + E)
        return lax.fori_loop(0, C_IT, body, ell)

    t_ell, _ = timed(ell_chain, ell0, nl)
    t_ell /= C_IT
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
        jax.block_until_ready(y_t)
        D_IT = 20

        @jax.jit
        def dense_chain(ell, y_t):
            def body(i, ell):
                y_lo, y_hi = morton.tile_aabbs(y_t.xyz, y_t.mask, tj)
                d2max = morton.tile_d2max(params, ell, srcp.xyz, srcp.mask, ti)
                mask = morton.tile_cull_mask(x_lo, x_hi, d2max, y_lo, y_hi)
                comp = pk.compact_tile_mask(mask)
                stats = pk.flow_stats_pallas(params, ell, srcp, y_t,
                                             compaction=comp)
                twist, _ = kernels.flow_from_stats(params, srcp, stats)
                B, C, D, E = pk.step_coeffs_pallas(params, ell, srcp, y_t,
                                                   twist, compaction=comp)
                return ell + 1e-12 * (B + C + D + E)
            return lax.fori_loop(0, D_IT, body, ell)

        @jax.jit
        def density(ell, y_t):
            y_lo, y_hi = morton.tile_aabbs(y_t.xyz, y_t.mask, tj)
            d2max = morton.tile_d2max(params, ell, srcp.xyz, srcp.mask, ti)
            mask = morton.tile_cull_mask(x_lo, x_hi, d2max, y_lo, y_hi)
            return jnp.mean(mask.astype(jnp.float32))

        dens = float(density(ell0, y_t))
        t_dense, _ = timed(dense_chain, ell0, y_t)
        t_dense /= D_IT
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
