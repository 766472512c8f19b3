"""Per-iteration budget of the ELL fused hot loop (VERDICT r3 task 2).

Method: each phase runs inside ONE jitted lax.fori_loop with a
data-dependent carry; time(loop(n)) - time(loop(n0)) over (n - n0)
iterations cancels dispatch/tunnel costs (same methodology as
scripts/roofline.py — on this platform only a host fetch synchronizes).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from bench import synthetic_kitti_scene  # noqa: E402

from unified_cvo_tpu.config import read_cvo_params_yaml  # noqa: E402
from unified_cvo_tpu.ops import indicator as indicator_ops  # noqa: E402
from unified_cvo_tpu.ops import kernels, lie  # noqa: E402
from unified_cvo_tpu.ops import neighbors as nbr  # noqa: E402
from unified_cvo_tpu.ops import pallas_ell as pe  # noqa: E402
from unified_cvo_tpu.ops.poly import step_from_poly  # noqa: E402
from unified_cvo_tpu.utils.pointcloud import make_pointcloud  # noqa: E402

N = 16384
K = 32


def timed_loop(body, init, n, fetch):
    """Run body n times in one jit; return wall seconds after host fetch."""
    @jax.jit
    def run(init):
        return lax.fori_loop(0, n, body, init)

    out = run(init)
    np.asarray(fetch(out))  # warm compile + sync
    t0 = time.perf_counter()
    out = run(init)
    np.asarray(fetch(out))
    return time.perf_counter() - t0


def per_iter_ms(body, init, fetch, n_long=400, n_short=40):
    t_long = timed_loop(body, init, n_long, fetch)
    t_short = timed_loop(body, init, n_short, fetch)
    return (t_long - t_short) / (n_long - n_short) * 1e3


def main():
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml")
    xyz = synthetic_kitti_scene(N)
    xi = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    R_m, t_m = lie.se3_exp(jnp.asarray(xi), 1.0)
    xyz2 = np.asarray(xyz @ np.asarray(R_m).T + np.asarray(t_m))
    src = make_pointcloud(xyz, bucket=N)
    tgt = make_pointcloud(xyz2, bucket=N)
    Rinv, Tinv = lie.invert_rt(jnp.asarray(R_m), jnp.asarray(t_m))
    ell = jnp.float32(params.ell_init)

    build = jax.jit(functools.partial(
        nbr.build_neighbor_list, params, k=K, skin=nbr.DEFAULT_SKIN,
        per_cell_cap=nbr.PER_CELL_CAP))
    nl = build(ell, src, tgt, Rinv, Tinv)
    jax.block_until_ready(nl.y_xyz)

    # build cost (amortized once per frame)
    def build_body(i, carry):
        R, T = carry
        nl2 = build(ell, src, tgt, R, T)
        # data-dependence: perturb the pose by a value derived from output
        eps = jnp.sum(nl2.y_xyz[:, 0, 0]) * 0.0
        return R + eps, T + eps

    t_build = per_iter_ms(build_body, (Rinv, Tinv), lambda c: c[1],
                          n_long=40, n_short=4)
    print(f"neighbor-list build: {t_build:.3f} ms")

    # --- phase loops: each carries (R, T) perturbed by output so nothing
    # is DCE'd and every iteration depends on the previous one.
    twist0 = jnp.asarray(
        np.array([0.1, -0.2, 0.05, 0.5, 0.2, -0.4], np.float32))
    twist0 = twist0 / jnp.linalg.norm(twist0)

    def dep(R, T, val):
        eps = val * 1e-30
        return R + eps, T + eps

    def body_flow(i, c):
        R, T = c
        twist, jn, nz, asum = pe.flow_twist_ell_fused(params, ell, src, nl,
                                                      R, T, tile_n=1024)
        return dep(R, T, asum)

    def body_step(i, c):
        R, T = c
        B, C, D, E = pe.step_coeffs_ell_fused(params, ell, src, nl, R, T,
                                              twist0, tile_n=256)
        return dep(R, T, B + C + D + E)

    def body_kernels(i, c):
        R, T = c
        twist, jn, nz, asum = pe.flow_twist_ell_fused(params, ell, src, nl,
                                                      R, T, tile_n=1024)
        B, C, D, E = pe.step_coeffs_ell_fused(params, ell, src, nl, R, T,
                                              twist, tile_n=256)
        return dep(R, T, B + C + D + E)

    def body_full(i, c):
        R, T, ellc, ind = c
        Ri, Ti = lie.invert_rt(R, T)
        twist, jn, nz, asum = pe.flow_twist_ell_fused(params, ellc, src, nl,
                                                      Ri, Ti, tile_n=1024)
        B, C, D, E = pe.step_coeffs_ell_fused(params, ellc, src, nl, Ri, Ti,
                                              twist, tile_n=256)
        step = step_from_poly(B, C, D, E, params.min_step, params.max_step)
        dR, dT = lie.se3_exp(twist, step)
        R2 = R @ dR
        T2 = R @ dT + T
        dist = lie.se3_distance(dR, dT)
        ip = nz.astype(jnp.float32) / 16384.0
        ind2, decrease = indicator_ops.update(
            ind, ip, params.indicator_stable_threshold)
        ell2 = jnp.where(decrease, jnp.maximum(
            ellc * params.ell_decay_rate, params.ell_min), ellc)
        # drift check (as in inner_cond); the carry must DEPEND on it or
        # XLA dead-code-eliminates the bound entirely (a jnp.where with
        # identical branches constant-folds)
        drift = nbr.drift_bound_exceeded(nl, Ri, Ti, nbr.DEFAULT_SKIN)
        ell2 = ell2 + drift.astype(jnp.float32) * 1e-30 + dist * 1e-30
        # keep the pose stationary so the loop stays in-regime
        keep = jnp.float32(1e-30)
        return (R + (R2 - R) * keep, T + (T2 - T) * keep, ell2, ind2)

    init2 = (jnp.asarray(R_m), jnp.asarray(t_m))
    init4 = (jnp.asarray(R_m), jnp.asarray(t_m), ell,
             indicator_ops.init_state(params.indicator_window_size))

    t_flow = per_iter_ms(body_flow, init2, lambda c: c[1])
    print(f"fused flow kernel + wrap:        {t_flow:.4f} ms/iter")
    t_step = per_iter_ms(body_step, init2, lambda c: c[1])
    print(f"fused step kernel + wrap:        {t_step:.4f} ms/iter")
    t_k = per_iter_ms(body_kernels, init2, lambda c: c[1])
    print(f"flow+flow_from_stats+step:       {t_k:.4f} ms/iter")
    t_full = per_iter_ms(body_full, init4, lambda c: c[1])
    print(f"full body (kernels+glue+drift):  {t_full:.4f} ms/iter")
    print(f"  -> glue (full - kernels):      {t_full - t_k:.4f} ms/iter")
    print(f"  -> flow_from_stats et al:      {t_k - t_flow - t_step:.4f} ms/iter")


if __name__ == "__main__":
    main()
