"""Stage budget of the neighbor-list BUILD (round-5 frontier).

The per-frame cost is loop (~0.07 ms x ~100 iters) + one build; round-4
put the build at ~5.5 ms = half of every frame. This script times the
build's internal stages on the real TPU with the chained-fori_loop
difference method (only a data-dependent host fetch synchronizes on this
platform — see PERF.md "Timing integrity").

Stages (matching ops/neighbors.py build_neighbor_list, select='kernel'):
  transform+radius : y_t transform, support radii, bbox, cell keys
  table            : M-argsort by cell + rank scan + 4 scalar scatters
  dilate           : z-roll concat into the lane-padded gather table
  gather           : [N, n_win*4*CP] pool pull (cost ~ per index)
  select           : pallas_select pool_select kernel
  chan             : pose-independent channel factor (None for geometric)

Usage: timeout 900 python scripts/profile_build.py [N]
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
from unified_cvo_tpu.ops import lie  # noqa: E402
from unified_cvo_tpu.ops import neighbors as nbr  # noqa: E402
from unified_cvo_tpu.utils.pointcloud import make_pointcloud  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
K = 32


def timed(fn, init, n, fetch):
    @jax.jit
    def run(c):
        return lax.fori_loop(0, n, fn, c)

    out = run(init)
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    out = run(init)
    np.asarray(fetch(out))
    return time.perf_counter() - t0


def per_call_ms(fn, init, fetch, n_long=120, n_short=12):
    tl = timed(fn, init, n_long, fetch)
    ts = timed(fn, init, n_short, fetch)
    return (tl - ts) / (n_long - n_short) * 1e3


def main():
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml")
    xyz = synthetic_kitti_scene(N)
    xi = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    R_m, t_m = lie.se3_exp(jnp.asarray(xi), 1.0)
    xyz2 = np.asarray(xyz @ np.asarray(R_m).T + np.asarray(t_m))
    src = make_pointcloud(xyz, bucket=N)
    tgt = make_pointcloud(xyz2, bucket=N)
    ell = jnp.float32(params.ell_init)
    Rinv = jnp.eye(3)
    Tinv = jnp.zeros(3)

    # pose perturbation per call defeats any caching; the tiny rotation
    # keeps the workload identical to within noise
    def perturb(i, R, T):
        dR, dT = lie.se3_exp(
            jnp.float32([0, 0, 0, 1e-6, 0, 0]) * (1.0 + i.astype(jnp.float32)),
            1.0)
        return R @ dR, T + dT

    rows = {}
    for select in ("kernel", "sort"):
        def full_body(i, c, select=select):
            R, T = perturb(i, c[0], c[1])
            nl = nbr.build_neighbor_list(
                params, ell, src, tgt, R, T, k=K, select=select)
            return (R, T, c[2] + nl.y_xyz[0, 0, 0] + nl.overflow.astype(jnp.float32))

        rows[f"full build ({select})"] = per_call_ms(
            full_body, (Rinv, Tinv, jnp.float32(0)), lambda c: c[2])

    # stage shims: re-run the build's own source with early returns is
    # invasive; instead time reduced pipelines that share its stages
    P = nbr.PER_CELL_CAP
    gx, gy, gz = nbr.GRID_DIMS
    n_cells = gx * gy * gz

    def stages(i, c, upto="gather"):
        R, T = perturb(i, c[0], c[1])
        f32 = jnp.float32
        y_t = nbr._transform_cols(tgt.xyz, R, T)
        r_i = nbr.support_radius(params, ell, src) + f32(nbr.DEFAULT_SKIN)
        r_max = jnp.max(jnp.where(src.mask > 0, r_i, 0.0))
        w = tgt.mask > 0
        lo = jnp.min(jnp.where(w[:, None], y_t, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(w[:, None], y_t, -jnp.inf), axis=0)
        lo = jnp.minimum(lo, jnp.min(jnp.where(src.mask[:, None] > 0, src.xyz, jnp.inf), axis=0))
        hi = jnp.maximum(hi, jnp.max(jnp.where(src.mask[:, None] > 0, src.xyz, -jnp.inf), axis=0))
        dims = jnp.asarray([gx, gy, gz], f32)
        cell = jnp.maximum((hi - lo) / dims, r_max)
        clip_hi = jnp.asarray([gx - 1, gy - 1, gz - 1])
        key = jnp.where(
            w,
            (lambda cc: (cc[..., 0] * gy + cc[..., 1]) * gz + cc[..., 2])(
                jnp.clip(jnp.floor((y_t - lo) / cell).astype(jnp.int32), 0, clip_hi)),
            n_cells)
        if upto == "transform":
            return (R, T, c[2] + jnp.sum(key.astype(f32)) * 1e-9)
        order = jnp.argsort(key).astype(jnp.int32)
        key_sorted = key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]])
        segment_start = jnp.where(first, jnp.arange(tgt.capacity, dtype=jnp.int32), 0)
        segment_start = lax.associative_scan(jnp.maximum, segment_start)
        rank = jnp.arange(tgt.capacity, dtype=jnp.int32) - segment_start
        tab = jnp.full((n_cells + 1, 4 * P), -1.0, f32)
        slot_ok = rank < P
        scat_cell = jnp.where(slot_ok, key_sorted, n_cells)
        scat_rank = jnp.where(slot_ok, rank, P - 1)
        xyz_sorted = tgt.xyz[order]
        for ci, v in enumerate([xyz_sorted[:, 0], xyz_sorted[:, 1],
                                xyz_sorted[:, 2], order.astype(f32)]):
            tab = tab.at[scat_cell, ci * P + scat_rank].set(
                jnp.where(slot_ok, v, -1.0))
        tab = tab.at[n_cells].set(-1.0)
        if upto == "table":
            return (R, T, c[2] + jnp.sum(tab[0]) * 1e-9)
        cbase = jnp.clip(jnp.floor((src.xyz - lo) / cell).astype(jnp.int32), 0, clip_hi)
        offs2 = jnp.asarray([[dx, dy] for dx in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32)
        n_off = offs2.shape[0]
        cxy = cbase[:, None, :2] + offs2[None, :, :]
        in_grid = jnp.all((cxy >= 0) & (cxy < jnp.asarray([gx, gy])), axis=-1)
        zc = jnp.clip(cbase[:, 2], 1, gz - 2)
        cid = (cxy[..., 0] * gy + cxy[..., 1]) * gz + zc[:, None]
        cid = jnp.where(in_grid, cid, n_cells)
        tabz = jnp.concatenate(
            [jnp.roll(tab, 1, axis=0), tab, jnp.roll(tab, -1, axis=0)], axis=1)
        tabz = tabz.at[n_cells].set(-1.0)
        tabz = lax.optimization_barrier(tabz)
        if upto == "dilate":
            return (R, T, c[2] + jnp.sum(tabz[0]) * 1e-9)
        pool = tabz[cid.reshape(-1)].reshape(N, n_off * 12 * P)
        # consume the pool FULLY: a partial consumer lets XLA narrow the
        # gather and under-reports it (round-5 lesson)
        return (R, T, c[2] + jnp.sum(pool) * 1e-9)

    for name in ("transform", "table", "dilate", "gather"):
        rows[name] = per_call_ms(
            functools.partial(stages, upto=name),
            (Rinv, Tinv, jnp.float32(0)), lambda c: c[2])

    print(f"N = {N}, K = {K}, P = {P}, grid = {nbr.GRID_DIMS}")
    prev = 0.0
    for name in ("transform", "table", "dilate", "gather"):
        print(f"  cumulative through {name:9s}: {rows[name]:7.3f} ms "
              f"(stage {rows[name] - prev:6.3f} ms)")
        prev = rows[name]
    print(f"  full build (kernel select): {rows['full build (kernel)']:.3f} ms "
          f"(select stage ~{rows['full build (kernel)'] - rows['gather']:.3f} ms)")
    print(f"  full build (sort   select): {rows['full build (sort)']:.3f} ms")


if __name__ == "__main__":
    main()
