"""Micro-profile one align iteration phase-by-phase at bench scale (TPU)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import synthetic_kitti_pair  # noqa: E402

from unified_cvo_tpu.config import read_cvo_params_yaml  # noqa: E402
from unified_cvo_tpu.ops import kernels, lie, morton  # noqa: E402
from unified_cvo_tpu.ops import pallas_kernels as pk  # noqa: E402
from unified_cvo_tpu.utils.pointcloud import make_pointcloud  # noqa: E402


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    n = 16384
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml"
    )
    xyz = synthetic_kitti_pair(n)
    xi = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    R_m, t_m = lie.se3_exp(jnp.asarray(xi), 1.0)
    xyz2 = np.asarray(xyz @ np.asarray(R_m).T + np.asarray(t_m))
    src = make_pointcloud(xyz, bucket=n)
    tgt = make_pointcloud(xyz2, bucket=n)

    ti, tj = pk.DEFAULT_TILE_I, pk.DEFAULT_TILE_J
    src = kernels.pad_cloud_to_multiple(src, ti)
    tgt = kernels.pad_cloud_to_multiple(tgt, tj)
    src, _ = jax.jit(morton.sort_cloud)(src)
    tgt, _ = jax.jit(morton.sort_cloud)(tgt)
    x_lo, x_hi = jax.jit(lambda c: morton.tile_aabbs(c.xyz, c.mask, ti))(src)

    ell = jnp.float32(params.ell_init)
    Rinv, Tinv = lie.invert_rt(jnp.asarray(R_m), jnp.asarray(t_m))
    y_t = jax.jit(lambda c: c.transformed(Rinv, Tinv))(tgt)
    jax.block_until_ready(y_t.xyz)

    @jax.jit
    def prep(ell, y_t):
        y_lo, y_hi = morton.tile_aabbs(y_t.xyz, y_t.mask, tj)
        d2max = morton.tile_d2max(params, ell, src.xyz, src.mask, ti)
        mask = morton.tile_cull_mask(x_lo, x_hi, d2max, y_lo, y_hi)
        return pk.compact_tile_mask(mask)

    t_prep, comp = timeit(prep, ell, y_t)
    dens = float(comp.n) / comp.pair_i.shape[0]
    print(f"prep (aabb+cull+compact): {t_prep:.3f} ms  active={int(comp.n)}"
          f"/{comp.pair_i.shape[0]} ({dens:.1%})")

    @jax.jit
    def flow(ell, y_t, comp):
        return pk.flow_stats_pallas(params, ell, src, y_t, compaction=comp)

    t_flow, stats = timeit(flow, ell, y_t, comp)
    print(f"flow pass: {t_flow:.3f} ms")

    twist, _ = kernels.flow_from_stats(params, src, stats)
    twist = jax.block_until_ready(twist)

    @jax.jit
    def step(ell, y_t, twist, comp):
        return pk.step_coeffs_pallas(params, ell, src, y_t, twist, compaction=comp)

    t_step, _ = timeit(step, ell, y_t, twist, comp)
    print(f"step pass: {t_step:.3f} ms")

    @jax.jit
    def transform(R, T):
        Ri, Ti = lie.invert_rt(R, T)
        return tgt.transformed(Ri, Ti)

    t_tr, _ = timeit(transform, jnp.asarray(R_m), jnp.asarray(t_m))
    print(f"transform: {t_tr:.3f} ms")

    @jax.jit
    def packs(ell, y_t):
        lo = pk.layout_for(params, src)
        center = pk.cloud_center(src)
        xp = pk.pack_x(params, lo, src, ell, center=center)
        yp = pk.pack_y(lo, y_t, twist=jnp.zeros(6, jnp.float32), center=center)
        return xp, yp

    t_pack, _ = timeit(packs, ell, y_t)
    print(f"pack x+y (both passes): {t_pack:.3f} ms")

    total = t_prep + t_flow + t_step + t_tr
    print(f"sum of phases: {total:.3f} ms/iter (bench measured ~2.7)")


if __name__ == "__main__":
    main()
