"""K x tile sweep of the fused ELL flow/step kernels (round-5 task 9).

The step kernel is VMEM-tight (12 live [K, TILE] arrays), so its optimal
tile moves with K; pallas_ell.step_tile_for encodes the sweep result.
Prints ms/iter per (K, tile) via the chained-fori_loop difference method.

Usage: timeout 1200 python scripts/sweep_ell_tiles.py
"""
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
from unified_cvo_tpu.ops import pallas_ell as pe  # noqa: E402
from unified_cvo_tpu.utils.pointcloud import make_pointcloud  # noqa: E402

N = 16384


def timed(body, init, n, fetch):
    @jax.jit
    def run(c):
        return lax.fori_loop(0, n, body, c)

    out = run(init)
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    out = run(init)
    np.asarray(fetch(out))
    return time.perf_counter() - t0


def per_iter_ms(body, init, fetch, nl=400, ns=40):
    return (timed(body, init, nl, fetch)
            - timed(body, init, ns, fetch)) / (nl - ns) * 1e3


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
    Rinv, Tinv = jnp.eye(3), jnp.zeros(3)
    twist0 = jnp.float32([0.01, 0.02, -0.01, 0.1, 0.05, 0.2])

    for K in (32, 64, 96, 128):
        nl = jax.jit(lambda: nbr.build_neighbor_list(
            params, ell, src, tgt, Rinv, Tinv, k=K))()
        nl = jax.block_until_ready(nl)
        for tile in (256, 512, 1024, 2048):
            if N % tile:
                continue
            # ---- step kernel
            def body_step(i, c):
                tw = c[0] * (1.0 + 1e-6 * i.astype(jnp.float32))
                try:
                    B, C, D, E = pe.step_coeffs_ell_fused(
                        params, ell, src, nl, Rinv, Tinv, tw, tile_n=tile)
                except Exception:
                    raise
                return (c[0], c[1] + B + C + D + E)

            try:
                ms_step = per_iter_ms(body_step, (twist0, jnp.float32(0)),
                                      lambda c: c[1])
            except Exception as e:
                ms_step = float("nan")

            # ---- flow kernel
            def body_flow(i, c):
                tw, acc = c
                twl, jn, nz, asum = pe.flow_twist_ell_fused(
                    params, ell + 1e-9 * acc, src, nl, Rinv, Tinv,
                    tile_n=tile)
                return (tw, acc + twl[0] + asum)

            try:
                ms_flow = per_iter_ms(body_flow, (twist0, jnp.float32(0)),
                                      lambda c: c[1])
            except Exception:
                ms_flow = float("nan")
            print(f"K={K:4d} tile={tile:5d}  step {ms_step:7.4f} ms/iter   "
                  f"flow {ms_flow:7.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
