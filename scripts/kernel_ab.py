"""A/B timing harness for the pairwise Pallas kernels (in-loop, amortized).

Patches pieces of pallas_kernels to measure what each op family costs in the
real flow/step passes at bench scale. Timing-only hacks — numerics of the
variants are NOT valid.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from bench import synthetic_kitti_pair  # noqa: E402

from unified_cvo_tpu.config import read_cvo_params_yaml  # noqa: E402
from unified_cvo_tpu.ops import kernels, lie, morton  # noqa: E402
from unified_cvo_tpu.ops import pallas_kernels as pk  # noqa: E402
from unified_cvo_tpu.utils.pointcloud import make_pointcloud  # noqa: E402

TI, TJ = 128, 512


def setup(n=16384):
    params = read_cvo_params_yaml(
        "/root/reference/cvo_params/cvo_geometric_params_img_gpu0.yaml"
    )
    xyz = synthetic_kitti_pair(n)
    xi = np.array([0.0, 0.006, 0.0, 0.04, 0.01, 1.0], np.float32)
    R_m, t_m = lie.se3_exp(jnp.asarray(xi), 1.0)
    xyz2 = np.asarray(xyz @ np.asarray(R_m).T + np.asarray(t_m))
    src = make_pointcloud(xyz, bucket=n)
    tgt = make_pointcloud(xyz2, bucket=n)
    src = kernels.pad_cloud_to_multiple(src, TI)
    tgt = kernels.pad_cloud_to_multiple(tgt, TJ)
    src, _ = jax.jit(morton.sort_cloud)(src)
    tgt, _ = jax.jit(morton.sort_cloud)(tgt)
    src = jax.device_put(jax.block_until_ready(src))
    tgt = jax.device_put(jax.block_until_ready(tgt))
    return params, src, tgt, jnp.asarray(R_m), jnp.asarray(t_m)


def loop_time(params, src, tgt, R, T, do_flow=True, do_step=True):
    x_lo, x_hi = morton.tile_aabbs(src.xyz, src.mask, TI)
    ell = jnp.float32(0.1)
    twist0 = jnp.asarray(np.r_[0.01, 0.02, 0.0, 0.3, 0.1, 0.9].astype(np.float32))
    twist0 = twist0 / jnp.linalg.norm(twist0)

    def body(k, carry):
        acc, R, T = carry
        Rinv, Tinv = lie.invert_rt(R, T)
        y_t = tgt.transformed(Rinv, Tinv)
        y_lo, y_hi = morton.tile_aabbs(y_t.xyz, y_t.mask, TJ)
        d2max = morton.tile_d2max(params, ell, src.xyz, src.mask, TI)
        mask = morton.tile_cull_mask(x_lo, x_hi, d2max, y_lo, y_hi)
        comp = pk.compact_tile_mask(mask)
        acc = acc + comp.n.astype(jnp.float32)
        twist = twist0
        if do_flow:
            stats = pk.flow_stats_pallas(params, ell, src, y_t, compaction=comp)
            twist, jn = kernels.flow_from_stats(params, src, stats)
            acc = acc + stats.a_sum
        if do_step:
            B, C, D, E = pk.step_coeffs_pallas(
                params, ell, src, y_t, twist, compaction=comp)
            acc = acc + B + C + D + E
        return (acc, R, T)

    @jax.jit
    def run(K):
        return lax.fori_loop(0, K, body, (jnp.float32(0), R, T))[0]

    def t(K, reps=5):
        jax.block_until_ready(run(K))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(run(K))
        return (time.perf_counter() - t0) / reps * 1e3

    return (t(45) - t(5)) / 40


def main():
    params, src, tgt, R, T = setup()
    orig_a = pk._a_block

    def report(name, **kw):
        dt = loop_time(params, src, tgt, R, T, **kw)
        print(f"{name}: {dt:.3f} ms/iter", flush=True)

    report("baseline flow+step")
    report("flow only", do_step=False)
    report("step only", do_flow=False)

    # variant: exp -> mul (timing-only)
    import unified_cvo_tpu.ops.pallas_kernels as pkm
    real_exp = jnp.exp
    try:
        def a_noexp(params, lo, x, yT):
            jnp_exp = jnp.exp
            import jax.numpy as _j
            _j.exp = lambda z: z * 0.5  # noqa
            try:
                return orig_a(params, lo, x, yT)
            finally:
                _j.exp = jnp_exp
        pkm._a_block = a_noexp
        report("no-exp (a=linear)")
    finally:
        pkm._a_block = orig_a

    # variant: skip gating (no ok mask, keep exp)
    def a_nogate(params, lo, x, yT):
        f32 = jnp.float32
        sigma2 = f32(params.sigma) ** 2
        d2 = None
        for c in range(3):
            diff = (x[:, lo.x_xyz + c : lo.x_xyz + c + 1]
                    - yT[lo.y_xyz + c : lo.y_xyz + c + 1, :])
            d2 = diff * diff if d2 is None else d2 + diff * diff
        return sigma2 * jnp.exp(d2 * x[:, lo.x_twol2 : lo.x_twol2 + 1])
    try:
        pkm._a_block = a_nogate
        report("no-gate (pure exp kernel)")
    finally:
        pkm._a_block = orig_a


if __name__ == "__main__":
    main()
