"""Fused Pallas consume kernels for the ELL neighbor-list hot loop.

The jnp ELL passes (ops/neighbors.py flow_stats_ell/step_coeffs_ell) are
HBM-bound at 97% of the measured stream roof (scripts/roofline.py) — but
they stream ~16 [K, N] arrays per iteration because the kernel matrix A and
the transformed slots are materialized between the kernel evaluation and
its ~10 consuming reductions (the optimization_barrier that stops XLA from
re-fusing the exp chain into every reduction). These kernels remove that
traffic instead: each pass reads the raw candidate coordinates ONCE
(y_xyz [3, K, N] + a handful of [*, N] per-point rows), computes the
transform, the kernel, and every reduction in VMEM, and writes only [*, N]
row outputs — ~4 streams per pass instead of ~16, with the exp recomputed
in the step pass (compute sits at ~1% of the exp roof; bytes are the
scarce resource).

Validity is folded into the data at build time (neighbors.py): dead slots
carry +BIG coordinates, so the geometric distance gate kills them with no
valid-mask stream. Masked source points carry a -1 distance threshold.
The per-point scalars that depend on ell (range-scaled lengthscale,
threshold, step coefficient) are packed into a small [6, N] matrix per
iteration outside the kernel; pose/twist scalars ride in SMEM via scalar
prefetch.

Semantics: bitwise-equivalent gates to neighbors.kernel_slots /
step_coeffs_ell (reference fill_in_A_mat_gpu CvoGPU.cu:477-593 +
compute_step_size_* CvoGPU.cu:953-1082); only f32 reduction order
differs. Quantified (PERF.md "Fused-vs-jnp consume drift"): per-step
twists differ ~1e-4 relative, which the threshold-driven schedule can
amplify into visibly different iteration counts, but converged poses
agree to |log-delta| ~ 5e-4 on the bench workload — pinned by
tests/test_neighbors.py::test_fused_vs_jnp_convergence_agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unified_cvo_tpu.ops import kernels as jnp_kernels
from unified_cvo_tpu.ops import lie
from unified_cvo_tpu.utils.pointcloud import PointCloud

# Per-kernel tile sizes, swept on the v5e (K=96, N=16384): the flow kernel
# holds few live [K, TILE] arrays and runs fastest with big tiles
# (0.036 ms/iter at 1024 vs 0.045 at 256); the step kernel's ~12 live
# arrays exhaust VMEM double-buffering headroom at large tiles and it runs
# fastest SMALL (0.074 ms at 256 vs 0.119 at 1024, OOM at 2048 pre-
# restructure). Both remain parameters; align picks the largest divisor
# of the capacity under these caps.
DEFAULT_FLOW_TILE_N = 1024
DEFAULT_STEP_TILE_N = 256


def step_tile_for(k: int) -> int:
    """K-aware step-kernel tile: the step pass holds ~12 live [K, TILE]
    arrays, so its VMEM-limited optimum moves with K (v5e sweeps:
    K=96 -> 256 beats 512 by 1.27x; K=32 -> 512 beats 256 by 1.25x)."""
    return 512 if k <= 48 else DEFAULT_STEP_TILE_N

# x-pack rows
_X0, _X1, _X2, _THRES, _NEGI2L2, _COEF = range(6)
_XROWS = 6

# scalar-prefetch layout (f32)
_S_RINV = 0          # 9: R_inv row-major
_S_TINV = 9          # 3
_S_SIGMA2 = 12
_S_SP = 13
_S_OM2 = 14          # |omega|^2
_S_VV = 15           # |v|^2
_S_OMEGA = 16        # 3
_S_V = 19            # 3: v
_S_WV = 22           # 3: W v
_S_C2 = 25           # 3: W^2 v
_S_VWV = 28          # v . Wv
_S_WV2 = 29          # |Wv|^2
_S_VC2 = 30          # v . W^2 v
_S_VOM = 31          # v . omega
_S_LEN = 32


def pack_x(params, ell, x: PointCloud):
    """[6, N] per-point rows for the current ell: coords, distance-gate
    threshold (-1 for masked points), -1/(2 l_i^2), step coef 1/(2 l^2)."""
    f32 = jnp.float32
    sigma2 = f32(params.sigma) ** 2
    l_i = jnp_kernels.range_ell(ell, jnp.linalg.norm(x.xyz, axis=-1))
    two_l2 = 2.0 * l_i * l_i
    thres = -two_l2 * jnp.log(f32(params.sp_thres) / sigma2)
    thres = jnp.where(x.mask > 0, thres, -1.0)
    if params.is_using_range_ell:
        step_l = l_i
    else:
        step_l = jnp.full((x.capacity,), ell, f32)
    coef = 1.0 / (2.0 * step_l * step_l)
    return jnp.stack(
        [x.xyz[:, 0], x.xyz[:, 1], x.xyz[:, 2], thres,
         -1.0 / two_l2, coef], axis=0)


def pack_scalars(params, R_inv, T_inv, twist=None):
    """[_S_LEN] f32 scalar-prefetch vector (pose + twist Taylor matrices).

    Built with ONE concatenate in _S_* index order — the former ~15
    dynamic_update_slices were a measurable slice of the per-iteration
    scalar-glue floor (VERDICT r3 task 2)."""
    f32 = jnp.float32
    parts = [
        jnp.ravel(R_inv.astype(f32)),                        # _S_RINV (9)
        T_inv.astype(f32),                                   # _S_TINV (3)
        jnp.asarray([float(params.sigma) ** 2,
                     float(params.sp_thres)], f32),          # _S_SIGMA2, _S_SP
    ]
    if twist is None:
        parts.append(jnp.zeros((_S_LEN - 14,), f32))
    else:
        omega, v = twist[:3].astype(f32), twist[3:].astype(f32)
        W = lie.skew(omega)
        Wv = W @ v
        c2 = W @ Wv
        parts += [
            jnp.stack([jnp.dot(omega, omega), jnp.dot(v, v)]),
            omega, v, Wv, c2,
            jnp.stack([jnp.dot(v, Wv), jnp.dot(Wv, Wv),
                       jnp.dot(v, c2), jnp.dot(v, omega)]),
        ]
    return jnp.concatenate(parts)


def _transform_and_a(s_ref, x, y, chan, use_geometry):
    """Shared front half: transformed slots + gated kernel values, all in
    VMEM registers. x [6, TN], y [3, K, TN], chan [K, TN] or None.

    Dead slots arrive with +DEAD_COORD coordinates (neighbors.py), so d2 is
    astronomically large: the distance gate is false and exp underflows to
    exactly 0 — no validity stream is read."""
    y_t = [
        y[0] * s_ref[_S_RINV + 3 * c] + y[1] * s_ref[_S_RINV + 3 * c + 1]
        + y[2] * s_ref[_S_RINV + 3 * c + 2] + s_ref[_S_TINV + c]
        for c in range(3)
    ]
    a = None
    ok = None
    if chan is not None:
        ok = chan > 0.0
        a = chan
    if use_geometry:
        d2 = ((x[_X0:_X0 + 1, :] - y_t[0]) ** 2
              + (x[_X1:_X1 + 1, :] - y_t[1]) ** 2
              + (x[_X2:_X2 + 1, :] - y_t[2]) ** 2)
        g = d2 < x[_THRES:_THRES + 1, :]
        ok = g if ok is None else ok & g
        kgeo = s_ref[_S_SIGMA2] * jnp.exp(d2 * x[_NEGI2L2:_NEGI2L2 + 1, :])
        a = kgeo if a is None else a * kgeo
    # mirror neighbors.kernel_slots: without geometry the masked-source /
    # dead-slot gates arrive through chan (built with valid folded in) and
    # the x threshold row; with nothing at all a would be constant 1 — that
    # configuration never routes here (align requires a channel)
    a = jnp.where(ok & (a > s_ref[_S_SP]), a, 0.0)
    return y_t, a


def _flow_kernel(use_geometry, has_chan, *refs):
    if has_chan:
        s_ref, x_ref, y_ref, chan_ref, s_out, wy_out, cnt_out = refs
        chan = chan_ref[:]
    else:
        s_ref, x_ref, y_ref, s_out, wy_out, cnt_out = refs
        chan = None
    x = x_ref[:]
    y = y_ref[:]
    y_t, a = _transform_and_a(s_ref, x, y, chan, use_geometry)
    s_out[:] = jnp.sum(a, axis=0, keepdims=True)
    wy_out[:] = jnp.concatenate(
        [jnp.sum(a * y_t[c], axis=0, keepdims=True) for c in range(3)], axis=0)
    cnt_out[:] = jnp.sum((a > 0).astype(jnp.float32), axis=0, keepdims=True)


def _flow_reduce_kernel(use_geometry, has_chan, emit_a, *refs):
    """Fully-reduced flow pass: each grid step writes ONE [8, 1] column of
    tile partials (omega*c / v*d unscaled moments, a_sum, nonzeros) —
    no [*, N] row outputs leave the kernel, so the pass is read-only on
    HBM apart from 8 floats per tile. The cross product and the
    (wy - s x) moment use the same x rows already resident for the gate.

    emit_a additionally streams the kernel matrix A out as [K, N] blocks
    (one extra 4*K*N-byte write) so the step pass can skip recomputing
    the exp/gate chain — its VMEM-bound tile then carries ~4 fewer live
    arrays (see step_coeffs_ell_fused_cached)."""
    if emit_a:
        *refs, a_out = refs
    if has_chan:
        s_ref, x_ref, y_ref, chan_ref, acc_out = refs
        chan = chan_ref[:]
    else:
        s_ref, x_ref, y_ref, acc_out = refs
        chan = None
    x = x_ref[:]
    y = y_ref[:]
    y_t, a = _transform_and_a(s_ref, x, y, chan, use_geometry)
    s = jnp.sum(a, axis=0)                                    # [T]
    wy = [jnp.sum(a * y_t[c], axis=0) for c in range(3)]      # 3 x [T]
    xr = [x[_X0 + c, :] for c in range(3)]
    # masked/dead source rows have a == 0 for every slot, so s == wy == 0
    # and they contribute nothing to any moment
    om = [xr[(c + 1) % 3] * wy[(c + 2) % 3]
          - xr[(c + 2) % 3] * wy[(c + 1) % 3] for c in range(3)]
    v = [wy[c] - s * xr[c] for c in range(3)]
    cnt = jnp.sum((a > 0).astype(jnp.float32), axis=0)
    rows = jnp.stack(om + v + [s, cnt], axis=0)               # [8, T]
    # fold T lanes -> 128 lanes and accumulate into the resident [8, 128]
    # output block (constant index_map keeps it in VMEM across grid steps;
    # a dynamic per-step column store is not Mosaic-legal)
    folded = jnp.sum(rows.reshape(8, -1, 128), axis=1)        # [8, 128]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_out[:] = jnp.zeros_like(acc_out)

    acc_out[:] += folded
    if emit_a:
        a_out[:] = a


def _step_kernel_cached(use_geometry, has_chan, *refs):
    """Step pass consuming the flow pass's cached kernel matrix A instead
    of recomputing the exp/gate chain: identical outputs (same A values,
    same reduction order), ~4 fewer live [K, TILE] arrays in the
    VMEM-bound tile. y_t is still recomputed from the raw coords (9 fmas
    on streams already resident); use_geometry/has_chan only existed for
    the A computation and are ignored."""
    s_ref, x_ref, y_ref, a_ref, bcde_out = refs
    x = x_ref[:]
    y = y_ref[:]
    a = a_ref[:]
    y_t = [
        y[0] * s_ref[_S_RINV + 3 * c] + y[1] * s_ref[_S_RINV + 3 * c + 1]
        + y[2] * s_ref[_S_RINV + 3 * c + 2] + s_ref[_S_TINV + c]
        for c in range(3)
    ]
    _step_tail(s_ref, x, y_t, a, bcde_out)


def _step_kernel(use_geometry, has_chan, reduced, *refs):
    if has_chan:
        s_ref, x_ref, y_ref, chan_ref, bcde_out = refs
        chan = chan_ref[:]
    else:
        s_ref, x_ref, y_ref, bcde_out = refs
        chan = None
    x = x_ref[:]
    y = y_ref[:]
    y_t, a = _transform_and_a(s_ref, x, y, chan, use_geometry)
    _step_tail(s_ref, x, y_t, a, bcde_out, reduced)


def _step_tail(s_ref, x, y_t, a, bcde_out, reduced=True):
    # every Taylor term is multiplied by `a`, but dead slots carry
    # +DEAD_COORD coordinates and beta^4 of a 1e9-scale value overflows to
    # inf (0 * inf = NaN) — zeroing y_t where a == 0 keeps all powers
    # finite without changing any output
    y_t = [jnp.where(a > 0, y_t[c], 0.0) for c in range(3)]

    # Rodrigues collapse: for skew W, W^3 = -|w|^2 W and W^4 = -|w|^2 W^2,
    # and y^T W y = 0, u.w = 0, |Wy|^2 = |w|^2|y|^2 - (w.y)^2 — so every
    # xi{1..4}z dot reduces to contractions of t = w.y, yy = |y|^2, the
    # dots of y with the constant vectors v / Wv / W^2v, and one cross
    # product u = w x y for the x-side dot. ~2x fewer ops and live arrays
    # than materializing the four xi*z 3-vectors.
    om = [s_ref[_S_OMEGA + c] for c in range(3)]
    om2 = s_ref[_S_OM2]
    t = y_t[0] * om[0] + y_t[1] * om[1] + y_t[2] * om[2]
    yy = y_t[0] * y_t[0] + y_t[1] * y_t[1] + y_t[2] * y_t[2]
    uu = om2 * yy - t * t                                    # |W y|^2
    ydot = lambda base: (y_t[0] * s_ref[base] + y_t[1] * s_ref[base + 1]
                         + y_t[2] * s_ref[base + 2])
    yv = ydot(_S_V)
    yWv = ydot(_S_WV)
    yc2 = ydot(_S_C2)
    u = [y_t[(c + 2) % 3] * om[(c + 1) % 3]
         - y_t[(c + 1) % 3] * om[(c + 2) % 3] for c in range(3)]  # w x y... u = W y
    xu = (x[_X0:_X0 + 1, :] * u[0] + x[_X1:_X1 + 1, :] * u[1]
          + x[_X2:_X2 + 1, :] * u[2])
    xdot = lambda base: (x[_X0:_X0 + 1, :] * s_ref[base]
                         + x[_X1:_X1 + 1, :] * s_ref[base + 1]
                         + x[_X2:_X2 + 1, :] * s_ref[base + 2])
    xom = xdot(_S_OMEGA)
    xy = (x[_X0:_X0 + 1, :] * y_t[0] + x[_X1:_X1 + 1, :] * y_t[1]
          + x[_X2:_X2 + 1, :] * y_t[2])

    d1 = xu + (xdot(_S_V) - yv)                              # diff . xiz
    dw = xom * t - om2 * xy + uu                             # diff . W^2 y
    d2_ = dw + (xdot(_S_WV) - yWv)                           # diff . xi2z
    d3 = -om2 * xu + (xdot(_S_C2) - yc2)                     # diff . xi3z
    d4 = -om2 * d2_                                          # xi4z = -om2 xi2z
    normxiz2 = uu - 2.0 * yWv + s_ref[_S_VV]
    vw = s_ref[_S_VOM] * t - om2 * yv                        # v . W^2 y
    xdx2 = yc2 - vw - s_ref[_S_VWV]
    epsc = (-om2 * uu + 2.0 * om2 * yWv + s_ref[_S_WV2]
            + 2.0 * s_ref[_S_VC2])

    coef = x[_COEF:_COEF + 1, :]
    beta = -2.0 * coef * d1
    gamma = -coef * (normxiz2 + 2.0 * d2_)
    delta = 2.0 * coef * (xdx2 - d3)
    epsil = -coef * (epsc + 2.0 * d4)
    b2 = beta * beta
    rows = [
        jnp.sum(a * beta, axis=0, keepdims=True),
        jnp.sum(a * (gamma + 0.5 * b2), axis=0, keepdims=True),
        jnp.sum(a * (delta + beta * gamma + b2 * beta / 6.0), axis=0,
                keepdims=True),
        jnp.sum(a * (epsil + beta * delta + 0.5 * b2 * gamma
                     + 0.5 * gamma * gamma + b2 * b2 / 24.0), axis=0,
                keepdims=True),
    ]
    if reduced:
        # fold to [4, 128] lane partials and accumulate across grid steps;
        # nothing [*, N]-shaped leaves the kernel
        folded = jnp.sum(
            jnp.concatenate(rows, axis=0).reshape(4, -1, 128), axis=1)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            bcde_out[:] = jnp.zeros_like(bcde_out)

        bcde_out[:] += folded
    else:
        for r in range(4):
            bcde_out[r:r + 1, :] = rows[r]


def _call(kernel, n_out_rows, params, scal, xp, y_xyz, chan, tile_n,
          interpret, extra_static=(), reduced=False, a_in=None,
          emit_a=False):
    K, N = y_xyz.shape[1], y_xyz.shape[2]
    has_chan = chan is not None
    body = functools.partial(
        kernel, bool(params.is_using_geometry), has_chan, *extra_static)
    in_specs = [
        pl.BlockSpec((_XROWS, tile_n), lambda i, s: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, K, tile_n), lambda i, s: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xp, y_xyz]
    if has_chan:
        in_specs.append(pl.BlockSpec((K, tile_n), lambda i, s: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(chan)
    if a_in is not None:
        in_specs.append(pl.BlockSpec((K, tile_n), lambda i, s: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(a_in)
    if reduced:
        # [rows, 128] lane-partial accumulator, resident in VMEM across
        # all grid steps (constant index_map); kernels += their folded
        # tile partials into it
        out_specs = [
            pl.BlockSpec((r, 128), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM)
            for r in n_out_rows
        ]
        out_shape = [jax.ShapeDtypeStruct((r, 128), jnp.float32)
                     for r in n_out_rows]
    else:
        out_specs = [
            pl.BlockSpec((r, tile_n), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM)
            for r in n_out_rows
        ]
        out_shape = [jax.ShapeDtypeStruct((r, N), jnp.float32)
                     for r in n_out_rows]
    if emit_a:
        out_specs = list(out_specs) + [
            pl.BlockSpec((K, tile_n), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM)]
        out_shape = list(out_shape) + [
            jax.ShapeDtypeStruct((K, N), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // tile_n,), in_specs=in_specs,
        out_specs=out_specs)
    outs = pl.pallas_call(
        body, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(scal, *operands)
    return outs


def supported(params, nl, x: PointCloud,
              tile_n: int = DEFAULT_STEP_TILE_N) -> bool:
    """The fused path needs lane-aligned static shapes and a geometric or
    precomputed channel; anything else falls back to the jnp passes."""
    K, N = nl.valid.shape
    return (
        N % tile_n == 0
        and K % 8 == 0
        and (bool(params.is_using_geometry) or nl.chan is not None)
    )


def flow_stats_ell_fused(params, ell, x: PointCloud, nl, R_inv, T_inv,
                         tile_n: int = DEFAULT_FLOW_TILE_N,
                         interpret: bool = False) -> jnp_kernels.FlowStats:
    xp = pack_x(params, ell, x)
    scal = pack_scalars(params, R_inv, T_inv)
    s, wy, cnt = _call(_flow_kernel, (1, 3, 1), params, scal, xp,
                       nl.y_xyz, nl.chan, tile_n, interpret)
    return jnp_kernels.FlowStats(
        row_sum=s[0],
        row_wy=wy.T,
        nonzeros=jnp.sum(cnt).astype(jnp.int32),
        a_sum=jnp.sum(s),
    )


def flow_twist_ell_fused(params, ell, x: PointCloud, nl, R_inv, T_inv,
                         tile_n: int = DEFAULT_FLOW_TILE_N,
                         interpret: bool = False, emit_a: bool = False):
    """Fully-reduced flow pass: (unit twist [6], joint_norm, nonzeros,
    a_sum) with the omega/v moments accumulated IN the kernel — no [*, N]
    arrays leave HBM (the row-output variant + kernels.flow_from_stats
    costs an extra ~0.016 ms/iter at bench scale). Same math as
    flow_from_stats (reference compute_flow, CvoGPU.cu:729-848)."""
    xp = pack_x(params, ell, x)
    scal = pack_scalars(params, R_inv, T_inv)
    if emit_a:
        acc, a = _call(_flow_reduce_kernel, (8,), params, scal, xp,
                       nl.y_xyz, nl.chan, tile_n, interpret,
                       extra_static=(True,), reduced=True, emit_a=True)
    else:
        (acc,) = _call(_flow_reduce_kernel, (8,), params, scal, xp,
                       nl.y_xyz, nl.chan, tile_n, interpret,
                       extra_static=(False,), reduced=True)
        a = None
    t = jnp.sum(acc, axis=1)                                 # [8]
    joint = jnp.concatenate([t[:3] / params.c, t[3:6] / params.d])
    jn = jnp.linalg.norm(joint)
    unit = joint / jnp.where(jn < 1e-30, 1.0, jn)
    out = (unit, jn, t[7].astype(jnp.int32), t[6])
    return out + (a,) if emit_a else out


def step_coeffs_ell_fused_cached(params, ell, x: PointCloud, nl, R_inv,
                                 T_inv, twist, a,
                                 tile_n: int = DEFAULT_STEP_TILE_N,
                                 interpret: bool = False):
    """Step pass reusing the flow pass's cached kernel matrix `a` (the
    flow_twist_ell_fused(emit_a=True) output): identical B..E values
    (same A, same reduction order), ~4 fewer live arrays in the
    VMEM-bound tile."""
    xp = pack_x(params, ell, x)
    scal = pack_scalars(params, R_inv, T_inv, twist=twist)
    (bcde,) = _call(_step_kernel_cached, (4,), params, scal, xp,
                    nl.y_xyz, None, tile_n, interpret,
                    reduced=True, a_in=a)
    t = jnp.sum(bcde, axis=1)
    return t[0], t[1], t[2], t[3]


def step_coeffs_ell_fused(params, ell, x: PointCloud, nl, R_inv, T_inv,
                          twist, tile_n: int = DEFAULT_STEP_TILE_N,
                          interpret: bool = False):
    xp = pack_x(params, ell, x)
    scal = pack_scalars(params, R_inv, T_inv, twist=twist)
    (bcde,) = _call(_step_kernel, (4,), params, scal, xp,
                    nl.y_xyz, nl.chan, tile_n, interpret,
                    extra_static=(True,), reduced=True)
    t = jnp.sum(bcde, axis=1)
    return t[0], t[1], t[2], t[3]
