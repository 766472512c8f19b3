"""Fused Pallas TPU kernels for the pairwise RKHS registration hot path.

Replaces the blocked-jnp streaming passes in ops/kernels.py with two fused
Mosaic kernels over a (source-tile x target-tile) grid:

  pass 1 (flow):  A tile -> row sums s_i, row matmul w_i = sum_j A_ij y_j,
                  nonzero count, A sum  (reference fill_in_A_mat_gpu +
                  compute_flow_gpu_no_eigen, CvoGPU.cu:477-593, 729-848)
  pass 2 (step):  A tile recompute -> quartic Taylor coefficient partials
                  B,C,D,E (reference compute_step_size_*, CvoGPU.cu:953-1082)

Data layout is TPU-first: the source cloud is packed row-major [N, Dx]
(points on sublanes), the target cloud is packed *transposed* [Dy, M]
(points on lanes), so per-pair coordinate differences broadcast as
[TI,1] - [1,TJ] with no in-kernel transposes. Geometric distances, flow
accumulation and step dot products are exact-f32 VPU broadcasts — the
|x|^2+|y|^2-2x.y MXU expansion cancels catastrophically at scene
coordinate magnitudes, and low-K / low-N matmuls were MEASURED slower
than the VPU forms (K=3 wastes the systolic array; HIGHEST splits the
[TI,TJ] operand into bf16 triples on the VPU, costing more than the ops
it offloads). Only the wide feature/semantic cross-distances ride the
MXU at HIGHEST precision. Validity/padding gates are folded into the
packed operands (an additive +BIG pad row into d2 / the squared-norm
rows, a -1 sentinel in the per-i d2 threshold) so the kernels spend no
per-pair ops on masks. The kernel matrix A lives only in VMEM.

All tiles accumulate into per-source-row outputs across the j grid axis
(j innermost; Pallas keeps the output block resident between consecutive
steps with the same index), with (1,1) per-tile scalar outputs reduced by
the caller.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unified_cvo_tpu.ops import kernels as jnp_kernels
from unified_cvo_tpu.ops import lie
from unified_cvo_tpu.utils.pointcloud import PointCloud

DEFAULT_TILE_I = 128  # narrow source tiles cull tighter (smaller AABBs)
DEFAULT_TILE_J = 512  # wide target tiles amortize per-grid-step overhead



@dataclasses.dataclass(frozen=True)
class PackLayout:
    """Row/column offsets inside the packed x [N,Dx] / yT [Dy,M] matrices."""

    feature_dim: int
    num_classes: int
    use_geometry: bool
    use_intensity: bool
    use_semantics: bool
    use_geo_type: bool
    use_range_ell_step: bool

    # x columns
    @property
    def x_xyz(self):
        return 0

    @property
    def x_mask(self):
        return 3

    @property
    def x_twol2(self):  # -1/(2*l_i^2) (range-scaled geometric lengthscale)
        return 4

    @property
    def x_d2thres(self):
        return 5

    @property
    def x_coef(self):  # 1/(2*temp_ell^2) for the step pass
        return 6

    @property
    def x_feat(self):
        return 7

    @property
    def x_featsq(self):  # |f|^2
        return 7 + self.feature_dim

    @property
    def x_label(self):
        return 8 + self.feature_dim

    @property
    def x_labelsq(self):
        return 8 + self.feature_dim + self.num_classes

    @property
    def x_geo(self):
        return 9 + self.feature_dim + self.num_classes

    @property
    def x_geon2(self):  # |g|^2
        return 11 + self.feature_dim + self.num_classes

    @property
    def x_dim(self):
        return 12 + self.feature_dim + self.num_classes

    # yT rows (same ordering, minus the x-only scalar columns)
    @property
    def y_xyz(self):
        return 0

    @property
    def y_pad(self):  # 0 valid / +BIG invalid, folded additively into d2
        return 3

    @property
    def y_feat(self):
        return 4

    @property
    def y_featsq(self):  # |f|^2 (+pad)
        return 4 + self.feature_dim

    @property
    def y_label(self):
        return 5 + self.feature_dim

    @property
    def y_labelsq(self):  # |l|^2 (+pad)
        return 5 + self.feature_dim + self.num_classes

    @property
    def y_geo(self):
        return 6 + self.feature_dim + self.num_classes

    @property
    def y_geon2(self):
        return 8 + self.feature_dim + self.num_classes

    # flow-derivative rows (step pass only)
    @property
    def y_xiz(self):
        return 9 + self.feature_dim + self.num_classes

    @property
    def y_scalars(self):  # normxiz2, xdx2, epsil_const
        return 21 + self.feature_dim + self.num_classes

    @property
    def y_dim_flow(self):
        return 9 + self.feature_dim + self.num_classes

    @property
    def y_dim_step(self):
        return 24 + self.feature_dim + self.num_classes


def layout_for(params, x: PointCloud) -> PackLayout:
    return PackLayout(
        feature_dim=x.feature_dim if params.is_using_intensity else 0,
        num_classes=x.num_classes if params.is_using_semantics else 0,
        use_geometry=bool(params.is_using_geometry),
        use_intensity=bool(params.is_using_intensity),
        use_semantics=bool(params.is_using_semantics),
        use_geo_type=bool(params.is_using_geometric_type),
        use_range_ell_step=bool(params.is_using_range_ell),
    )


def cloud_center(x: PointCloud):
    """Masked centroid, used to center coordinates before packing: d2 and all
    (x - y) dot products are translation invariant, and centered coordinates
    keep |p|^2 + |q|^2 - 2 p.q well-conditioned in fp32 at KITTI ranges."""
    w = x.mask
    return jnp.sum(x.xyz * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)


PAD_BIG = jnp.float32(1e30)  # additive invalid-pair sentinel (f32-safe)


def pack_x(params, lo: PackLayout, x: PointCloud, ell, center=None):
    """[N, Dx] packed source matrix (per-i scalars precomputed).

    Source-point validity is folded into the packed scalars — invalid rows
    get d2_thres = -1 (the geometric gate can never pass) and +BIG squared
    feature/label norms (the channel distance gates can never pass) — so
    the kernels never touch the mask per pair."""
    N = x.capacity
    xyz = x.xyz if center is None else x.xyz - center
    cols = [xyz, x.mask[:, None]]
    pad = jnp.where(x.mask > 0, 0.0, PAD_BIG)[:, None]
    rng = jnp_kernels.range_ell(ell, jnp.linalg.norm(x.xyz, axis=-1))
    two_l2 = 2.0 * rng * rng
    neg_inv_two_l2 = -1.0 / two_l2
    sigma2 = jnp.float32(params.sigma) ** 2
    d2_thres = -two_l2 * jnp.log(jnp.float32(params.sp_thres) / sigma2)
    d2_thres = jnp.where(x.mask > 0, d2_thres, -1.0)
    step_l = rng if lo.use_range_ell_step else jnp.full((N,), ell, jnp.float32)
    coef = 1.0 / (2.0 * step_l * step_l)
    cols += [neg_inv_two_l2[:, None], d2_thres[:, None], coef[:, None]]
    if lo.use_intensity:
        cols += [x.features, jnp.sum(x.features**2, -1, keepdims=True) + pad]
    else:
        cols += [jnp.zeros((N, 0), jnp.float32), jnp.zeros((N, 1), jnp.float32)]
    if lo.use_semantics:
        cols += [x.labels, jnp.sum(x.labels**2, -1, keepdims=True) + pad]
    else:
        cols += [jnp.zeros((N, 0), jnp.float32), jnp.zeros((N, 1), jnp.float32)]
    g = x.geometric_types if x.geometric_types is not None else jnp.zeros((N, 2), jnp.float32)
    cols += [g, jnp.sum(g**2, -1, keepdims=True)]
    return jnp.concatenate(cols, axis=1)


def pack_y(lo: PackLayout, y: PointCloud, twist: Optional[jax.Array] = None,
           center=None):
    """[Dy, M] packed transposed target matrix; with `twist`, the flow
    derivative rows xiz..xi4z, the per-j dots y_c . xi{k}z, and per-j
    scalars are appended (step pass). The xi*z flow derivatives are always
    computed from UNcentered coordinates (xiz = W y + v is position
    dependent); only the xyz rows used for differences/dots are centered.

    Target validity is folded into a +BIG pad row (added to d2 in-kernel)
    and into the squared feature/label norm rows, so the kernels never
    touch the mask per pair."""
    M = y.capacity
    xyz_c = y.xyz if center is None else y.xyz - center
    pad = jnp.where(y.mask > 0, 0.0, PAD_BIG)[None, :]
    rows = [xyz_c.T, pad]
    if lo.use_intensity:
        rows += [y.features.T, jnp.sum(y.features**2, -1)[None, :] + pad]
    else:
        rows += [jnp.zeros((0, M), jnp.float32), jnp.zeros((1, M), jnp.float32)]
    if lo.use_semantics:
        rows += [y.labels.T, jnp.sum(y.labels**2, -1)[None, :] + pad]
    else:
        rows += [jnp.zeros((0, M), jnp.float32), jnp.zeros((1, M), jnp.float32)]
    g = y.geometric_types if y.geometric_types is not None else jnp.zeros((M, 2), jnp.float32)
    rows += [g.T, jnp.sum(g**2, -1)[None, :]]
    if twist is not None:
        omega, v = twist[:3], twist[3:]
        W = lie.skew(omega)
        W2, W3 = W @ W, W @ W @ W
        W4 = W2 @ W2
        yy = y.xyz
        xiz = yy @ W.T + v
        xi2z = yy @ W2.T + W @ v
        xi3z = yy @ W3.T + W2 @ v
        xi4z = yy @ W4.T + W3 @ v
        normxiz2 = jnp.sum(xiz * xiz, -1)
        xdx2 = -jnp.sum(xiz * xi2z, -1)
        epsc = jnp.sum(xi2z * xi2z, -1) + 2.0 * jnp.sum(xiz * xi3z, -1)
        rows += [xiz.T, xi2z.T, xi3z.T, xi4z.T,
                 normxiz2[None, :], xdx2[None, :], epsc[None, :]]
    return jnp.concatenate(rows, axis=0)


def _a_block(params, lo: PackLayout, x, yT):
    """Kernel-matrix tile from packed blocks (fill_in_A_mat_gpu semantics).

    Validity needs no per-pair mask ops: invalid pairs fail the geometric
    gate (pad row pushes d2 past the -1 source threshold sentinel) or the
    channel distance gates (pads in the squared-norm rows), or produce a
    zero geometric-type cosine (zero padded type vectors)."""
    f32 = jnp.float32
    TI = x.shape[0]
    TJ = yT.shape[1]
    sp = f32(params.sp_thres)
    a = None
    ok = None

    def gate(ok, g):
        return g if ok is None else ok & g

    if lo.use_geo_type:
        dot = (x[:, lo.x_geo : lo.x_geo + 1] * yT[lo.y_geo : lo.y_geo + 1, :]
               + x[:, lo.x_geo + 1 : lo.x_geo + 2]
               * yT[lo.y_geo + 1 : lo.y_geo + 2, :])
        n2 = (x[:, lo.x_geon2 : lo.x_geon2 + 1] *
              yT[lo.y_geon2 : lo.y_geon2 + 1, :])
        geo = dot * dot * (1.0 / jnp.maximum(n2, 1e-12))
        ok = gate(ok, geo >= 0.01)
        a = geo

    if lo.use_geometry:
        sigma2 = f32(params.sigma) ** 2
        # explicit per-axis differences on the VPU: exact in f32 (the
        # |x|^2+|y|^2-2x.y MXU expansion cancels catastrophically at KITTI
        # coordinate magnitudes — the tiny d2 is consumed directly)
        d2 = yT[lo.y_pad : lo.y_pad + 1, :]
        for c in range(3):
            diff = (x[:, lo.x_xyz + c : lo.x_xyz + c + 1]
                    - yT[lo.y_xyz + c : lo.y_xyz + c + 1, :])
            d2 = d2 + diff * diff
        ok = gate(ok, d2 < x[:, lo.x_d2thres : lo.x_d2thres + 1])
        k = sigma2 * jnp.exp(d2 * x[:, lo.x_twol2 : lo.x_twol2 + 1])
        a = k if a is None else a * k

    if lo.use_intensity:
        F = lo.feature_dim
        c_ell2 = f32(params.c_ell) ** 2
        c_sigma2 = f32(params.c_sigma) ** 2
        cross = jax.lax.dot_general(
            x[:, lo.x_feat : lo.x_feat + F], yT[lo.y_feat : lo.y_feat + F, :],
            (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )
        d2c = (x[:, lo.x_featsq : lo.x_featsq + 1]
               + yT[lo.y_featsq : lo.y_featsq + 1, :] - 2.0 * cross)
        d2c = jnp.maximum(d2c, 0.0)
        ok = gate(ok, d2c < -2.0 * c_ell2 * jnp.log(sp / c_sigma2))
        ck = c_sigma2 * jnp.exp(-d2c / (2.0 * c_ell2))
        a = ck if a is None else a * ck

    if lo.use_semantics:
        C = lo.num_classes
        s_ell2 = f32(params.s_ell) ** 2
        s_sigma2 = f32(params.s_sigma) ** 2
        cross = jax.lax.dot_general(
            x[:, lo.x_label : lo.x_label + C], yT[lo.y_label : lo.y_label + C, :],
            (((1,), (0,)), ((), ())), preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
        )
        d2s = (x[:, lo.x_labelsq : lo.x_labelsq + 1]
               + yT[lo.y_labelsq : lo.y_labelsq + 1, :] - 2.0 * cross)
        d2s = jnp.maximum(d2s, 0.0)
        ok = gate(ok, d2s < -2.0 * s_ell2 * jnp.log(sp / s_sigma2))
        sk = s_sigma2 * jnp.exp(-d2s / (2.0 * s_ell2))
        a = sk if a is None else a * sk

    if a is None:
        # no active channel: only the validity mask gates (a == 1 > sp)
        a = jnp.ones((TI, TJ), f32)
        ok = (x[:, lo.x_mask : lo.x_mask + 1] > 0) & (
            yT[lo.y_pad : lo.y_pad + 1, :] == 0.0)
        return jnp.where(ok, a, 0.0)
    return jnp.where(ok & (a > sp), a, 0.0)


class TileCompaction(NamedTuple):
    """Active (source-tile, target-tile) pairs packed front-first.

    The TPU twin of the reference's kd-tree pruning at the *schedule* level:
    instead of a dense (nI x nJ) grid where culled pairs still pay the
    per-grid-step dispatch/stream cost (measured ~53% of a pass at 25%
    density), the kernel runs a 1-D grid of exactly `n` active pairs with
    gather index maps read from SMEM scalar prefetch, and the grid bound
    itself is dynamic (Mosaic dynamic grid dimensions)."""

    pair_i: jax.Array  # [P] int32 source-tile index, actives first, i-major
    pair_j: jax.Array  # [P] int32 target-tile index
    first: jax.Array   # [P] int32, 1 = first active pair of this source tile
    row_has: jax.Array  # [nI] bool, source tile has >= 1 active pair
    n: jax.Array       # [] int32 active count (>= 1)


def compact_tile_mask(tile_mask) -> TileCompaction:
    """[nI, nJ] 0/1 mask -> TileCompaction. Stable argsort keeps actives in
    row-major order, so each source tile's pairs stay consecutive and its
    output block stays VMEM-resident across them."""
    nI, nJ = tile_mask.shape
    flat = tile_mask.reshape(-1) > 0
    P = nI * nJ
    # stable partition (actives first, original order) via cumsum + scatter —
    # far cheaper than a sort on TPU
    act = flat.astype(jnp.int32)
    n_act = jnp.sum(act)
    pos = jnp.where(flat, jnp.cumsum(act) - 1,
                    n_act + jnp.cumsum(1 - act) - 1)
    order = (
        jnp.zeros((P,), jnp.int32)
        .at[pos]
        .set(jnp.arange(P, dtype=jnp.int32))
    )
    pi = order // nJ
    pj = order - pi * nJ
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (pi[1:] != pi[:-1]).astype(jnp.int32)]
    )
    n = jnp.maximum(jnp.sum(flat.astype(jnp.int32)), 1)
    # inactive tail steps (visited only under a static/interpret grid) must
    # neither zero-init nor touch rows that accumulated real pairs
    first = first * (jnp.arange(pi.shape[0], dtype=jnp.int32) < n)
    return TileCompaction(
        pair_i=pi,
        pair_j=pj,
        first=first,
        row_has=jnp.any(tile_mask > 0, axis=1),
        n=n,
    )


def _flow_kernel(params, lo: PackLayout, *refs):
    n_ref, pi_ref, pj_ref, first_ref, x_ref, y_ref, s_ref, wy_ref, cnt_ref = refs
    k = pl.program_id(0)

    @pl.when(first_ref[k] == 1)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        wy_ref[:] = jnp.zeros_like(wy_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    # under a static grid (interpret mode) the tail steps are inactive
    @pl.when(k < n_ref[0])
    def _():
        x = x_ref[:]
        yT = y_ref[:]
        a = _a_block(params, lo, x, yT)
        # all-VPU accumulation: an MXU formulation ([A | a>0] @ (y|1) with
        # K=TJ) was measured SLOWER — the HIGHEST operand split of the
        # [TI,TJ] A tile costs more VPU work than these reductions, and
        # low-K matmuls waste the systolic array
        s_ref[:] = s_ref[:] + jnp.sum(a, axis=1, keepdims=True)
        cnt_ref[:] = cnt_ref[:] + jnp.sum(
            (a > 0).astype(jnp.float32), axis=1, keepdims=True
        )
        wy_ref[:] = wy_ref[:] + jnp.concatenate(
            [jnp.sum(a * yT[lo.y_xyz + c : lo.y_xyz + c + 1, :],
                     axis=1, keepdims=True) for c in range(3)],
            axis=1,
        )


def _step_kernel(params, lo: PackLayout, *refs):
    n_ref, pi_ref, pj_ref, first_ref, x_ref, y_ref, b_ref, c_ref, d_ref, e_ref = refs
    k = pl.program_id(0)

    @pl.when(first_ref[k] == 1)
    def _():
        b_ref[:] = jnp.zeros_like(b_ref)
        c_ref[:] = jnp.zeros_like(c_ref)
        d_ref[:] = jnp.zeros_like(d_ref)
        e_ref[:] = jnp.zeros_like(e_ref)

    @pl.when(k < n_ref[0])
    def _():
        _step_tile(params, lo, x_ref, y_ref, b_ref, c_ref, d_ref, e_ref)


def _step_tile(params, lo: PackLayout, x_ref, y_ref, b_ref, c_ref, d_ref, e_ref):
    x = x_ref[:]
    yT = y_ref[:]
    a = _a_block(params, lo, x, yT)
    f32 = jnp.float32

    diffs = [
        x[:, lo.x_xyz + c : lo.x_xyz + c + 1]
        - yT[lo.y_xyz + c : lo.y_xyz + c + 1, :]
        for c in range(3)
    ]

    def dots(k):
        """(x_i - y_j) . xi{k}z_j via shared per-axis difference tiles.
        (A K=3 MXU matmul x_c.xi{k}z minus a per-j precomputed half was
        measured ~2x slower: K=3 wastes the systolic array and HIGHEST
        multiplies the [TI,TJ]-output passes by 6.)"""
        acc = None
        for c in range(3):
            t = diffs[c] * yT[lo.y_xiz + 3 * k + c : lo.y_xiz + 3 * k + c + 1, :]
            acc = t if acc is None else acc + t
        return acc

    coef = x[:, lo.x_coef : lo.x_coef + 1]
    d1, d2_, d3, d4 = dots(0), dots(1), dots(2), dots(3)
    normxiz2 = yT[lo.y_scalars : lo.y_scalars + 1, :]
    xdx2 = yT[lo.y_scalars + 1 : lo.y_scalars + 2, :]
    epsc = yT[lo.y_scalars + 2 : lo.y_scalars + 3, :]
    beta = -2.0 * coef * d1
    gamma = -coef * (normxiz2 + 2.0 * d2_)
    delta = 2.0 * coef * (xdx2 - d3)
    epsil = -coef * (epsc + 2.0 * d4)
    b2 = beta * beta
    b_ref[:] = b_ref[:] + jnp.sum(a * beta, axis=1, keepdims=True)
    c_ref[:] = c_ref[:] + jnp.sum(a * (gamma + 0.5 * b2), axis=1, keepdims=True)
    d_ref[:] = d_ref[:] + jnp.sum(
        a * (delta + beta * gamma + b2 * beta / 6.0), axis=1, keepdims=True
    )
    e_ref[:] = e_ref[:] + jnp.sum(
        a * (epsil + beta * delta + 0.5 * b2 * gamma + 0.5 * gamma * gamma
             + b2 * b2 / 24.0),
        axis=1, keepdims=True,
    )


def _compacted_call(kernel, lo, xp, yp, comp: TileCompaction, tile_i, tile_j,
                    y_dim, out_widths, interpret):
    """Run a tile kernel over the compacted active-pair list.

    Compiled mode uses a DYNAMIC 1-D grid of exactly comp.n steps; interpret
    mode (no dynamic-grid support in the interpreter under trace) runs the
    static full-capacity grid with the in-kernel k < n gate. Source tiles
    with no active pair are never visited — their (undefined) output rows
    are zeroed here via comp.row_has."""
    N = xp.shape[0]
    P = comp.pair_i.shape[0]
    in_specs = [
        pl.BlockSpec((tile_i, lo.x_dim),
                     lambda k, n_ref, pi_ref, pj_ref, f_ref: (pi_ref[k], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((y_dim, tile_j),
                     lambda k, n_ref, pi_ref, pj_ref, f_ref: (0, pj_ref[k]),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tile_i, w),
                     lambda k, n_ref, pi_ref, pj_ref, f_ref: (pi_ref[k], 0),
                     memory_space=pltpu.VMEM)
        for w in out_widths
    ]
    out_shape = [jax.ShapeDtypeStruct((N, w), jnp.float32) for w in out_widths]
    grid = (P,) if interpret else (comp.n,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=grid, in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(comp.n.reshape(1), comp.pair_i, comp.pair_j, comp.first, xp, yp)
    keep = jnp.repeat(comp.row_has, tile_i)[:, None]
    return [jnp.where(keep, o, 0.0) for o in outs]


def flow_stats_pallas(params, ell, x: PointCloud, y_t: PointCloud,
                      tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
                      interpret: bool = False,
                      tile_mask=None,
                      compaction: Optional[TileCompaction] = None
                      ) -> jnp_kernels.FlowStats:
    lo = layout_for(params, x)
    n_orig = x.capacity
    x = jnp_kernels.pad_cloud_to_multiple(x, tile_i)
    y_t = jnp_kernels.pad_cloud_to_multiple(y_t, tile_j)
    N, M = x.capacity, y_t.capacity
    center = cloud_center(x)
    xp = pack_x(params, lo, x, jnp.asarray(ell, jnp.float32), center=center)
    yp = pack_y(lo, y_t, center=center)
    nI, nJ = N // tile_i, M // tile_j
    if compaction is None:
        if tile_mask is None:
            tile_mask = jnp.ones((nI, nJ), jnp.int32)
        assert tile_mask.shape == (nI, nJ), (tile_mask.shape, (nI, nJ))
        compaction = compact_tile_mask(tile_mask)
    s, wy, cnt = _compacted_call(
        functools.partial(_flow_kernel, params, lo), lo, xp, yp, compaction,
        tile_i, tile_j, lo.y_dim_flow, (1, 3, 1), interpret,
    )
    # kernel accumulated sum_j a_ij (y_j - c); restore raw-frame wy
    wy = wy + s * center[None, :]
    return jnp_kernels.FlowStats(
        row_sum=s[:n_orig, 0],
        row_wy=wy[:n_orig],
        nonzeros=jnp.sum(cnt).astype(jnp.int32),
        a_sum=jnp.sum(s),
    )


def step_coeffs_pallas(params, ell, x: PointCloud, y_t: PointCloud, twist,
                       tile_i: int = DEFAULT_TILE_I, tile_j: int = DEFAULT_TILE_J,
                       interpret: bool = False, tile_mask=None,
                       compaction: Optional[TileCompaction] = None):
    lo = layout_for(params, x)
    x = jnp_kernels.pad_cloud_to_multiple(x, tile_i)
    y_t = jnp_kernels.pad_cloud_to_multiple(y_t, tile_j)
    N, M = x.capacity, y_t.capacity
    center = cloud_center(x)
    xp = pack_x(params, lo, x, jnp.asarray(ell, jnp.float32), center=center)
    yp = pack_y(lo, y_t, twist=jnp.asarray(twist, jnp.float32), center=center)
    nI, nJ = N // tile_i, M // tile_j
    if compaction is None:
        if tile_mask is None:
            tile_mask = jnp.ones((nI, nJ), jnp.int32)
        assert tile_mask.shape == (nI, nJ), (tile_mask.shape, (nI, nJ))
        compaction = compact_tile_mask(tile_mask)
    outs = _compacted_call(
        functools.partial(_step_kernel, params, lo), lo, xp, yp, compaction,
        tile_i, tile_j, lo.y_dim_step, (1, 1, 1, 1), interpret,
    )
    B, C, D, E = (jnp.sum(o) for o in outs)
    return B, C, D, E
