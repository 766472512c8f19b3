"""Morton (Z-order) spatial sorting + tile AABB culling masks.

The TPU answer to the reference's kd-tree / early-exit pruning
(cuKdTree, thirdparty/cugicp; `num_inds == num_neighbors break`,
CvoGPU.cu:524): sort both clouds once by Morton code so Pallas tiles are
spatially compact, then cull (source-tile x target-tile) pairs whose
bounding boxes are farther apart than the tile's kernel support
d2_thres = -2 l^2 log(sp_thres / sigma^2). Rigid motion preserves
compactness, so the sort happens once per alignment while the mask is
recomputed per iteration from the transformed target's tile AABBs (a
trivial [M,3] segment min/max).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unified_cvo_tpu.utils.pointcloud import PointCloud

_FAR = 1.0e5  # sentinel position for padding rows: sorts last, culls cheaply


def _spread_bits10(v):
    """Spread 10 bits of v so there are two zero bits between each."""
    v = v.astype(jnp.uint32) & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(xyz, mask):
    """[N] uint32 Morton codes over the valid-point AABB; padding rows get
    the maximum code so they sort to the tail."""
    big = jnp.float32(3.0e38)
    valid = mask > 0
    lo = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], xyz, -big), axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((xyz - lo) / span * 1023.0), 0.0, 1023.0).astype(jnp.uint32)
    code = (
        _spread_bits10(q[:, 0])
        | (_spread_bits10(q[:, 1]) << 1)
        | (_spread_bits10(q[:, 2]) << 2)
    )
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


def sort_cloud(pc: PointCloud):
    """Morton-sort a cloud; returns (sorted cloud, permutation). Padding
    rows move to the tail and their xyz is pushed to a far sentinel so
    whole padding tiles cull against everything."""
    codes = morton_codes(pc.xyz, pc.mask)
    perm = jnp.argsort(codes)

    def take(a):
        return None if a is None else a[perm]

    sorted_pc = PointCloud(
        xyz=take(pc.xyz),
        mask=take(pc.mask),
        features=take(pc.features),
        labels=take(pc.labels),
        geometric_types=take(pc.geometric_types),
    )
    far_xyz = jnp.where(
        (sorted_pc.mask > 0)[:, None], sorted_pc.xyz, jnp.float32(_FAR)
    )
    return sorted_pc._replace(xyz=far_xyz), perm


def tile_aabbs(xyz, mask, tile: int):
    """Per-tile (lo [T,3], hi [T,3]) over valid rows; empty tiles get
    far-away boxes."""
    N = xyz.shape[0]
    T = N // tile
    x = xyz.reshape(T, tile, 3)
    m = (mask > 0).reshape(T, tile, 1)
    big = jnp.float32(_FAR)
    lo = jnp.min(jnp.where(m, x, big), axis=1)
    hi = jnp.max(jnp.where(m, x, -big), axis=1)
    return lo, hi


def tile_cull_mask(x_lo, x_hi, x_d2max, y_lo, y_hi):
    """[nI, nJ] float32 mask: 1.0 where the min box-box squared distance is
    within the source tile's kernel support x_d2max [nI]."""
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            x_lo[:, None, :] - y_hi[None, :, :], y_lo[None, :, :] - x_hi[:, None, :]
        ),
    )
    d2 = jnp.sum(gap * gap, axis=-1)
    return (d2 <= x_d2max[:, None]).astype(jnp.float32)


def tile_d2max(params, ell, xyz, mask, tile: int):
    """Per-source-tile max geometric gate threshold (range-scaled ell)."""
    from unified_cvo_tpu.ops.kernels import range_ell

    sigma2 = jnp.float32(params.sigma) ** 2
    l_i = range_ell(ell, jnp.linalg.norm(jnp.where((mask > 0)[:, None], xyz, 0.0), axis=-1))
    d2 = -2.0 * l_i * l_i * jnp.log(jnp.float32(params.sp_thres) / sigma2)
    d2 = jnp.where(mask > 0, d2, 0.0)
    T = xyz.shape[0] // tile
    return jnp.max(d2.reshape(T, tile), axis=1)
