"""SO(3)/SE(3) Lie-group operations, branchless, jit- and autodiff-safe.

Re-derivation of the reference's Lie utilities
(reference: src/cvo/LieGroup.cpp:203-283, include/UnifiedCvo/cvo/LieGroup.h:14-70)
in functional JAX form. All small-angle branches use Taylor expansions
selected with `jnp.where` over *guarded* operands: the guarded value is
substituted BEFORE the singular op (sqrt at 0, arccos at 1) so that both the
primal and the forward/reverse derivative are finite — the pose-graph GN
differentiates through exp/log with jacfwd (models/posegraph.py).

Conventions match the reference:
  * se(3) tangent vectors are ordered [omega(3), v(3)].
  * `se3_exp(xi, dt)` integrates the flow for time `dt`:
    R = exp(dt*w^), t = Jl(dt, w) @ v with Jl = dt*I + ((1-cos(dt*th))/th^2) w^
    + ((dt*th - sin(dt*th))/th^3) w^2   (reference LieGroup.cpp:245-275,
    Exp_SEK3). Jl here is dt times the standard left Jacobian of dt*w.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6  # reference TOLERANCE (LieGroup.cpp:9)


def skew(w):
    """3-vector -> skew-symmetric matrix (reference LieGroup.h:14-23)."""
    w = jnp.asarray(w)
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(M):
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def _safe_theta(w):
    """(theta, small) with theta's sqrt guarded for zero-angle autodiff."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS * _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return jnp.where(small, 0.0, theta), theta2, small


def so3_exp(w):
    """Rodrigues formula (reference LieGroup.cpp:203-213, Exp_SO3)."""
    w = jnp.asarray(w)
    theta, theta2, small = _safe_theta(w)
    st = jnp.where(small, 1.0, theta)
    A = skew(w)
    A2 = A @ A
    k1 = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(st) / st)
    k2 = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(st)) / (st * st))
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + k1[..., None, None] * A + k2[..., None, None] * A2


def so3_log(R):
    """Inverse Rodrigues (reference LieGroup.cpp:121-127, Log_SO3)."""
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    small = cos_theta > 1.0 - _EPS
    # guard arccos input away from 1 where the small branch is taken, so the
    # derivative stays finite; the small branch is expressed in cos_theta
    # directly (theta^2 ~ 2(1-cos)) with no singular op.
    safe_cos = jnp.where(small, 0.0, cos_theta)
    theta = jnp.arccos(safe_cos)
    sin_theta = jnp.sin(theta)
    coef = jnp.where(
        small,
        0.5 + (1.0 - cos_theta) / 6.0,
        theta / jnp.where(small, 1.0, 2.0 * sin_theta),
    )
    W = coef[..., None, None] * (R - jnp.swapaxes(R, -1, -2))
    return unskew(W)


def se3_exp(xi, dt=1.0):
    """Integrate the twist xi=[w, v] for time dt -> (R[3,3], t[3]).

    Matches reference Exp_SEK3(v, dt) (LieGroup.cpp:245-275): the rotation is
    exp(dt*w^) and the translation is Jl(dt, w) @ v.
    """
    xi = jnp.asarray(xi)
    w, v = xi[..., :3], xi[..., 3:6]
    theta, theta2, small = _safe_theta(w)
    st = jnp.where(small, 1.0, theta)
    dtt = dt * st
    A = skew(w)
    A2 = A @ A
    k1 = jnp.where(small, dt * (1.0 - dt * dt * theta2 / 6.0), jnp.sin(dtt) / st)
    k2 = jnp.where(small, 0.5 * dt * dt, (1.0 - jnp.cos(dtt)) / (st * st))
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + k1[..., None, None] * A + k2[..., None, None] * A2
    a = jnp.where(small, 0.5 * dt * dt, (1.0 - jnp.cos(dtt)) / (st * st))
    b = jnp.where(small, dt**3 / 6.0, (dtt - jnp.sin(dtt)) / (st**3))
    Jl = dt * eye + a[..., None, None] * A + b[..., None, None] * A2
    t = jnp.einsum("...ij,...j->...i", Jl, v)
    return R, t


def left_jacobian_inv(w):
    """Inverse left Jacobian of SO(3), used by se3_log."""
    w = jnp.asarray(w)
    theta, theta2, small = _safe_theta(w)
    st = jnp.where(small, 1.0, theta)
    half = st / 2.0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half)))
        / (st * st),
    )
    A = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * A + cot_term[..., None, None] * (A @ A)


def se3_log(R, t):
    """(R, t) -> xi=[w, v] with exp([w,v]) == (R, t)."""
    w = so3_log(R)
    Vinv = left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, jnp.asarray(t))
    return jnp.concatenate([w, v], axis=-1)


def se3_distance(R, t):
    """||log(R, t)|| — the per-iteration step distance the align loop tests
    against eps_2 (reference CvoGPU.cu:1477-1484, via Sophus::SE3d::log)."""
    return jnp.linalg.norm(se3_log(R, t), axis=-1)


def transform_points(R, t, pts):
    """Apply x -> R x + t to an [N,3] array."""
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def invert_rt(R, t):
    """(R, t) -> (R^T, -R^T t) (reference update_tf, CvoGPU.cu:94-112)."""
    Rinv = jnp.swapaxes(R, -1, -2)
    return Rinv, -jnp.einsum("...ij,...j->...i", Rinv, t)


def rt_to_mat44(R, t):
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def mat44_to_rt(T):
    T = jnp.asarray(T)
    return T[..., :3, :3], T[..., :3, 3]


def orthogonalize(R):
    """Project a near-rotation onto SO(3) (two Newton sweeps of R(3I-R^T R)/2).

    Cheap drift control for long f32 pose-accumulation chains; the reference
    instead relied on double-precision accumulation (CvoGPU.cu:1460-1469).
    """
    for _ in range(2):
        R = 1.5 * R - 0.5 * R @ jnp.swapaxes(R, -1, -2) @ R
    return R
