"""Golden tests for Lie-group math vs scipy / NumPy oracles.

Oracle formulas transcribed from the reference equations
(src/cvo/LieGroup.cpp:203-283): Exp_SEK3 with its dt-scaled left Jacobian.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from unified_cvo_tpu.ops import lie


def numpy_exp_sek3(xi, dt):
    """Direct transcription of reference Exp_SEK3 (LieGroup.cpp:245-275)."""
    w, v = xi[:3], xi[3:]
    theta = np.linalg.norm(w)
    I = np.eye(3)
    if theta < 1e-6:
        R, Jl = I, dt * I  # correct Taylor limit (see lie.py docstring)
    else:
        A = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        theta2 = theta * theta
        st, ct = np.sin(dt * theta), np.cos(dt * theta)
        one_m_cos = (1 - ct) / theta2
        A2 = A @ A
        R = I + (st / theta) * A + one_m_cos * A2
        Jl = dt * I + one_m_cos * A + ((dt * theta - st) / (theta2 * theta)) * A2
    return R, Jl @ v


@pytest.mark.parametrize("seed", range(5))
def test_so3_exp_matches_scipy(seed, rng):
    w = np.random.default_rng(seed).normal(size=3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.array(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle():
    w = np.array([1e-9, -1e-9, 1e-9], np.float32)
    R = np.asarray(lie.so3_exp(jnp.array(w)))
    np.testing.assert_allclose(R, np.eye(3) + lie.skew(w), atol=1e-7)


@pytest.mark.parametrize("dt", [1.0, 0.01, 0.73])
@pytest.mark.parametrize("seed", range(3))
def test_se3_exp_matches_reference_formula(dt, seed):
    xi = np.random.default_rng(seed).normal(size=6).astype(np.float32)
    xi /= np.linalg.norm(xi)  # the align loop always uses the normalized flow
    R, t = lie.se3_exp(jnp.array(xi), dt)
    R_ref, t_ref = numpy_exp_sek3(xi, dt)
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-5)


def test_se3_exp_pure_translation_scales_with_dt():
    xi = np.array([0, 0, 0, 1.0, 2.0, -1.0], np.float32)
    _, t = lie.se3_exp(jnp.array(xi), 0.25)
    np.testing.assert_allclose(np.asarray(t), 0.25 * xi[3:], atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_se3_log_roundtrip(seed):
    xi = 0.5 * np.random.default_rng(seed).normal(size=6).astype(np.float32)
    R, t = lie.se3_exp(jnp.array(xi), 1.0)
    xi_back = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi_back, xi, atol=2e-5)


def test_se3_distance_equals_dt_for_unit_twist():
    # In the align loop dist == step because the flow is unit-normalized
    # (reference CvoGPU.cu:1470-1484).
    xi = np.random.default_rng(1).normal(size=6).astype(np.float32)
    xi /= np.linalg.norm(xi)
    for dt in [1e-4, 0.01, 0.5]:
        R, t = lie.se3_exp(jnp.array(xi), dt)
        assert np.isclose(float(lie.se3_distance(R, t)), dt, rtol=1e-3)


def test_invert_rt():
    xi = np.random.default_rng(2).normal(size=6).astype(np.float32)
    R, t = lie.se3_exp(jnp.array(xi), 1.0)
    Ri, ti = lie.invert_rt(R, t)
    T = np.asarray(lie.rt_to_mat44(R, t))
    Ti = np.asarray(lie.rt_to_mat44(Ri, ti))
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-5)


def test_orthogonalize_recovers_rotation():
    R = Rotation.from_rotvec([0.3, -0.2, 0.9]).as_matrix().astype(np.float32)
    noisy = R + 1e-3 * np.random.default_rng(3).normal(size=(3, 3)).astype(np.float32)
    fixed = np.asarray(lie.orthogonalize(jnp.array(noisy)))
    np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-5)


def test_transform_points():
    pts = np.random.default_rng(4).normal(size=(10, 3)).astype(np.float32)
    xi = np.array([0.1, 0.2, -0.1, 1.0, 0.0, 2.0], np.float32)
    R, t = lie.se3_exp(jnp.array(xi), 1.0)
    out = np.asarray(lie.transform_points(R, t, jnp.array(pts)))
    ref = pts @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(out, ref, atol=1e-6)
