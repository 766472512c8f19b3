"""Cubic step-size solver vs the NumPy companion-matrix oracle.

Oracle = numpy.roots, the same companion-matrix eigenvalue method the
reference uses (src/cvo/LieGroup.cpp:290-340, poly_solver_order3), with the
reference's root selection + clamping (src/cvo/CvoGPU.cu:1128-1163).
"""

import numpy as np
import pytest

from unified_cvo_tpu.ops.poly import cubic_real_roots, step_from_poly


def oracle_step(B, C, D, E, min_step=2e-5, max_step=0.8):
    coef = [4.0 * E, 3.0 * D, 2.0 * C, B]
    temp = np.inf
    if abs(coef[0]) > 0 or abs(coef[1]) > 0 or abs(coef[2]) > 0:
        roots = np.roots(coef)
        for r in roots:
            if r.real > 0 and r.real < temp and abs(r.imag) < 1e-5:
                temp = r.real
    return float(np.clip(temp, min_step, max_step))


@pytest.mark.parametrize("seed", range(20))
def test_step_matches_numpy_roots(seed):
    rng = np.random.default_rng(seed)
    B, C, D, E = rng.normal(scale=10.0, size=4)
    got = float(step_from_poly(B, C, D, E, 2e-5, 0.8))
    want = oracle_step(B, C, D, E)
    assert np.isclose(got, want, rtol=1e-3, atol=1e-6), (got, want, (B, C, D, E))


def test_three_real_roots():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    roots, valid = cubic_real_roots(1.0, -6.0, 11.0, -6.0)
    got = sorted(float(r) for r, v in zip(roots, valid) if v)
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-4)


def test_single_real_root():
    # x^3 + x + 1 has one real root ~ -0.6823
    roots, valid = cubic_real_roots(1.0, 0.0, 1.0, 1.0)
    reals = [float(r) for r, v in zip(roots, valid) if v and np.isfinite(float(r))]
    assert len(reals) == 1
    np.testing.assert_allclose(reals[0], -0.6823278, atol=1e-4)


def test_quadratic_fallback():
    roots, valid = cubic_real_roots(0.0, 1.0, -3.0, 2.0)  # x^2-3x+2
    got = sorted(float(r) for r, v in zip(roots, valid) if v)
    np.testing.assert_allclose(got, [1.0, 2.0], atol=1e-5)


def test_no_positive_root_clamps_to_max_step():
    # roots all negative -> temp_step = inf -> max_step (reference quirk,
    # CvoGPU.cu:1150-1160)
    got = float(step_from_poly(6.0, 11.0, 6.0, 1.0, 2e-5, 0.8))
    assert got == pytest.approx(0.8)


def test_tiny_root_clamps_to_min_step():
    # root at 1e-8 < min_step
    got = float(step_from_poly(-4e-8, 1.0, 0.0, 0.0, 2e-5, 0.8))
    assert got == pytest.approx(2e-5)
