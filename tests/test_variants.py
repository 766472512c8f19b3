"""Tests for the algorithm variants: dense/Mahalanobis kernel, least-squares
flow, adaptive-ell (ACVO), point covariance, Lyft handler."""

import numpy as np
import pytest

import jax.numpy as jnp

from unified_cvo_tpu.config import CvoParams
from unified_cvo_tpu.ops import kernels, lie
from unified_cvo_tpu.utils.covariance import point_covariances
from unified_cvo_tpu.utils.pointcloud import make_pointcloud

from test_kernels import _random_clouds


def test_dense_kernel_matches_oracle(rng):
    p = CvoParams(sp_thres=0.002)
    x, y, _, _ = _random_clouds(rng, n=30, m=40)
    K = np.diag([0.3, 0.3, 0.5]).astype(np.float32)
    Kinv = np.linalg.inv(K)
    pcx = make_pointcloud(x, bucket=8)
    pcy = make_pointcloud(y, bucket=8)
    A = np.asarray(kernels.kernel_block_dense(p, jnp.asarray(Kinv), pcx, pcy))
    sigma2 = p.sigma**2
    for i in range(len(x)):
        for j in range(len(y)):
            d = x[i] - y[j]
            want = sigma2 * np.exp(-float(d @ Kinv @ d) / 2.0)
            want = want if want > p.sp_thres else 0.0
            assert np.isclose(A[i, j], want, rtol=1e-4, atol=1e-7), (i, j)


def test_association_topk_dense(rng):
    p = CvoParams(sp_thres=0.0006)
    x, _, _, _ = _random_clouds(rng, n=30, m=30)
    pcx = make_pointcloud(x, bucket=8)
    K = np.eye(3, dtype=np.float32) * 0.25
    vals, idx = kernels.association_topk_dense(
        p, jnp.asarray(np.linalg.inv(K)), pcx, pcx, k=4, chunk=8
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    for i in range(len(x)):  # self-match strongest
        assert idx[i, 0] == i


def test_least_square_flow_matches_brute_force(rng):
    p = CvoParams(sp_thres=0.002)
    ell = 0.4
    x, y, _, _ = _random_clouds(rng, n=30, m=40)
    # shrink the clouds so pairs fall inside the 0.2 m gate
    x = (0.1 * x).astype(np.float32)
    y = x + rng.normal(scale=0.03, size=x.shape).astype(np.float32)
    pcx = make_pointcloud(x, bucket=8)
    pcy = make_pointcloud(y, bucket=8)
    omega, v = kernels.least_square_flow(p, jnp.float32(ell), pcx, pcy, chunk=8)

    from oracle import oracle_kernel_matrix

    A = oracle_kernel_matrix(p, ell, x, y)
    H = np.zeros((6, 6))
    b = np.zeros(6)

    def skew(q):
        return np.array([[0, -q[2], q[1]], [q[2], 0, -q[0]], [-q[1], q[0], 0]])

    for i in range(len(x)):
        for j in range(len(y)):
            w = A[i, j]
            if w <= 0 or np.linalg.norm(x[i] - y[j]) >= 0.2:
                continue
            J = np.hstack([-skew(y[j]), np.eye(3)]) / ell
            r = (x[i] - y[j]) / ell
            H += w * J.T @ J
            b += w * J.T @ r
    eps_ref = np.linalg.solve(H + 1e-8 * np.eye(6), -b)
    np.testing.assert_allclose(np.asarray(omega), eps_ref[:3], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), eps_ref[3:], rtol=1e-3, atol=1e-5)


def test_adaptive_ell_align_converges(rng):
    from unified_cvo_tpu.models.align import align
    from test_align import _bunnyish_cloud

    xyz, feats = _bunnyish_cloud(rng, n=256)
    xi = np.array([0.02, -0.03, 0.02, 0.05, -0.03, 0.04], np.float32)
    R, t = (np.asarray(v) for v in lie.se3_exp(jnp.asarray(xi), 1.0))
    y = (xyz @ R.T + t).astype(np.float32)
    p = CvoParams(
        ell_init=0.4, ell_min=0.05, ell_max=1.0, dl_step=0.3,
        is_ell_adaptive=1, is_using_intensity=1, max_step=0.05,
        min_step=1e-6, sp_thres=0.0006,
    )
    src = make_pointcloud(xyz, features=feats, bucket=64)
    tgt = make_pointcloud(y, features=feats, bucket=64)
    T, ret, info = align(src, tgt, jnp.eye(4), p, max_iter=800, chunk=256)
    T = np.asarray(T)
    err = T @ np.asarray(lie.rt_to_mat44(jnp.asarray(R), jnp.asarray(t)))
    e = np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(err[:3, :3]),
                                              jnp.asarray(err[:3, 3]))))
    assert e < 0.05, (e, int(info.iterations), float(info.final_ell))
    # the adaptive schedule actually moved ell
    assert abs(float(info.final_ell) - p.ell_init) > 1e-4


def test_adaptive_ell_on_ell_backend_matches_dense(rng):
    """VERDICT r3 task 5: ACVO no longer falls to the dense path — the ELL
    backend consumes three candidate lists (xy/xx/yy) with a growth-aware
    rebuild trigger, and must converge like the dense backend."""
    from unified_cvo_tpu.models.align import align
    from test_align import _bunnyish_cloud

    xyz, _ = _bunnyish_cloud(rng, n=4096)
    xyz = (xyz * 3.0).astype(np.float32)
    xi = np.array([0.01, -0.02, 0.01, 0.04, -0.02, 0.03], np.float32)
    R, t = (np.asarray(v) for v in lie.se3_exp(jnp.asarray(xi), 1.0))
    y = (xyz @ R.T + t).astype(np.float32)
    p = CvoParams(
        ell_init=0.4, ell_min=0.05, ell_max=1.0, dl_step=0.3,
        is_ell_adaptive=1, is_using_geometry=1, max_step=0.05,
        min_step=1e-6, sp_thres=0.0006,
    )
    src = make_pointcloud(xyz, bucket=4096)
    tgt = make_pointcloud(y, bucket=4096)
    outs = {}
    for backend in ("ell", "jnp"):
        T, ret, info = align(src, tgt, jnp.eye(4), p, max_iter=500,
                             chunk=1024, backend=backend)
        err = np.asarray(T) @ np.asarray(
            lie.rt_to_mat44(jnp.asarray(R), jnp.asarray(t)))
        e = np.linalg.norm(np.asarray(lie.se3_log(
            jnp.asarray(err[:3, :3]), jnp.asarray(err[:3, 3]))))
        outs[backend] = (e, info)
        assert e < 0.05, (backend, e, int(info.iterations))
        assert abs(float(info.final_ell) - p.ell_init) > 1e-4
    # the ELL path must actually have run the candidate-list machinery
    assert outs["ell"][1].nl_rebuilds is not None
    assert int(outs["ell"][1].nl_rebuilds) >= 1


def test_point_covariances_plane(rng):
    # points on a plane: smallest eigenvalue ~ 0, others > 0
    pts = np.concatenate(
        [rng.uniform(-1, 1, (200, 2)), np.zeros((200, 1))], axis=1
    )
    cov, ev, degen = point_covariances(pts, k=16)
    assert cov.shape == (200, 3, 3)
    assert np.all(ev[:, 0] < 1e-6)
    assert np.all(ev[:, 2] > 1e-4)
    assert not degen.all()


def test_lyft_handler_roundtrip(tmp_path):
    from unified_cvo_tpu.datasets.lyft import LyftHandler

    d = tmp_path / "lidar"
    d.mkdir()
    pts = np.random.default_rng(0).normal(size=(100, 5)).astype(np.float32)
    pts.tofile(d / "000001.bin")
    labels = np.arange(100, dtype=np.uint32)
    labels.tofile(d / "000001.label")
    h = LyftHandler(str(tmp_path))
    assert len(h) == 1
    out, lab = h.read_next_lidar_semantic()
    assert out.shape == (100, 4)
    # basis change: x <- -y, y <- -z, z <- x
    np.testing.assert_allclose(out[:, 0], -pts[:, 1], rtol=1e-6)
    np.testing.assert_allclose(out[:, 2], pts[:, 0], rtol=1e-6)
    np.testing.assert_array_equal(lab, np.arange(100))


def test_point_covariances_tpu_matches_host():
    """On-device blocked-KNN covariance (utils/covariance.py
    point_covariances_tpu, the cuKdTree CvoPointCovariance.cu twin) matches
    the host cKDTree implementation, with masked padding zeroed."""
    import numpy as np

    from unified_cvo_tpu.utils.covariance import (
        point_covariances, point_covariances_tpu)

    rng = np.random.default_rng(7)
    n, valid = 512, 450
    xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    mask = np.zeros(n, np.float32)
    mask[:valid] = 1.0
    cov_h, eig_h, deg_h = point_covariances(xyz[:valid], k=16)
    cov_d, eig_d, deg_d = point_covariances_tpu(xyz, mask, k=16, block=128)
    np.testing.assert_allclose(np.asarray(cov_d)[:valid], cov_h, atol=2e-5)
    np.testing.assert_allclose(np.asarray(eig_d)[:valid], eig_h, atol=2e-5)
    assert np.abs(np.asarray(cov_d)[valid:]).max() == 0.0
    assert np.asarray(deg_d)[valid:].all()
