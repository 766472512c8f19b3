"""Generalized-ICP baseline on two PCD files — the gicp_align_two twin.

The reference builds a PCL-GICP binary as an external cross-check on the same
two-cloud input as the CVO demo (src/experiments/main_gicp_align_two_pcd.cpp,
CMakeLists.txt:729-735). This is a from-scratch plane-to-plane GICP
(Segal et al., RSS'09): per-point covariances regularized to disk shape
(eigenvalues -> (1, 1, eps)), NN correspondences, and a Gauss-Newton step on
se(3) minimizing sum d^T (C_b + R C_a R^T)^{-1} d. Host-side NumPy/SciPy —
this is the baseline, not the product.

Usage:
    python -m unified_cvo_tpu.apps.gicp_align_two SOURCE.pcd TARGET.pcd \
        [--max-iter N] [--k K] [--max-corr DIST]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _covariances(xyz: np.ndarray, k: int = 20, eps: float = 1e-3) -> np.ndarray:
    """Disk-regularized neighborhood covariances (GICP sec. III-B)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    _, idx = tree.query(xyz, k=min(k, len(xyz)))
    nb = xyz[idx]                                   # [N,k,3]
    cen = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", cen, cen) / max(k - 1, 1)
    w, v = np.linalg.eigh(cov)                      # ascending
    w_reg = np.broadcast_to(np.array([eps, 1.0, 1.0]), w.shape)
    return np.einsum("nij,nj,nkj->nik", v, w_reg, v)


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def gicp_align(
    source: np.ndarray,
    target: np.ndarray,
    max_iter: int = 50,
    k: int = 20,
    max_corr: float = 2.0,
    tol: float = 1e-6,
):
    """Align target onto source; returns (T [4,4], n_iters, rmse).

    Convention matches CvoGPU::align's result: T maps target-frame points
    into the source frame.
    """
    from scipy.spatial import cKDTree

    cov_s = _covariances(source, k)
    cov_t = _covariances(target, k)
    tree = cKDTree(source)
    R = np.eye(3)
    t = np.zeros(3)
    rmse = np.inf
    for it in range(max_iter):
        ty = target @ R.T + t
        d, idx = tree.query(ty)
        keep = d < max_corr
        if keep.sum() < 6:
            break
        A = np.zeros((6, 6))
        b = np.zeros(6)
        err = 0.0
        Ca = R @ cov_t[keep] @ R.T
        Cb = cov_s[idx[keep]]
        Minv = np.linalg.inv(Ca + Cb)
        res = ty[keep] - source[idx[keep]]          # [M,3]
        pts = ty[keep]
        for i in range(len(res)):
            J = np.hstack([-_skew(pts[i]), np.eye(3)])   # d(res)/d[w,v]
            W = Minv[i]
            A += J.T @ W @ J
            b += J.T @ W @ res[i]
            err += res[i] @ W @ res[i]
        delta = np.linalg.solve(A + 1e-9 * np.eye(6), -b)
        w, v = delta[:3], delta[3:]
        th = np.linalg.norm(w)
        if th < 1e-12:
            dR = np.eye(3)
        else:
            K = _skew(w / th)
            dR = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        R = dR @ R
        t = dR @ t + v
        new_rmse = float(np.sqrt(np.mean(np.sum(res**2, axis=1))))
        if abs(rmse - new_rmse) < tol:
            rmse = new_rmse
            break
        rmse = new_rmse
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T, it + 1, rmse


def main(argv=None):
    from unified_cvo_tpu.datasets.pcd import read_pcd

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source")
    ap.add_argument("target")
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--max-corr", type=float, default=2.0)
    args = ap.parse_args(argv)

    sx, _ = read_pcd(args.source)
    tx, _ = read_pcd(args.target)
    print(f"GICP baseline: {len(sx)} fixed, {len(tx)} moving")
    t0 = time.time()
    T, iters, rmse = gicp_align(sx, tx, args.max_iter, args.k, args.max_corr)
    print(f"converged in {iters} iters, rmse {rmse:.4f}, {time.time()-t0:.2f} s")
    print("Transform is\n", T)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
