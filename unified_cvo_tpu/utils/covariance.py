"""Per-point neighborhood covariance + eigenvalues.

Reference: src/utils/CvoPointCovariance.cu:122-233 — per-point 3x3
covariance over the K nearest neighbors (K = KDTREE_K_SIZE = 32) with
eigenvalues, feeding the dense/Mahalanobis kernel variant and ellipse
visualization. Host-side here (cKDTree KNN + batched eigh), since the
reference also computes it once at cloud construction.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def point_covariances(xyz: np.ndarray, k: int = 32):
    """Returns (cov [N,3,3], eigenvalues [N,3] ascending, degenerate [N]).

    Degenerate = fewer than 4 distinct neighbors or near-zero spread
    (the is_cov_degenerate flag in the reference)."""
    xyz = np.asarray(xyz, np.float64).reshape(-1, 3)
    n = len(xyz)
    if n == 0:
        return np.zeros((0, 3, 3)), np.zeros((0, 3)), np.zeros(0, bool)
    k = min(k, n)
    tree = cKDTree(xyz)
    _, idx = tree.query(xyz, k=k)
    idx = idx.reshape(n, k)
    nbrs = xyz[idx]                       # [N,k,3]
    mean = nbrs.mean(axis=1, keepdims=True)
    centered = nbrs - mean
    cov = np.einsum("nki,nkj->nij", centered, centered) / max(k - 1, 1)
    eigvals = np.linalg.eigvalsh(cov)     # ascending
    degenerate = (eigvals[:, 2] < 1e-10) | (k < 4)
    return cov.astype(np.float32), eigvals.astype(np.float32), degenerate
