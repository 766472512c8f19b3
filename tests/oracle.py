"""Plain-NumPy oracles transcribed from the reference CUDA kernels.

These loops follow fill_in_A_mat_gpu (CvoGPU.cu:477-593),
compute_flow_gpu_no_eigen (:729-790), compute_step_size_xi /
compute_step_size_poly_coeff (:953-1082) literally (minus the ELL
num_neighbors row cap, which the TPU build intentionally drops), so the
blocked jnp/Pallas implementations can be validated element-by-element.
"""

import numpy as np


def oracle_kernel_matrix(p, ell, x, y, xf=None, yf=None, xl=None, yl=None,
                         xg=None, yg=None):
    N, M = len(x), len(y)
    A = np.zeros((N, M))
    sigma2 = p.sigma**2
    c2 = p.c_ell**2
    c_sigma2 = p.c_sigma**2
    s_ell = p.s_ell
    s_sigma2 = p.s_sigma**2
    for i in range(N):
        l = (np.linalg.norm(x[i]) / 500.0 + 1.0) * ell
        d2_thres = -2.0 * l * l * np.log(p.sp_thres / sigma2)
        d2_c_thres = -2.0 * c2 * np.log(p.sp_thres / c_sigma2) if p.is_using_intensity else 1
        d2_s_thres = -2.0 * s_ell * s_ell * np.log(p.sp_thres / s_sigma2) if p.is_using_semantics else 1
        for j in range(M):
            a, k, ck, sk, geo = 1.0, 1.0, 1.0, 1.0, 1.0
            if p.is_using_geometric_type:
                dot = float(np.dot(xg[i], yg[j]))
                geo = dot * dot / (np.dot(xg[i], xg[i]) * np.dot(yg[j], yg[j]))
                if geo < 0.01:
                    continue
            if p.is_using_geometry:
                d2 = float(np.sum((x[i] - y[j]) ** 2))
                if d2 < d2_thres:
                    k = sigma2 * np.exp(-d2 / (2.0 * l * l))
                else:
                    continue
            if p.is_using_intensity:
                d2c = float(np.sum((xf[i] - yf[j]) ** 2))
                if d2c < d2_c_thres:
                    ck = c_sigma2 * np.exp(-d2c / (2.0 * c2))
                else:
                    continue
            if p.is_using_semantics:
                d2s = float(np.sum((xl[i] - yl[j]) ** 2))
                if d2s < d2_s_thres:
                    sk = s_sigma2 * np.exp(-d2s / (2.0 * s_ell * s_ell))
                else:
                    continue
            a = k * ck * sk * geo
            if a > p.sp_thres:
                A[i, j] = a
    return A


def oracle_flow(p, A, x, y):
    omega = np.zeros(3)
    v = np.zeros(3)
    for i in range(len(x)):
        for j in range(len(y)):
            if A[i, j] > 0:
                omega += A[i, j] * np.cross(x[i], y[j])
                v += A[i, j] * (y[j] - x[i])
    omega /= p.c
    v /= p.d
    joint = np.concatenate([omega, v])
    n = np.linalg.norm(joint)
    return joint / n if n > 0 else joint, n


def oracle_step_coeffs(p, A, ell, x, y, omega, v):
    def skew(w):
        return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])

    W = skew(omega)
    B = C = D = E = 0.0
    xiz = y @ W.T + v
    xi2z = y @ (W @ W).T + W @ v
    xi3z = y @ (W @ W @ W).T + W @ W @ v
    xi4z = y @ (W @ W @ W @ W).T + W @ W @ W @ v
    normxiz2 = np.sum(xiz**2, 1)
    xdx2 = -np.sum(xiz * xi2z, 1)
    epsc = np.sum(xi2z**2, 1) + 2 * np.sum(xiz * xi3z, 1)
    for i in range(len(x)):
        temp_ell = (np.linalg.norm(x[i]) / 500.0 + 1.0) * ell if p.is_using_range_ell else ell
        coef = 1.0 / (2.0 * temp_ell * temp_ell)
        for j in range(len(y)):
            if A[i, j] <= 0:
                continue
            d = x[i] - y[j]
            beta = -2.0 * coef * float(np.dot(xiz[j], d))
            gamma = -coef * (normxiz2[j] + 2.0 * float(np.dot(xi2z[j], d)))
            delta = 2.0 * coef * (xdx2[j] - float(np.dot(xi3z[j], d)))
            epsil = -coef * (epsc[j] + 2.0 * float(np.dot(xi4z[j], d)))
            B += A[i, j] * beta
            C += A[i, j] * (gamma + beta**2 / 2.0)
            D += A[i, j] * (delta + beta * gamma + beta**3 / 6.0)
            E += A[i, j] * (
                epsil + beta * delta + beta**2 * gamma / 2.0 + gamma**2 / 2.0 + beta**4 / 24.0
            )
    return B, C, D, E


class OracleIndicator:
    """Literal std::queue transcription of A_sparsity_indicator_ell_update
    (CvoGPU.cu:1167-1285), including the double-push boundary quirks."""

    def __init__(self, window):
        self.W = window
        self.start = []
        self.end = []
        self.ssum = 0.0
        self.esum = 0.0

    def update(self, ind):
        decrease = False
        if len(self.start) < self.W:
            self.start.append(ind)
            self.ssum += ind
        if len(self.start) >= self.W and len(self.end) < self.W:
            self.end.append(ind)
            self.esum += ind
        if len(self.start) >= self.W and len(self.end) >= self.W:
            ratio = self.esum / self.ssum
            thr = self.thr
            if 1 - thr < ratio < 1 + thr:
                decrease = True
                self.start, self.end = [], []
                self.ssum = self.esum = 0.0
            else:
                f = self.end.pop(0)
                self.esum -= f
                self.ssum += f
                self.start.append(f)
                self.ssum -= self.start.pop(0)
                self.end.append(ind)
                self.esum += ind
        return decrease
