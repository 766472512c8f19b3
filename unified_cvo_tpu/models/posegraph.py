"""Keyframe pose-graph SLAM back-end — the PoseGraph/GTSAM layer, TPU-native.

Reference (src/graph_optimizer/PoseGraph.cpp, legacy L6): track each new
frame against the last frame with pairwise CVO, gauge tracking quality by
the RKHS inner product, promote to keyframe when the function-angle drops
below threshold (decide_new_keyframe, PoseGraph.cpp:90-104), add a relative
-pose factor, and optimize with GTSAM iSAM2 / fixed-lag smoothing.

TPU-native redesign: factors are SE(3) between-measurements; the graph is
optimized by Gauss-Newton in the tangent space with the residual
  r_e = log( Z_e^{-1} T_i^{-1} T_j )
linearized by forward-mode autodiff through the Lie exp/log (no GTSAM, no
hand-written jacobians), solved as a dense 6F x 6F system on device — pose
graphs here are tens of keyframes, far below MXU scale, so clarity wins.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unified_cvo_tpu.ops import lie


class RelativePose(NamedTuple):
    """(curr_id, ref_id, ref_T_curr, cvo inner product) — reference
    RelativePose.hpp:7-61."""

    curr_id: int
    ref_id: int
    transform: np.ndarray  # [4,4] ref_T_curr
    inner_product: float


def _factor_residuals(poses_rt, delta, fi, fj, Z_rt):
    """Stacked residuals [E,6] as a function of tangent updates delta [F,6]."""
    R0, t0 = poses_rt
    dR, dt = lie.se3_exp(delta, 1.0)
    R = dR @ R0
    t = jnp.einsum("fij,fj->fi", dR, t0) + dt

    Ri, ti = R[fi], t[fi]
    Rj, tj = R[fj], t[fj]
    # T_i^{-1} T_j
    Rij = jnp.einsum("eki,ekj->eij", Ri, Rj)
    tij = jnp.einsum("eki,ek->ei", Ri, tj - ti)
    # Z^{-1} (T_i^{-1} T_j) with Z = (Rz, tz) the raw measurement
    Rz, tz = Z_rt
    Re = jnp.einsum("eki,ekj->eij", Rz, Rij)
    te = jnp.einsum("eki,ek->ei", Rz, tij - tz)
    return lie.se3_log(Re, te)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    poses: jax.Array,          # [F,4,4]
    fi: jax.Array,             # [E] i32
    fj: jax.Array,             # [E]
    Z: jax.Array,              # [E,4,4] measured i_T_j
    weights: jax.Array,        # [E]
    fixed_mask: jax.Array,     # [F] 1.0 = held constant
    iters: int = 10,
    damping: float = 1e-6,
):
    """Weighted GN over the pose graph. Returns optimized poses [F,4,4]."""
    F = poses.shape[0]
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    Rz = Z[:, :3, :3]
    tz = Z[:, :3, 3]
    free = (1.0 - fixed_mask)[:, None]

    def body(carry, _):
        R, t = carry
        zero = jnp.zeros((F, 6), jnp.float32)
        res = _factor_residuals((R, t), zero, fi, fj, (Rz, tz))  # [E,6]
        J = jax.jacfwd(lambda d: _factor_residuals((R, t), d, fi, fj, (Rz, tz)))(
            zero
        )  # [E,6,F,6]
        w = weights[:, None, None, None]
        E = res.shape[0]
        Jf = (J * w).reshape(E * 6, F * 6)
        rf = (res * weights[:, None]).reshape(E * 6)
        H = Jf.T @ (J.reshape(E * 6, F * 6))
        b = Jf.T @ res.reshape(E * 6)
        free6 = jnp.repeat(free[:, 0], 6)
        H = H * free6[:, None] * free6[None, :]
        H = H + jnp.diag(jnp.where(free6 > 0, damping, 1.0))
        b = b * free6
        delta = jnp.linalg.solve(H, -b).reshape(F, 6) * free
        dR, dt = lie.se3_exp(delta, 1.0)
        t = jnp.einsum("fij,fj->fi", dR, t) + dt
        R = dR @ R
        return (R, t), jnp.linalg.norm(delta)

    (R, t), dn = jax.lax.scan(body, (R, t), None, length=iters)
    out = jnp.tile(jnp.eye(4, dtype=poses.dtype), (F, 1, 1))
    out = out.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return out, dn[-1]


@dataclasses.dataclass
class PoseGraphConfig:
    keyframe_function_angle_threshold: float = 0.6   # is_tracking_bad analogue
    odometry_weight: float = 1.0
    window_size: int = 0                             # 0 = full batch
    optimize_iters: int = 10


class PoseGraph:
    """Online keyframe SLAM driver (PoseGraph::add_new_frame semantics,
    PoseGraph.cpp:272-320): caller supplies each frame's tracking result
    (relative transform + function angle vs the last keyframe); this class
    maintains keyframes, factors, and runs GN after each new keyframe."""

    def __init__(self, config: PoseGraphConfig = PoseGraphConfig()):
        self.config = config
        self.keyframe_poses: List[np.ndarray] = []   # world_T_kf
        self.keyframe_ids: List[int] = []
        self.factors: List[RelativePose] = []
        self.trajectory: List[np.ndarray] = []       # every frame, world_T_f

    @property
    def num_keyframes(self):
        return len(self.keyframe_poses)

    def add_first_frame(self, frame_id: int):
        self.keyframe_poses.append(np.eye(4))
        self.keyframe_ids.append(frame_id)
        self.trajectory.append(np.eye(4))

    def add_frame(
        self,
        frame_id: int,
        kf_T_frame: np.ndarray,
        function_angle: float,
        extra_factors: Optional[List[RelativePose]] = None,
    ) -> bool:
        """Returns True if the frame became a keyframe. kf_T_frame maps
        frame points into the last keyframe's frame."""
        world_T_kf = self.keyframe_poses[-1]
        world_T_frame = world_T_kf @ kf_T_frame
        self.trajectory.append(world_T_frame)
        is_keyframe = function_angle < self.config.keyframe_function_angle_threshold
        if not is_keyframe:
            return False
        self.factors.append(
            RelativePose(
                curr_id=len(self.keyframe_poses),
                ref_id=len(self.keyframe_poses) - 1,
                transform=np.asarray(kf_T_frame, np.float64),
                inner_product=float(function_angle),
            )
        )
        self.keyframe_poses.append(world_T_frame)
        self.keyframe_ids.append(frame_id)
        if extra_factors:
            self.factors.extend(extra_factors)
        self.optimize()
        return True

    def optimize(self):
        F = len(self.keyframe_poses)
        if F < 2 or not self.factors:
            return
        lo = 0
        if self.config.window_size and F > self.config.window_size:
            lo = F - self.config.window_size  # sliding-window marginalization
        sub = [f for f in self.factors if f.ref_id >= lo and f.curr_id >= lo]
        if not sub:
            return
        poses = jnp.asarray(np.stack(self.keyframe_poses[lo:]), jnp.float32)
        fi = jnp.asarray([f.ref_id - lo for f in sub], jnp.int32)
        fj = jnp.asarray([f.curr_id - lo for f in sub], jnp.int32)
        Z = jnp.asarray(np.stack([f.transform for f in sub]), jnp.float32)
        w = jnp.asarray([self.config.odometry_weight] * len(sub), jnp.float32)
        fixed = np.zeros(poses.shape[0], np.float32)
        fixed[0] = 1.0
        out, _ = optimize_pose_graph(
            poses, fi, fj, Z, w, jnp.asarray(fixed),
            iters=self.config.optimize_iters,
        )
        out = np.asarray(out, np.float64)
        for k in range(poses.shape[0]):
            self.keyframe_poses[lo + k] = out[k]

    def write_trajectory(self, path: str):
        """KITTI-format rows of every frame pose (PoseGraph::write_trajectory)."""
        with open(path, "w") as f:
            for T in self.trajectory:
                f.write(" ".join(f"{v:.9g}" for v in T[:3, :4].reshape(-1)) + "\n")
