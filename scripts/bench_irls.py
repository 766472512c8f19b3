"""Multiframe IRLS BA benchmark: 5 frames / 7 edges / 8k points on the real TPU.

Synthetic KITTI-scale scene observed from a short trajectory with noisy
initial poses; reports warm solve time, outer iterations, and per-frame
pose error vs ground truth. See PERF.md for the measured history.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from bench import synthetic_kitti_scene
from unified_cvo_tpu.config import read_cvo_params_yaml
from unified_cvo_tpu.models import irls
from unified_cvo_tpu.ops import lie
from unified_cvo_tpu.utils.pointcloud import make_pointcloud

n = 8192
F = 5
params = read_cvo_params_yaml("/root/reference/cvo_params/cvo_intensity_params_irls_tum.yaml")
print("params ell_init", params.ell_init, "multiframe max iters", params.multiframe_max_iters)
rng = np.random.default_rng(0)
scene = synthetic_kitti_scene(n)
# frames along a short trajectory, each observed in its own frame
xi_base = np.array([0.0, 0.01, 0.0, 0.06, 0.0, 0.5], np.float32)
poses_true = [np.eye(4, dtype=np.float32)]
for k in range(F - 1):
    R, t = lie.se3_exp(jnp.asarray(xi_base), 1.0)
    Tk = np.eye(4, dtype=np.float32); Tk[:3,:3]=np.asarray(R); Tk[:3,3]=np.asarray(t)
    poses_true.append(poses_true[-1] @ Tk)
clouds = []
for k in range(F):
    Tw = poses_true[k]
    local = (scene - Tw[:3,3]) @ Tw[:3,:3]   # world->frame
    local += rng.normal(scale=0.01, size=local.shape).astype(np.float32)
    feats = np.abs(np.sin(scene * 1.3)).astype(np.float32)[:, :1]
    feats = np.concatenate([feats]*5, axis=1)
    clouds.append(make_pointcloud(local.astype(np.float32), features=feats, bucket=n))
stacked = irls.stack_clouds(clouds)
# noisy init poses
init = []
for k, Tw in enumerate(poses_true):
    pert = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(scale=0.01, size=6).astype(np.float32) * (0 if k==0 else 1)), 1.0)[0])
    Tn = Tw.copy()
    Tn[:3,:3] = Tn[:3,:3] @ pert
    Tn[:3,3] += rng.normal(scale=0.05, size=3).astype(np.float32) * (0 if k==0 else 1)
    init.append(Tn[:3].astype(np.float32))
init = np.stack(init)
edges = [(i, j) for i in range(F) for j in range(i+1, F) if j - i <= 2]
pivot = [True] + [False]*(F-1)

t0 = time.time()
poses, hist = irls.irls_solve(stacked, init, edges, pivot, params)
jax.block_until_ready(poses)
t_first = time.time() - t0
t0 = time.time()
poses, hist = irls.irls_solve(stacked, init, edges, pivot, params)
jax.block_until_ready(poses)
t_warm = time.time() - t0
# pose error vs truth
errs = []
for k in range(F):
    Tm = np.eye(4, dtype=np.float32); Tm[:3] = np.asarray(poses[k])
    E = np.linalg.inv(Tm) @ poses_true[k]
    errs.append(float(np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(E[:3,:3]), jnp.asarray(E[:3,3]))))))
it = (hist[0].get("iter", hist[0].get("it"))
      if hist and isinstance(hist[0], dict) and ("iter" in hist[0] or "it" in hist[0])
      else len(hist))
print(f"IRLS solve F={F} edges={len(edges)} n={n}: compile+run {t_first:.2f}s, warm {t_warm*1e3:.1f} ms, outer_iters={it}")
print("pose err per frame:", [round(e,4) for e in errs])
