"""App-level utilities: eval CLI, viewers, logging, IRLS checkpoint/resume."""

import json
import os

import numpy as np
import pytest

from unified_cvo_tpu.utils.logging import MetricsLogger, phase_timer


def test_evaluate_odometry_on_reference_artifacts(capsys):
    from unified_cvo_tpu.apps.evaluate_odometry import main

    rc = main(
        ["/root/reference/ground_truth",
         "/root/reference/results/cvo_geometric_img_gpu0_oct23", "00"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "00" in out and "avg" in out
    # seq 00 geometric error ~4.06 % per the stored artifact
    line = [l for l in out.splitlines() if l.strip().startswith("00")][0]
    t_err = float(line.split()[1])
    assert 3.5 < t_err < 4.5, line


def test_traj_viewer(tmp_path):
    from unified_cvo_tpu.apps.viewer import plot_trajectories

    out = plot_trajectories(
        str(tmp_path / "traj.png"),
        ["/root/reference/ground_truth/03/03.txt",
         "/root/reference/results/cvo_geometric_img_gpu0_oct23/03.txt"],
        labels=["gt", "cvo"],
    )
    assert os.path.getsize(out) > 10000


def test_pcd_viewer(tmp_path):
    from unified_cvo_tpu.apps.viewer import plot_pcds

    out = plot_pcds(
        str(tmp_path / "pcd.png"),
        ["/root/reference/demo_data/source.pcd",
         "/root/reference/demo_data/target.pcd"],
    )
    assert os.path.getsize(out) > 10000


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path)
    lg.log(frame=3, iters=17, ell=0.1)
    with phase_timer("align", lg):
        pass
    lg.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["frame"] == 3
    assert rows[1]["phase"] == "align" and rows[1]["seconds"] >= 0


def test_irls_checkpoint_resume(tmp_path, rng):
    import jax.numpy as jnp

    from unified_cvo_tpu.models import irls
    from unified_cvo_tpu.utils.pointcloud import make_pointcloud
    from test_irls import _params, _bunnyish

    p = _params().replace(multiframe_max_iters=6)
    base = _bunnyish(rng, 128)
    clouds = irls.stack_clouds(
        [make_pointcloud(base, bucket=128),
         make_pointcloud(base + 0.05, bucket=128)]
    )
    init = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    ckpt = str(tmp_path / "ba.npz")
    poses1, _ = irls.irls_solve(
        clouds, init, [(0, 1)], [True, False], p, chunk=128,
        checkpoint_path=ckpt,
    )
    assert os.path.exists(ckpt)
    # resume continues (max_iters reached, so poses should be stable)
    p2 = p.replace(multiframe_max_iters=8)
    poses2, _ = irls.irls_solve(
        clouds, init, [(0, 1)], [True, False], p2, chunk=128,
        checkpoint_path=ckpt, resume=True,
    )
    assert np.isfinite(poses2).all()
    np.testing.assert_array_equal(poses2[0], init[0])
